"""Attribute a query's wall between Python DataFrame construction,
Catalyst analysis+optimization (driver-side), and execution (guide §7.3:
very large expression trees can spend seconds in planning — check before
blaming the stages).

For each named query, hot (after one warm run):

    build_s   = time to call registry fn (Python-side plan construction)
    plan_s    = time to force queryExecution().executedPlan() on a fresh df
    exec_s    = time for count() AFTER the plan is forced
    total_s   = build + plan + exec (should ~match bench.py's wall)

Usage:  python tools/plan_vs_exec.py name [name ...] [--repeats 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from dataingestion_pt_ms_spark.queries import registry
from dataingestion_pt_ms_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("plan_vs_exec")
    specs = registry()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    print(f"{'query':42s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'total':>7s}")
    for name in args.names:
        fn = specs[name].fn
        fn(spark, args.sf_dir).count()  # warm: codegen + JIT
        best = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()  # noqa: SLF001
            t2 = time.perf_counter()
            df.count()
            t3 = time.perf_counter()
            row = (t1 - t0, t2 - t1, t3 - t2, t3 - t0)
            if best is None or row[3] < best[3]:
                best = row
        print(
            f"{name:42s} {best[0]:7.3f} {best[1]:7.3f} {best[2]:7.3f}"
            f" {best[3]:7.3f}"
        )


if __name__ == "__main__":
    main()
