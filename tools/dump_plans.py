"""Dump .explain("formatted") for named queries to files (round-10 evidence).

Usage:
    python tools/dump_plans.py --out plans/r10 --suffix _after name [name ...]
    python tools/dump_plans.py --repo /tmp/r10base --out plans/r10 --suffix _before name ...

--repo lets the "before" plans come from a pristine worktree while writing
into this repo's plans dir.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repo", default=str(Path(__file__).resolve().parents[1]))
    ap.add_argument("--out", default="plans/r10")
    ap.add_argument("--suffix", default="_after")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from dataingestion_pt_ms_spark.queries import registry
    from dataingestion_pt_ms_spark.session import get_spark

    out_dir = Path(__file__).resolve().parents[1] / args.out
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-plans")
    specs = registry()
    for name in args.names:
        df = specs[name].fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}{args.suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
