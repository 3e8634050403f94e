"""Stage-parallelism probe (round 10): run queries and report, per query,
the task-count distribution of its stages — flags Python-heavy stages that
AQE has coalesced to 1-2 tasks (serial execution on a 32-core host).

Not a timing tool: safe to run on a loaded host. Usage:

    python tools/task_probe.py --top 60
    python tools/task_probe.py name1 name2 ...
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from dataingestion_pt_ms_spark.queries import registry
from dataingestion_pt_ms_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/task_probe.json")
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        full = json.loads((REPO / "BENCH_full.json").read_text())
        ranked = sorted(full["queries"].items(), key=lambda kv: -kv[1])
        names += [n for n, _ in ranked[: args.top] if n not in names]

    spark = get_spark("task-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    specs = registry()
    report = {}
    for name in names:
        group = f"probe-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        try:
            specs[name].fn(spark, args.sf_dir).count()
        except Exception as exc:
            print(f"ERR {name}: {exc}", file=sys.stderr)
            continue
        wall = time.perf_counter() - t0
        tracker = sc.statusTracker()
        stage_tasks = []
        for jid in tracker.getJobIdsForGroup(group):
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numCompletedTasks > 0:
                    stage_tasks.append(si.numTasks)
        ones = sum(1 for t in stage_tasks if t <= 2)
        report[name] = {
            "wall": round(wall, 2),
            "n_stages": len(stage_tasks),
            "stages_le2": ones,
            "tasks": stage_tasks,
        }
        print(
            f"{wall:7.2f}s  {name}: {len(stage_tasks)} stages, "
            f"{ones} with <=2 tasks  {stage_tasks}",
            flush=True,
        )
        sc.setJobGroup(None, None)
    Path(args.out).write_text(json.dumps(report, indent=1) + "\n")


if __name__ == "__main__":
    main()
