"""Stage-level timing profiler (round 10): where do a query's seconds go?

Runs each named query hot (after warm-up) with the Spark event log on,
then parses the event log for per-stage wall / task counts / shuffle
bytes, attributing stages to the query via job groups. Output is the
empirical side of guide §1.1 without the (disabled) UI: for every stage,

    stage_id  wall_s  n_tasks  input_MB  shuffle_read_MB  shuffle_write_MB  name

Usage:
    python tools/stage_times.py dedup_minhash_lsh_pairs [name ...]
    python tools/stage_times.py --sf-dir /root/testdata/sf0.1 --runs 2 name
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from dataingestion_pt_ms_spark.queries import registry
from dataingestion_pt_ms_spark.session import get_spark


def parse_event_log(log_dir: Path) -> dict:
    """stage_id -> metrics dict, job_id -> (group, stage_ids)."""
    stages: dict[int, dict] = {}
    jobs: dict[int, dict] = {}
    files = [
        f
        for f in log_dir.rglob("events_*")
        if f.is_file() and not f.name.startswith(".")
    ]
    for f in files:
        for line in f.open(errors="replace"):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "group": (ev.get("Properties") or {}).get("spark.jobGroup.id"),
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                st = stages.setdefault(sid, {
                    "wall": 0.0, "n_tasks": 0, "name": "", "input": 0,
                    "sread": 0, "swrite": 0, "exec_cpu": 0.0, "exec_run": 0.0,
                })
                st["wall"] = (comp - sub) / 1e3 if sub and comp else 0.0
                st["n_tasks"] = si.get("Number of Tasks", 0)
                st["name"] = si.get("Stage Name", "")
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {
                    "wall": 0.0, "n_tasks": 0, "name": "", "input": 0,
                    "sread": 0, "swrite": 0, "exec_cpu": 0.0, "exec_run": 0.0,
                })
                # Spark 4 event logs carry task metrics as internal.metrics.*
                # accumulator updates on Task Info
                acc = {
                    a["Name"]: a.get("Update", 0)
                    for a in (ev.get("Task Info") or {}).get("Accumulables", [])
                    if str(a.get("Name", "")).startswith("internal.metrics.")
                }
                g = lambda n: acc.get(f"internal.metrics.{n}", 0)  # noqa: E731
                st["input"] += g("input.bytesRead")
                st["sread"] += g("shuffle.read.localBytesRead") + g(
                    "shuffle.read.remoteBytesRead"
                )
                st["swrite"] += g("shuffle.write.bytesWritten")
                st["exec_cpu"] += g("executorCpuTime") / 1e9
                st["exec_run"] += g("executorRunTime") / 1e3
    return {"stages": stages, "jobs": jobs}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1, help="hot runs per query (last is reported)")
    ap.add_argument("--min-wall", type=float, default=0.03)
    args = ap.parse_args()

    log_dir = Path(tempfile.mkdtemp(prefix="spark-events-"))
    spark = get_spark(
        "stage-times",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": str(log_dir),
        },
    )
    sc = spark.sparkContext
    specs = registry()

    specs["q1_pricing_summary"].fn(spark, args.sf_dir).count()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()
    for name in args.names:
        specs[name].fn(spark, "/root/testdata/sf0.001").count()

    groups: dict[str, str] = {}
    for name in args.names:
        for r in range(args.runs):
            gid = f"st-{name}-r{r}"
            sc.setJobGroup(gid, name)
            t0 = time.perf_counter()
            specs[name].fn(spark, args.sf_dir).count()
            wall = time.perf_counter() - t0
            groups[gid] = name
            print(f"# {name} run{r}: {wall:.3f}s", flush=True)
        sc.setJobGroup(None, None)

    spark.stop()
    time.sleep(1)
    parsed = parse_event_log(log_dir)
    stages, jobs = parsed["stages"], parsed["jobs"]

    per_group: dict[str, list[int]] = defaultdict(list)
    for jid, j in sorted(jobs.items()):
        if j["group"]:
            per_group[j["group"]].extend(j["stages"])

    for gid, name in groups.items():
        sids = [s for s in per_group.get(gid, []) if s in stages]
        tot = sum(stages[s]["wall"] for s in sids)
        print(f"\n== {gid} ({len(sids)} stages, sum-of-stage-walls {tot:.2f}s)")
        print(
            f"{'sid':>5} {'wall':>6} {'tasks':>5} {'cpu_s':>6} {'run_s':>6}"
            f" {'in_MB':>7} {'srd_MB':>7} {'swr_MB':>7}  name"
        )
        for s in sorted(sids, key=lambda x: -stages[x]["wall"]):
            st = stages[s]
            if st["wall"] < args.min_wall:
                continue
            print(
                f"{s:>5} {st['wall']:>6.2f} {st['n_tasks']:>5} {st['exec_cpu']:>6.1f}"
                f" {st['exec_run']:>6.1f} {st['input']/1e6:>7.1f}"
                f" {st['sread']/1e6:>7.1f} {st['swrite']/1e6:>7.1f}"
                f"  {st['name'][:70]}"
            )
    shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
