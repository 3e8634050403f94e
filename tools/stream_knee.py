"""Streaming throughput-knee bench (round 8, VERDICT r7 #3) — BENCH.md
§17b.

§17 measured the four streaming jobs at fixed input volumes and found
wall ≈ per-trigger fixed cost — i.e. the bench never stressed the
engine. This tool finds the actual knee: drive the two stateful-operator
jobs from a RATE source (``format("rate")`` — rows generated
executor-side at a target rows/sec, no disk staging) under a
``processingTime`` trigger, ramping the rate up a ladder until the
engine can no longer finish a batch inside the trigger interval
(p50 triggerExecution > trigger period, or sustained processed-rate <
90% of input-rate). The first failing rung brackets the knee;
backpressure past it means unbounded batch growth on a real pipeline.

Second half: push the interval join's state PAST 1 GB (high rate ×
long run; the 15-minute watermark means nothing is evicted inside the
run, so state grows ≈ rate × seconds rows) and compare the heap
(HDFSBackedStateStoreProvider) and RocksDB stores where they actually
diverge — §17 measured them equal at 21 MB state, which its own text
called too small to mean anything.

Round 9 (VERDICT r8 #3): the knee ladder takes ``--provider rocksdb``
(the r8 table was heap-only — at 100 TB the RocksDB curve is the one
production runs on), and the ``floor`` subcommand measures the interval
join's per-batch commit FLOOR — the ~4 s fixed cost that made any
trigger < 5 s unmeetable in §17b — across the obvious levers: state
store provider, streaming shuffle-partition count (fixed at first run
by the checkpoint — fewer partitions = fewer state stores to commit
per batch), and RocksDB changelog checkpointing (commit ships the
changelog instead of re-uploading SST files).

Usage:
    python tools/stream_knee.py knee [--jobs windowed_histogram_stream interval_join_stream]
                                     [--rates 100000 250000 500000 1000000 2000000]
                                     [--secs 45] [--trigger-ms 2000]
                                     [--provider heap|rocksdb]
    python tools/stream_knee.py bigstate [--rate 150000] [--secs 150]
                                     [--providers heap rocksdb]
    python tools/stream_knee.py floor [--rate 100000] [--secs 60]
                                     [--parts 32 8] [--providers heap rocksdb]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestion_pt_ms_spark.session import get_spark
from dataingestion_pt_ms_spark.streaming import jobs as J

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _rate_events(spark: SparkSession, rows_per_sec: int) -> DataFrame:
    """Rate source shaped like the events table: ~10% errors / 90%
    clicks over a 10k-user key space — the same key geometry the batch
    twin (join_range_clicks_before_error) runs on."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .option("numPartitions", 8)
        .load()
        .select(
            F.col("value").alias("event_id"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 10_000).alias("user_id"),
            F.when(F.col("value") % 10 == 0, "error")
            .otherwise("click")
            .alias("event_type"),
            (F.col("value") % 1_000).cast("double").alias("value"),
        )
    )


def _job_stream(spark: SparkSession, name: str, rate: int) -> DataFrame:
    if name == "windowed_histogram_stream":
        return J.windowed_histogram_stream(
            _rate_events(spark, rate), window="1 minute", watermark="30 seconds"
        )
    if name == "interval_join_stream":
        # two independent rate sources, as two topics would be
        return J.interval_join_stream(
            _rate_events(spark, rate), _rate_events(spark, rate)
        )
    raise ValueError(name)


def _out_mode(name: str) -> str:
    return "update" if name == "windowed_histogram_stream" else "append"


def _run(
    spark: SparkSession,
    name: str,
    rate: int,
    secs: int,
    trigger_ms: int,
    tmp: str,
) -> dict:
    q = (
        _job_stream(spark, name, rate)
        .writeStream.format("noop")
        .outputMode(_out_mode(name))
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(processingTime=f"{trigger_ms} milliseconds")
        .start()
    )
    try:
        time.sleep(secs)
        progress = [
            json.loads(p) if isinstance(p, str) else p for p in q.recentProgress
        ]
    finally:
        q.stop()
    # steady state: drop the first 3 triggers (source ramp + codegen)
    execs, in_rate, out_rate, srows, sbytes = [], [], [], 0, 0
    for p in progress[3:]:
        if p.get("numInputRows", 0) <= 0:
            continue
        execs.append(p["durationMs"]["triggerExecution"])
        in_rate.append(p.get("inputRowsPerSecond", 0.0))
        out_rate.append(p.get("processedRowsPerSecond", 0.0))
    for p in progress:  # peak state over the whole run
        for o in p.get("stateOperators") or []:
            srows = max(srows, int(o.get("numRowsTotal", 0)))
            b = int(o.get("memoryUsedBytes", 0))
            cm = o.get("customMetrics") or {}
            b = max(b, int(cm.get("rocksdbTotalSSTFilesBytes", 0)))
            sbytes = max(sbytes, b)
    commits = []
    for p in progress[3:]:
        if p.get("numInputRows", 0) <= 0:
            continue
        for o in p.get("stateOperators") or []:
            commits.append(int(o.get("commitTimeMs", 0)))
    execs.sort()
    commits.sort()
    n = len(execs)
    return {
        "job": name,
        "rate": rate,
        "batches": n,
        "p50_ms": execs[n // 2] if n else None,
        "max_ms": execs[-1] if n else None,
        "p50_commit_ms": commits[len(commits) // 2] if commits else None,
        "input_rps": round(sum(in_rate) / len(in_rate)) if in_rate else 0,
        "processed_rps": round(sum(out_rate) / len(out_rate)) if out_rate else 0,
        "state_rows": srows,
        "state_mb": round(sbytes / 1e6, 1),
    }


def _set_provider(spark: SparkSession, provider: str) -> None:
    if provider == "rocksdb":
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def cmd_knee(spark: SparkSession, args) -> None:
    _set_provider(spark, args.provider)
    if args.parts:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.parts))
    print(
        f"### §17b/§17c throughput knee (rate source, trigger "
        f"{args.trigger_ms} ms, {args.secs} s/rung, {args.provider} store"
        f"{f', {args.parts} shuffle parts' if args.parts else ''})\n"
    )
    print("| job | rate rows/s | batches | p50/max ms | processed/input | state MB | verdict |")
    print("|---|---|---|---|---|---|---|")
    for name in args.jobs:
        knee = None
        for rate in args.rates:
            tmp = tempfile.mkdtemp(prefix=f"knee_{name}_{rate}_")
            try:
                m = _run(spark, name, rate, args.secs, args.trigger_ms, tmp)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
            lag = (
                m["processed_rps"] / m["input_rps"] if m["input_rps"] else 1.0
            )
            over = m["p50_ms"] is not None and m["p50_ms"] > args.trigger_ms
            starved = lag < 0.9
            if m["batches"] == 0:
                # < 4 triggers completed inside --secs: no steady state to
                # judge — lengthen the window instead of calling it ok
                verdict = "NO-DATA (raise --secs)"
            else:
                verdict = "KNEE" if (over or starved) else "ok"
            print(
                f"| {name} | {rate} | {m['batches']} "
                f"| {m['p50_ms']}/{m['max_ms']} "
                f"| {m['processed_rps']}/{m['input_rps']} ({lag:.2f}) "
                f"| {m['state_mb']} | {verdict} |"
            )
            sys.stdout.flush()
            if over or starved:
                knee = rate
                break
        tail = f"knee at {knee} rows/s" if knee else "no knee inside the ladder"
        print(f"\n{name}: {tail}\n")


def cmd_bigstate(spark: SparkSession, args) -> None:
    print(
        f"### §17b interval-join big-state run (rate {args.rate} rows/s x "
        f"{args.secs} s, 15 min watermark => no eviction in-run)\n"
    )
    print("| provider | batches | p50/max ms | state rows | state MB | verdict |")
    print("|---|---|---|---|---|---|")
    for prov in args.providers:
        _set_provider(spark, prov)
        tmp = tempfile.mkdtemp(prefix=f"bigstate_{prov}_")
        try:
            m = _run(
                spark, "interval_join_stream", args.rate, args.secs,
                args.trigger_ms, tmp,
            )
        finally:
            _set_provider(spark, "heap")
            shutil.rmtree(tmp, ignore_errors=True)
        bar = "ok" if m["state_mb"] >= 1000 else "state < 1 GB — raise --rate/--secs"
        print(
            f"| {prov} | {m['batches']} | {m['p50_ms']}/{m['max_ms']} "
            f"| {m['state_rows']} | {m['state_mb']} | {bar} |"
        )
        sys.stdout.flush()


_CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def cmd_floor(spark: SparkSession, args) -> None:
    """The interval join's per-batch commit floor (§17c): fixed modest
    rate (well under the knee), vary provider x shuffle partitions x
    RocksDB changelog checkpointing; every state store in the plan
    commits once per batch, so the floor tracks the per-store commit
    cost x the store count (= shuffle partitions x stateful operators)."""
    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if args.auto_stores:
        # §17d: let the sizing knob pick the partition count instead of
        # hand-feeding it — the arithmetic the checkpoint will freeze
        from dataingestion_pt_ms_spark.session import streaming_state_conf

        conf = streaming_state_conf(
            args.auto_stores,
            trigger_seconds=args.trigger_ms / 1000.0,
        )
        picked = int(conf["spark.sql.shuffle.partitions"])
        print(
            f"streaming_state_conf(n_state_stores={args.auto_stores}, "
            f"trigger_seconds={args.trigger_ms / 1000.0}) -> "
            f"{picked} shuffle partitions\n"
        )
        if picked not in args.parts:
            args.parts.append(picked)
    print(
        f"### §17c interval-join commit floor (rate {args.rate} rows/s/side, "
        f"{args.secs} s/run, trigger {args.trigger_ms} ms)\n"
    )
    print(
        "| provider | shuffle parts | changelog | batches | p50/max ms "
        "| p50 commit ms | state MB |"
    )
    print("|---|---|---|---|---|---|---|")
    for prov in args.providers:
        changelog_opts = [False, True] if prov == "rocksdb" else [False]
        for parts in args.parts:
            for changelog in changelog_opts:
                _set_provider(spark, prov)
                spark.conf.set("spark.sql.shuffle.partitions", str(parts))
                if prov == "rocksdb":
                    spark.conf.set(_CHANGELOG_CONF, str(changelog).lower())
                tmp = tempfile.mkdtemp(prefix=f"floor_{prov}_{parts}_")
                try:
                    m = _run(
                        spark, "interval_join_stream", args.rate, args.secs,
                        args.trigger_ms, tmp,
                    )
                except Exception as exc:  # e.g. changelog conf unsupported
                    # pad to the full 7 columns so the markdown table the
                    # run report pastes stays well-formed (ADVICE r9)
                    print(f"| {prov} | {parts} | {changelog} | FAILED: {exc} | | | |")
                    continue
                finally:
                    _set_provider(spark, "heap")
                    spark.conf.set("spark.sql.shuffle.partitions", base_parts)
                    if prov == "rocksdb":
                        spark.conf.unset(_CHANGELOG_CONF)
                    shutil.rmtree(tmp, ignore_errors=True)
                print(
                    f"| {prov} | {parts} | {changelog} | {m['batches']} "
                    f"| {m['p50_ms']}/{m['max_ms']} | {m['p50_commit_ms']} "
                    f"| {m['state_mb']} |"
                )
                sys.stdout.flush()


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    k = sub.add_parser("knee")
    k.add_argument(
        "--jobs", nargs="+",
        default=["windowed_histogram_stream", "interval_join_stream"],
    )
    k.add_argument(
        "--rates", nargs="+", type=int,
        default=[100_000, 250_000, 500_000, 1_000_000, 2_000_000, 4_000_000],
    )
    k.add_argument("--secs", type=int, default=45)
    k.add_argument("--trigger-ms", type=int, default=2000)
    k.add_argument("--provider", choices=["heap", "rocksdb"], default="heap")
    k.add_argument(
        "--parts", type=int, default=None,
        help="streaming shuffle-partition count (default: session value)",
    )
    b = sub.add_parser("bigstate")
    b.add_argument("--rate", type=int, default=150_000)
    b.add_argument("--secs", type=int, default=150)
    b.add_argument("--trigger-ms", type=int, default=2000)
    b.add_argument("--providers", nargs="+", default=["heap", "rocksdb"])
    f = sub.add_parser("floor")
    f.add_argument("--rate", type=int, default=100_000)
    f.add_argument("--secs", type=int, default=60)
    f.add_argument("--trigger-ms", type=int, default=2000)
    f.add_argument("--parts", nargs="*", type=int, default=[32, 8])
    f.add_argument("--providers", nargs="+", default=["heap", "rocksdb"])
    f.add_argument(
        "--auto-stores", type=int, default=None,
        help="ALSO run the partition count streaming_state_conf selects "
        "for this many state stores per partition at --trigger-ms "
        "(session cores) — BENCH §17d",
    )
    args = ap.parse_args()

    spark = get_spark("stream-knee")
    if args.cmd == "knee":
        cmd_knee(spark, args)
    elif args.cmd == "bigstate":
        cmd_bigstate(spark, args)
    else:
        cmd_floor(spark, args)


if __name__ == "__main__":
    main()
