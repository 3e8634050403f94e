"""SparkSession factory.

Defaults mirror a production cluster profile, scaled to local mode:

- **AQE on** (runtime shuffle-partition coalescing, skew-join splitting,
  adaptive broadcast): this is the whole "optimizer story" beyond Catalyst
  defaults — see SURVEY.md §4.
- **UTC session timezone**: the reference normalizes every timestamp to UTC
  (reference ``app/alpaca_service.py:161``); it also makes DuckDB-oracle
  comparisons well-defined (DuckDB timestamps are UTC-naive).
- **shuffle.partitions ~ cores**: on a real cluster this would be 2-3x total
  executor cores (or left to AQE's coalescing from a high initial value);
  200 is wrong in both directions for local mode.
- **Arrow enabled**: the few Pandas-UDF operators (MinHash banding helpers,
  multimodal feature stubs) use Arrow-batched transfer, never row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "dataingestion-pt-ms-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract for
    bench runs) or ``local[*]``.
    """
    cpus = default_parallelism()
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # events.ts is parquet TIMESTAMP(NANOS): Spark has no ns timestamp
        # type; read as long and normalize to µs in the catalog (matches
        # DuckDB's ns→µs truncation on read).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local mode: driver JVM is the whole cluster; leave headroom in the
        # 128 GiB container. On a real cluster this is per-executor memory.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
