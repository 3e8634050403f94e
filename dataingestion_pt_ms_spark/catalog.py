"""Loaders for the driver-materialized test tables (TESTDATA.md).

Tables: TPC-H-ish star schema + ``events`` (stream stand-in) +
``documents``/``embeddings`` (LLM ops). One parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Scale notes (100 TB discipline):
- ``region``/``nation`` are bounded-small by schema semantics (5 / 25 rows at
  any SF) — always broadcast-join them explicitly.
- ``supplier``/``part``/``customer`` grow with SF but stay dimension-sized;
  leave the broadcast decision to Catalyst/AQE so the plan survives scale-up.
- ``lineitem``/``orders``/``events``/``documents``/``embeddings`` are fact
  tables: joins between them shuffle on their keys; never broadcast.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dims safe to broadcast unconditionally (bounded cardinality at any SF).
ALWAYS_BROADCAST: frozenset[str] = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def _ensure_session_confs(spark: SparkSession) -> None:
    """Queries must work on ANY SparkSession (the driver builds its own):
    - events.ts is parquet TIMESTAMP(NANOS) → unreadable without
      nanosAsLong (PARQUET_TYPE_ILLEGAL);
    - timestamp formatting must be UTC to agree with the DuckDB oracle;
    - AQE + partition coalescing so a session built with default
      shuffle.partitions=200 doesn't pay 200 near-empty tasks per shuffle
      at oracle SF (and picks broadcast/skew plans adaptively at any SF).
    All are runtime-settable SQL confs."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # deliberately NOT lowering coalescePartitions.minPartitionSize here:
    # a blanket floor change reorders FP aggregation (it flipped
    # agg_global_summary's rounded avg vs the oracle in r10 opt). CPU-dense
    # Python stages get explicit repartition() at the operator instead; the
    # env knob below exists for experiments only.
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "1m"),
    )


# Memoized (session → {(sf_dir, table) → DataFrame}). A DataFrame is just an
# analyzed plan — reusing it skips only the repeated parquet footer/schema
# read (~130 queries × 2-3 tables each adds up in the driver's correctness
# sweep), never caches row data, and keeps scan-level pushdown/pruning
# intact for every consumer. WeakKey so a stopped session's plans are
# dropped with it.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    per_session = _TABLE_CACHE.setdefault(spark, {})
    key = (sf_dir.rstrip("/"), name)
    if key in per_session:
        return per_session[key]
    _ensure_session_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # Normalize events.ts to TIMESTAMP (LTZ, µs) whatever the parquet
        # physical type of the driver-generated file:
        # - TIMESTAMP(NANOS): surfaced as long (ns since epoch) via
        #   spark.sql.legacy.parquet.nanosAsLong. Truncate to µs with
        #   integer division (ns epoch values exceed double's 2^53 mantissa
        #   — float division would corrupt them) — identical to DuckDB's
        #   ns→µs truncation on read.
        # - TIMESTAMP_NTZ (isAdjustedToUTC=false µs): plain cast; the
        #   session timezone is pinned UTC so wall-clock values are
        #   preserved bit-exactly and match DuckDB's naive read.
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    per_session[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register every table as a temp view (for the SQL-API paths)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t + suffix)
