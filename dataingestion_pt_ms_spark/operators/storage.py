"""Storage-layout introspection — distributed parquet footer audits.

The reference trusts whatever Firestore hands back and never looks at how
its data is laid out (``app/alpaca_service.py:190-230`` writes documents
one by one). A 100 TB lakehouse lives or dies by layout: row-group min/max
statistics are what make predicate pushdown skip data (the ``PushedFilters``
the plan tests assert are only useful when the footer stats are selective),
and a mis-sorted table silently degrades every scan. These operators read
ONLY footers — KB-sized tail reads per file — so auditing a million-file
table costs O(#files) metadata fetches and zero data scan.

Scale shape: the file list is itself a DataFrame (millions of rows for a
real table), ``mapInPandas`` fans the footer reads across executors, and
everything downstream is ordinary grouped aggregation over the
(file × row_group × column) stats frame. No driver-side loop, no collect.

Engine-tested (tests/test_storage.py) against DuckDB's ``parquet_metadata``
on multi-row-group fixtures; the shipped testdata tables are single-row-
group so no oracled registry query exists for this operator (the driver's
oracle harness can only see pre-registered table views).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

ROWGROUP_STATS_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("row_group", LongType()),
        StructField("column", StringType()),
        StructField("num_values", LongType()),
        StructField("null_count", LongType()),
        StructField("total_byte_size", LongType()),
        StructField("stat_min", StringType()),
        StructField("stat_max", StringType()),
    ]
)


def _stat_str(v) -> str | None:
    """Stringify a footer statistic the way DuckDB's parquet_metadata does:
    plain repr for numerics, the raw string for BYTE_ARRAY columns."""
    if v is None:
        return None
    if isinstance(v, bytes):
        return v.decode("utf-8", errors="replace")
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def rowgroup_stats(paths: DataFrame, path_col: str = "path") -> DataFrame:
    """One row per (file, row_group, column) with the footer statistics:
    value/null counts, encoded byte size, and min/max stringified.

    ``paths`` is a DataFrame of parquet file paths — the distributed unit
    of work. Each task opens only the footer (pyarrow reads the tail
    metadata block, never row data).
    """

    def read_footers(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out: list[dict] = []
            for path in pdf[path_col]:
                meta = pq.ParquetFile(path).metadata
                for rg in range(meta.num_row_groups):
                    rg_meta = meta.row_group(rg)
                    for ci in range(rg_meta.num_columns):
                        col = rg_meta.column(ci)
                        st = col.statistics
                        out.append(
                            {
                                "path": path,
                                "row_group": rg,
                                "column": col.path_in_schema,
                                "num_values": rg_meta.num_rows,
                                "null_count": (
                                    st.null_count
                                    if st is not None and st.has_null_count
                                    else None
                                ),
                                "total_byte_size": col.total_compressed_size,
                                "stat_min": (
                                    _stat_str(st.min)
                                    if st is not None and st.has_min_max
                                    else None
                                ),
                                "stat_max": (
                                    _stat_str(st.max)
                                    if st is not None and st.has_min_max
                                    else None
                                ),
                            }
                        )
            yield pd.DataFrame(
                out, columns=[f.name for f in ROWGROUP_STATS_SCHEMA.fields]
            )

    import pandas as pd  # noqa: F401  (mapInPandas requires pandas at plan time)

    return paths.mapInPandas(read_footers, schema=ROWGROUP_STATS_SCHEMA)


def pruning_effectiveness(
    stats: DataFrame,
    column: str,
    lo: float | int | None = None,
    hi: float | int | None = None,
) -> DataFrame:
    """Per-file data-skipping report for the predicate
    ``lo <= column <= hi`` (either bound optional) against a numeric
    column's row-group min/max stats.

    A row group is *prunable* when its [min, max] envelope provably
    excludes the predicate range — exactly the decision a parquet reader
    makes from the footer, so this predicts scan cost before any cluster
    hours are spent. Returns (path, n_row_groups, n_prunable,
    prunable_frac, rows_skipped).
    """
    col_stats = stats.filter(F.col("column") == column).select(
        "path",
        "row_group",
        "num_values",
        F.col("stat_min").cast("double").alias("mn"),
        F.col("stat_max").cast("double").alias("mx"),
    )
    conds = []
    if lo is not None:
        conds.append(F.col("mx") < F.lit(float(lo)))
    if hi is not None:
        conds.append(F.col("mn") > F.lit(float(hi)))
    if not conds:
        raise ValueError("at least one of lo/hi must be given")
    prunable = conds[0]
    for c in conds[1:]:
        prunable = prunable | c
    # stats-less row groups (mn/mx NULL) are never prunable — a reader
    # must scan them; coalesce makes that explicit instead of NULL-voting
    prunable = F.coalesce(prunable, F.lit(False))
    return (
        col_stats.withColumn("_p", prunable)
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_row_groups"),
            F.sum(F.col("_p").cast("long")).alias("n_prunable"),
            F.round(
                F.sum(F.col("_p").cast("long"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("prunable_frac"),
            F.sum(F.when(F.col("_p"), F.col("num_values")).otherwise(0)).alias(
                "rows_skipped"
            ),
        )
        .orderBy("path")
    )


def table_paths(spark: SparkSession, table_dir_or_file: str) -> DataFrame:
    """DataFrame of parquet file paths under a table location (or the
    single file itself). Listing happens once on the driver — at real
    scale swap for a catalog/manifest read (Delta/Iceberg file lists) or a
    recursive binaryFile listing; the audit itself stays distributed."""
    import os

    if os.path.isdir(table_dir_or_file):
        files = sorted(
            os.path.join(table_dir_or_file, f)
            for f in os.listdir(table_dir_or_file)
            if f.endswith(".parquet")
        )
    else:
        files = [table_dir_or_file]
    return spark.createDataFrame([(p,) for p in files], ["path"])
