"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §2.B scans /
round-3 addition).

At 100 TB the single most expensive repeated cost is re-shuffling the same
fact table on the same join key job after job. Bucketing pre-shuffles ONCE
at write time: ``bucketBy(n, key)`` hash-partitions rows into a fixed
number of files per partition, and the catalog records (key, n) so the
planner can prove both sides of a join are already co-partitioned — the
SortMergeJoin then runs with NO Exchange on either side (and with
``sortBy`` no per-task sort either). The reference's analog is the
per-asset document layout (bars live under their asset,
``app/alpaca_service.py:183-185``) which likewise pre-co-locates by the
join key.

Plain ``.parquet(path)`` writes cannot carry bucket metadata — bucketing
requires the session catalog (``saveAsTable``), which is why these helpers
take a table name. Pass ``path`` to keep the data external (e.g. a test
temp dir) while the catalog holds only metadata.

tests/test_plans.py::test_bucketed_join_has_no_exchange asserts the
whole point: joining two tables bucketed (same key, same count) plans
ZERO Exchange operators with broadcast disabled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) catalog table.

    Joins/aggregations on ``bucket_cols`` against any table bucketed with
    the SAME column set and bucket count are exchange-free; ``sort_cols``
    additionally removes the SortMergeJoin's per-task sort.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key. The plan is
    exchange-free when both tables are bucketed on ``on`` with equal
    bucket counts (assert with plans.formatted_plan in tests/jobs)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
