"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (5-way star join + hash agg) on
sf0.001 as the smoke check. ``queries()`` / ``oracle_sql()`` are backed by the
``dataingestion_pt_ms_spark.queries`` registry — one named query per operator
from SURVEY.md §2.B, each paired with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dataingestion_pt_ms_spark import queries as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn = _registry.queries()["flagship_region_monthly_revenue"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return _registry.oracle_sql()
