"""Physical-plan assertions: make the scale discipline testable.

SURVEY.md §2.B demands filters/projections reach the parquet scan
(PushedFilters / ReadSchema), bounded dims broadcast, and no accidental
cartesian products. These helpers parse ``explain("formatted")`` output so
tests/test_plans.py can enforce it per flagship query.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Assert some filter mentioning ``fragment`` was pushed to a scan."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line and "[]" not in line:
            return
    raise AssertionError(
        f"no pushed filter mentioning {fragment!r}; plan:\n{plan}"
    )


def assert_read_schema_pruned(df: DataFrame, table_hint: str, max_cols: int) -> None:
    """Assert the scan whose ReadSchema mentions ``table_hint`` reads at most
    ``max_cols`` columns (column pruning reached the reader)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line and table_hint in line:
            schema_part = line.split("ReadSchema:", 1)[1]
            n = schema_part.count(":")
            if n <= max_cols:
                return
            raise AssertionError(
                f"scan for {table_hint!r} reads {n} columns (> {max_cols}):\n{line}"
            )
    raise AssertionError(f"no scan with ReadSchema mentioning {table_hint!r}:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError(f"expected a broadcast join in plan:\n{plan}")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"unexpected CartesianProduct in plan:\n{plan}")
