"""Plan-inspection helpers (the 100 TB discipline made checkable)."""

from .inspect import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_pruned,
    formatted_plan,
)

__all__ = [
    "formatted_plan",
    "assert_pushed_filters",
    "assert_read_schema_pruned",
    "assert_broadcast_join",
    "assert_no_cartesian",
]
