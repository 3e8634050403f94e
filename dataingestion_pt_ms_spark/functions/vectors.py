"""Vector math over ``array<float|double>`` columns as higher-order
expressions (JVM-side, codegen'd — no UDFs, per SURVEY.md §2.B policy).

Cast inputs to ``array<double>`` before calling: float32 math would diverge
from any double-computing oracle. ``F.aggregate`` folds left-to-right, so the
summation order is deterministic for a given array.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL only if either norm is zero (guarded)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)
