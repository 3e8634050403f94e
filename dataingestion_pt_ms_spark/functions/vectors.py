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


def unit_normalize(a: Column, decimals: int = 6) -> Column:
    """L2-unit-normalized copy of the vector (zero vectors stay zero).
    Components round to ``decimals`` so the value is engine-comparable
    (the division itself is exact double math; rounding guards the sqrt's
    last bit)."""
    n = l2_norm(a)
    return F.transform(
        a, lambda x: F.round(F.when(n != 0, x / n).otherwise(0.0), decimals)
    )


def quantize_int8(a: Column) -> tuple[Column, Column]:
    """(scale, q) symmetric int8 quantization: scale = max|x| / 127,
    q_i = floor(x_i / scale + 0.5) clamped to [-127, 127].

    floor(x + 0.5) instead of round(): identical halfway behavior in every
    engine (round() half-away vs half-even varies), so the quantized codes
    are bit-comparable cross-engine. Zero vectors quantize to all-zero with
    scale 0."""
    amax = F.array_max(F.transform(a, F.abs))
    scale = amax / F.lit(127.0)
    q = F.transform(
        a,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.when(scale != 0, F.floor(x / scale + F.lit(0.5)))
                .otherwise(0)
                .cast("int"),
            ),
        ),
    )
    return scale, q
