"""Text tokenization / shingling expressions (JVM-side, no UDFs).

The ``documents.text`` fixture is space-separated tokens; ``tokens`` also
collapses repeated whitespace so real text behaves.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text → array<string>."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def shingles(toks: Column, k: int = 3) -> Column:
    """k-gram shingles (distinct) of a token array.

    Array indexing in Spark SQL expressions is 0-based; ``sequence`` yields
    the start index of each shingle. Documents shorter than k yield an empty
    array (sequence guarded by a length check).
    """
    joined = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
    )
    idx = F.when(
        F.size(toks) >= k, F.sequence(F.lit(0), F.size(toks) - k)
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(F.transform(idx, joined))


def ngrams(toks: Column, n: int) -> Column:
    """Positional n-grams of a token array — duplicates KEPT, output order =
    span position (unlike ``shingles``, which dedups for set semantics).
    Documents shorter than n yield an empty array."""
    joined = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
    )
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, joined)


def token_fingerprint(text: Column) -> Column:
    """Canonical content fingerprint: md5 of the sorted distinct token set
    (classic "fingerprint" key-collapsing used for near-canonical dedup)."""
    return F.md5(F.concat_ws(" ", F.array_sort(distinct_tokens(text))))
