"""Runtime-filter operators: a hand-rolled broadcast bloom filter for
semi-join pre-filtering.

Spark's own runtime bloom filters (`spark.sql.optimizer.runtimeFilter.*`,
InjectRuntimeFilter) inject this shape automatically for some plans, but the
`bloom_filter_agg` / `might_contain` expressions are not in the public
function registry (UNRESOLVED_ROUTINE in 4.1), so this module builds the
same machinery from registered expressions only: xxhash64 positions, a
bit_or-aggregated bitmap table, and broadcast probe joins.

Why it matters at 100 TB: a plain semi-join against a filter side that is
too large to broadcast as a hash relation shuffles the ENTIRE probe side on
the join key. The bloom bitmap is ~m_bits/8 bytes regardless of key count
(16 MiB covers ~10M keys at 1% fp with k=3), always broadcastable, and
eliminates non-matching probe rows AT THE SCAN, so the exact semi-join that
follows shuffles only survivors. False positives cost nothing but wasted
verify work; false negatives are impossible (bit_or only adds bits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_bitmap(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 3
) -> DataFrame:
    """Aggregate ``keys[key_col]`` into a bloom bitmap table
    (word_idx: long, bits: long) of ``m_bits / 64`` rows.

    Each key sets ``k`` bits at ``pmod(xxhash64(key, seed), m_bits)``.
    The explode is map-local; the only exchange groups by word index
    (≤ m_bits/64 groups) with map-side partial bit_or, so the build cost
    is one scan of the key column regardless of key cardinality.
    """
    pos = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
            for i in range(k)
        ]
    )
    return (
        keys.select(F.explode(pos).alias("pos"))
        .groupBy(F.shiftright("pos", 6).alias("word_idx"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
            ).alias("bits")
        )
    )


def bloom_prefilter(
    probe: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Keep only probe rows whose key MIGHT be in the bloom ``bitmap``
    (same m_bits/k as the build). Possibly-superset output: false
    positives pass, true members always pass.

    Each of the ``k`` probes is a broadcast join on word_idx against the
    tiny bitmap table followed by a codegen'd bit test — the probe side
    never shuffles.
    """
    out = probe
    for i in range(k):
        out = out.withColumn(
            f"_p{i}", F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
        )
    for i in range(k):
        bm = bitmap.select(
            F.col("word_idx").alias(f"_w{i}"), F.col("bits").alias(f"_b{i}")
        )
        out = (
            out.join(
                F.broadcast(bm),
                F.shiftright(F.col(f"_p{i}"), 6) == F.col(f"_w{i}"),
                "left",
            )
            .filter(
                F.col(f"_b{i}").isNotNull()
                & (
                    F.col(f"_b{i}").bitwiseAND(
                        F.expr(
                            f"shiftleft(CAST(1 AS BIGINT), CAST(_p{i} % 64 AS INT))"
                        )
                    )
                    != 0
                )
            )
            .drop(f"_p{i}", f"_w{i}", f"_b{i}")
        )
    return out


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Exact ``big LEFT SEMI JOIN small`` with a bloom pre-filter: build the
    bitmap from the small side's keys, broadcast-probe the big side, then
    run the real semi-join on the (tiny) survivor set. Output is exactly
    the plain semi-join's — the bloom stage is semantics-free (the query
    oracle runs the plain form to prove it).
    """
    bitmap = bloom_bitmap(small.select(small_key), small_key, m_bits, k)
    survivors = bloom_prefilter(big, bitmap, big_key, m_bits, k)
    return survivors.join(
        small.select(F.col(small_key).alias(big_key)),
        big_key,
        "left_semi",
    )
