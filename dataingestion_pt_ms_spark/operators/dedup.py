"""Deduplication operator family (SURVEY.md §2.B "LLM-data-pipeline"):

- exact dedup (hash-groupBy, keep-min-key) — the distributed version of the
  reference's keyed upsert dedup (R16, ``app/alpaca_service.py:194,207``);
- MinHash + LSH banding near-dup (shingle → minhash signature → banded
  bucket join → exact-jaccard verify);
- SimHash (63-bit, sign-of-weighted-bit-sums);
- n-gram Jaccard scoring for candidate pairs.

All compositions are pure DataFrame expressions — no Python UDFs — so they
scale: the LSH band join shuffles on (band_idx, band_hash) only; candidate
verification touches candidate pairs, never the O(n²) cross product.

ANSI-mode note (Spark 4 default): arithmetic overflow throws, so minhash
permutations work in a 31-bit modular space (h mod M, a*h+b mod M with
M = 2^31-1) — products stay < 2^62.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import distinct_tokens, shingles, tokens

_MERSENNE31 = 2_147_483_647  # 2^31 - 1, prime


def exact_dedup(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """Group identical texts, keep the smallest key (deterministic winner).

    Returns (content_hash, keep_key, n_dupes) per distinct text.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(key_col).alias("keep_" + key_col),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


def _perm_params(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) constants for the universal-hash permutations
    (a odd, both bounded by M so a*h stays < 2^62 under ANSI arithmetic)."""
    half = (_MERSENNE31 - 1) // 2
    return [
        (
            2 * ((p * 1_103_515_245 + 12_345) % half) + 1,
            (p * 69_069 + 1) % _MERSENNE31,
        )
        for p in range(num_perm)
    ]


def minhash_signature(
    df: DataFrame, text_col: str, key_col: str, num_perm: int = 64, shingle_k: int = 3
) -> DataFrame:
    """(key, signature: array<long>) MinHash signatures.

    Shape chosen for codegen, not elegance: higher-order-function lambdas
    (transform/aggregate) are *interpreted* per array element in Spark, so
    folding 64 permutations inside array expressions costs ~1µs/element
    (measured). Instead: explode shingles → one base hash per shingle → 64
    codegen'd scalar permutations as ``min`` aggregates. Map-side partial
    aggregation collapses each partition to one 64-column row per doc before
    the shuffle, so the exchange is O(docs), not O(shingles).

    Base shingle hash = first 8 hex chars of md5 as an integer (mod M):
    engine-agnostic, so signatures — and therefore the whole LSH pipeline —
    are exactly reproducible by the DuckDB oracle.
    """
    # spread CPU-bound work: one small parquet file = one partition otherwise
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    exploded = df.select(
        F.col(key_col),
        F.explode(shingles(tokens(F.col(text_col)), shingle_k)).alias("_s"),
    ).select(
        key_col,
        F.pmod(
            F.conv(F.substring(F.md5("_s"), 1, 8), 16, 10).cast("long"),
            F.lit(_MERSENNE31),
        ).alias("_h"),
    )
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("_h") + F.lit(b), F.lit(_MERSENNE31))).alias(
            f"_m{p}"
        )
        for p, (a, b) in enumerate(_perm_params(num_perm))
    ]
    sig_df = exploded.groupBy(key_col).agg(*aggs)
    return sig_df.select(
        key_col, F.array(*[F.col(f"_m{p}") for p in range(num_perm)]).alias("signature")
    )


def lsh_candidate_pairs(
    sig_df: DataFrame, key_col: str, bands: int = 8, rows_per_band: int = 8
) -> DataFrame:
    """Banded LSH: docs sharing any band-hash become a candidate pair.

    Explodes each signature into ``bands`` (band_idx, band_hash) rows, then
    self-joins on the band key — the shuffle key is the band hash, so skew is
    bounded by actual near-duplicate cluster sizes.
    Returns distinct (key_a, key_b) with key_a < key_b.
    """
    banded = sig_df.select(
        F.col(key_col).alias("k"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at(
                                        F.col("signature"), b * rows_per_band + r + 1
                                    ).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("k", "band.band_idx", "band.band_hash")
    # One aggregation instead of a self-join: the self-join would evaluate
    # the whole signature lineage twice, and bucket sizes are bounded by
    # real near-dup cluster sizes, so in-expression pair expansion is cheap.
    grouped = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.array_sort(F.collect_list("k")).alias("ks"))
        .filter(F.size("ks") > 1)
    )
    pair_arrays = F.transform(
        F.col("ks"),
        lambda x, i: F.transform(
            F.slice(F.col("ks"), i + 2, F.size(F.col("ks"))),
            lambda y: F.struct(x.alias("key_a"), y.alias("key_b")),
        ),
    )
    return (
        grouped.select(F.explode(F.flatten(pair_arrays)).alias("p"))
        .select("p.key_a", "p.key_b")
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str,
    key_col: str,
    shingle_k: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (the verify step).

    Shingles are computed only for docs appearing in a candidate pair (semi
    join first) — the candidate set is tiny relative to the corpus, so the
    verify cost tracks near-dup density, not corpus size.
    """
    keys = (
        pairs.select(F.col("key_a").alias("k"))
        .unionByName(pairs.select(F.col("key_b").alias("k")))
        .distinct()
    )
    needed = docs.join(
        F.broadcast(keys), docs[key_col] == keys["k"], "left_semi"
    )
    sh = needed.repartition(docs.sparkSession.sparkContext.defaultParallelism).select(
        F.col(key_col).alias("k"),
        shingles(tokens(F.col(text_col)), shingle_k).alias("sh"),
    )
    a = sh.select(F.col("k").alias("key_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("k").alias("key_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return (
        pairs.join(a, "key_a")
        .join(b, "key_b")
        .select(
            "key_a",
            "key_b",
            F.round(F.when(union != 0, inter / union).otherwise(0.0), 6).alias("jaccard"),
        )
    )


def minhash_lsh_near_dups(
    df: DataFrame,
    text_col: str,
    key_col: str,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """End-to-end MinHash-LSH near-duplicate pairs with exact verification."""
    rows = num_perm // bands
    sig = minhash_signature(df, text_col, key_col, num_perm, shingle_k)
    cands = lsh_candidate_pairs(sig, key_col, bands, rows)
    verified = jaccard_pairs(df, cands, text_col, key_col, shingle_k)
    return verified.filter(F.col("jaccard") >= threshold).orderBy("key_a", "key_b")


def simhash63(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """63-bit SimHash per document (bit 63 unused: keeps the value a
    non-negative long under ANSI arithmetic).

    Scalable shape: explode tokens → one 63-bit md5-derived hash per token
    (hi 32 bits × 2^31 + lo 31 bits — engine-agnostic, so the whole pipeline
    is oracle-checkable) → 63 conditional sums in a single grouped
    aggregation → reassemble bits.
    """
    md = F.md5("tok")
    hi = F.conv(F.substring(md, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(md, 9, 8), 16, 10).cast("long")
    tok = df.select(
        F.col(key_col), F.explode(distinct_tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", hi * F.lit(2_147_483_648) + F.pmod(lo, F.lit(2_147_483_648)))
    bit_sums = tok.groupBy(key_col).agg(
        *[
            F.sum(
                F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(63)
        ]
    )
    sim = None
    for j in range(63):
        bit = F.when(F.col(f"b{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )
        sim = bit if sim is None else sim + bit
    return bit_sums.select(key_col, sim.alias("simhash"))


def simhash_near_dups(
    df: DataFrame, text_col: str, key_col: str, max_hamming: int = 16
) -> DataFrame:
    """SimHash near-dup pairs among consecutive-key candidates.

    (Full-scale variant would band the simhash into 4×16-bit chunks and
    join on exact chunk match — same LSH shape as minhash; candidate
    restriction here keeps the demo query bounded.)
    """
    s = simhash63(df, text_col, key_col)
    a = s.select(F.col(key_col).alias("key_a"), F.col("simhash").alias("sim_a"))
    b = s.select(F.col(key_col).alias("key_b"), F.col("simhash").alias("sim_b"))
    return (
        a.join(b, F.col("key_b") == F.col("key_a") + 1)
        .select(
            "key_a",
            "key_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("key_a")
    )
