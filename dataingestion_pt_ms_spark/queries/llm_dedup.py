"""Deduplication queries over ``documents`` (SURVEY.md §2.B: exact,
MinHash-LSH, SimHash, n-gram Jaccard).

Exact dedup and pairwise n-gram Jaccard have full DuckDB oracles. The
MinHash-LSH and SimHash pipelines hinge on Spark's ``xxhash64`` (not
available in DuckDB) → rows-only driver check, with determinism and
recall-vs-exact covered by engine tests (tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup as D
from . import register

_DTOKS = "string_split_regex(lower(trim(text)), '\\s+')"
# DuckDB twin of functions.textfns.shingles (k=3, distinct, 1-based index)
_DSHINGLES = (
    "list_distinct(CASE WHEN len(TOKS) >= 3 THEN "
    "list_transform(generate_series(1, len(TOKS) - 2), "
    "i -> concat_ws(' ', TOKS[i], TOKS[i+1], TOKS[i+2])) "
    "ELSE [] END)".replace("TOKS", _DTOKS)
)

EXACT_ORACLE = """
SELECT md5(text) AS content_hash,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_dupes
FROM documents
GROUP BY md5(text)
"""


@register("dedup_exact_groups", oracle=EXACT_ORACLE, tags=("llm", "dedup"))
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(docs, "text", "doc_id")


KEEP_ORACLE = """
SELECT doc_id, lang, source
FROM documents
WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
"""


@register("dedup_exact_kept_rows", oracle=KEEP_ORACLE, tags=("llm", "dedup", "semi"))
def dedup_exact_kept_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keep = D.exact_dedup(docs, "text", "doc_id").select(
        F.col("keep_doc_id").alias("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi").select("doc_id", "lang", "source")


NGRAM_ORACLE = f"""
WITH sh AS (SELECT doc_id, {_DSHINGLES} AS sh FROM documents)
SELECT a.doc_id AS key_a, b.doc_id AS key_b,
       round(CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) = 0 THEN 0.0
                  ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                       / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             END, 6) AS jaccard
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
ORDER BY key_a
"""


@register("dedup_ngram_jaccard_pairs", oracle=NGRAM_ORACLE, tags=("llm", "dedup"))
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard over consecutive-id candidate pairs (bounded
    candidate set → SQL-checkable; the LSH query below generates candidates
    at scale instead)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(F.col("doc_id").alias("key_a")).join(
        docs.select((F.col("doc_id") - 1).alias("key_a"), F.col("doc_id").alias("key_b")),
        "key_a",
    )
    return D.jaccard_pairs(docs, pairs, "text", "doc_id").orderBy("key_a")


@register("dedup_minhash_lsh_pairs", oracle=None, tags=("llm", "dedup", "lsh"))
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(8×8) candidate generation + exact-Jaccard verify at
    ≥0.8. Deterministic (fixed permutation constants); engine tests compare
    its pair set against exhaustive Jaccard at small SF."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_near_dups(docs, "text", "doc_id", threshold=0.8)


@register("dedup_simhash_pairs", oracle=None, tags=("llm", "dedup", "simhash"))
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-63 hamming distance over consecutive-id candidates."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_near_dups(docs, "text", "doc_id", max_hamming=20)
