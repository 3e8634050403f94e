"""Corpus-statistics quality signals (round-3 additions, SURVEY.md §2.B
"LLM-data-pipeline"): information-theoretic gates a pretraining curation
pipeline runs alongside the rule-based ones in operators/text.py.

- per-document token entropy: low-entropy docs are boilerplate/repetition
  (the signal behind "remove documents whose token distribution is too
  peaked"); complements the Gopher repetition ratios already in
  text_repetition_score;
- per-source KL divergence vs the corpus token distribution: sources whose
  unigram distribution diverges hardest from the pool (domain skew /
  contamination triage at the source level);
- per-source vocabulary growth (type-token ratio + hapax share): the
  Heaps-law summary that flags template farms (tiny vocabulary at huge
  token counts) and OCR noise (hapax explosion).

All are pure DataFrame aggregations over the exploded token table — the
shuffles are on (doc, token) / (source, token) / token, never on text
payloads, and every query carries a full DuckDB oracle built on the shared
DTOKS tokenizer twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.textfns import tokens
from . import register
from ._ducktwins import DTOKS

ENTROPY_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({DTOKS}) AS tok FROM documents
), counts AS (
  SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
), totals AS (
  SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n,
         CAST(count(*) AS BIGINT) AS n_distinct
  FROM counts GROUP BY doc_id
)
SELECT counts.doc_id AS doc_id,
       CAST(totals.n AS BIGINT) AS n_tokens,
       totals.n_distinct,
       round(-sum((c / n) * ln(c / n)), 6) AS token_entropy
FROM counts JOIN totals ON counts.doc_id = totals.doc_id
GROUP BY counts.doc_id, totals.n, totals.n_distinct
ORDER BY doc_id
"""


@register(
    "text_token_entropy", oracle=ENTROPY_ORACLE, tags=("llm", "text", "quality")
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each document's token distribution. Two
    narrow shuffles on the doc grain ((doc, tok) counts, then per-doc
    fold); text bytes never shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    counts = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("doc_id").agg(
        F.sum("c").cast("double").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    return (
        counts.join(totals, "doc_id")
        .groupBy("doc_id", "n", "n_distinct")
        .agg(
            F.round(
                -F.sum((F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("n"))), 6
            ).alias("token_entropy")
        )
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            "n_distinct",
            "token_entropy",
        )
        .orderBy("doc_id")
    )


KL_ORACLE = f"""
WITH tok AS (
  SELECT source, unnest({DTOKS}) AS tok FROM documents
), src_counts AS (
  SELECT source, tok, count(*) AS c FROM tok GROUP BY source, tok
), src_totals AS (
  SELECT source, CAST(sum(c) AS DOUBLE) AS n FROM src_counts GROUP BY source
), corpus_counts AS (
  SELECT tok, CAST(sum(c) AS DOUBLE) AS cc FROM src_counts GROUP BY tok
), corpus_total AS (
  SELECT CAST(sum(cc) AS DOUBLE) AS m FROM corpus_counts
)
SELECT s.source AS source,
       CAST(t.n AS BIGINT) AS n_tokens,
       round(sum((s.c / t.n) * ln((s.c / t.n) / (g.cc / ct.m))), 6)
         AS kl_divergence
FROM src_counts s
JOIN src_totals t ON s.source = t.source
JOIN corpus_counts g ON s.tok = g.tok
CROSS JOIN corpus_total ct
GROUP BY s.source, t.n
ORDER BY source
"""


@register(
    "docs_source_kl_divergence", oracle=KL_ORACLE, tags=("llm", "text", "quality")
)
def docs_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(source token distribution || corpus token distribution) per
    source — the domain-skew triage stat. q > 0 always holds because the
    corpus distribution is the sum of the source distributions, so no
    smoothing is needed. The corpus counts reuse the (source, tok) partial
    aggregation (one extra token-keyed shuffle), and the corpus total is a
    broadcast one-row scalar."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    src_counts = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    src_counts = src_counts.localCheckpoint(eager=False)  # feeds 3 branches
    src_totals = src_counts.groupBy("source").agg(
        F.sum("c").cast("double").alias("n")
    )
    corpus_counts = src_counts.groupBy("tok").agg(
        F.sum("c").cast("double").alias("cc")
    )
    corpus_total = corpus_counts.agg(F.sum("cc").alias("m"))
    p = F.col("c") / F.col("n")
    q = F.col("cc") / F.col("m")
    return (
        src_counts.join(F.broadcast(src_totals), "source")
        .join(corpus_counts, "tok")
        .crossJoin(F.broadcast(corpus_total))
        .groupBy("source", "n")
        .agg(F.round(F.sum(p * F.log(p / q)), 6).alias("kl_divergence"))
        .select(
            "source", F.col("n").cast("long").alias("n_tokens"), "kl_divergence"
        )
        .orderBy("source")
    )


VOCAB_ORACLE = f"""
WITH tok AS (
  SELECT source, unnest({DTOKS}) AS tok FROM documents
), counts AS (
  SELECT source, tok, count(*) AS c FROM tok GROUP BY source, tok
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
         AS type_token_ratio,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS hapax_ratio
FROM counts
GROUP BY source
ORDER BY source
"""


@register(
    "docs_vocab_growth", oracle=VOCAB_ORACLE, tags=("llm", "text", "quality")
)
def docs_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary summary (Heaps-law style): token count, type
    count, type-token ratio, hapax legomena share. One (source, tok)
    partial-agg shuffle, then a source-grain fold."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    counts = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return (
        counts.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.sum("c").cast("double"), 6
            ).alias("type_token_ratio"),
            hapax.cast("long").alias("n_hapax"),
            F.round(
                hapax.cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("hapax_ratio"),
        )
        .orderBy("source")
    )
