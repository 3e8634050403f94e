"""Text-analysis queries over ``documents`` (SURVEY.md §2.B "text analysis":
language-ID, quality scoring, token counting, fingerprinting, TF).

Implementations live in operators/text.py; the oracles mirror each
expression in DuckDB list/regex functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import text as T
from . import register

# DuckDB twin of functions.textfns.tokens
_DTOKS = "string_split_regex(lower(trim(text)), '\\s+')"

TOKEN_STATS_ORACLE = f"""
SELECT doc_id, lang,
       CAST(len({_DTOKS}) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct({_DTOKS})) AS BIGINT) AS n_distinct_tokens,
       round(list_sum(list_transform({_DTOKS}, t -> CAST(len(t) AS DOUBLE)))
             / CAST(len({_DTOKS}) AS DOUBLE), 6) AS avg_token_len
FROM documents
"""


@register("text_token_stats", oracle=TOKEN_STATS_ORACLE, tags=("llm", "text"))
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return T.token_stats(docs).drop("text")


TF_ORACLE = f"""
SELECT token, count(*) AS tf
FROM (SELECT unnest({_DTOKS}) AS token FROM documents)
GROUP BY token
ORDER BY tf DESC, token
"""


@register("text_term_frequency", oracle=TF_ORACLE, tags=("llm", "text", "agg"))
def text_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.term_frequency(docs).orderBy(F.col("tf").desc(), "token")


_MARKER_LIST = ", ".join(f"'{m}'" for m in T.EN_MARKERS)
LANGID_ORACLE = f"""
SELECT doc_id, lang,
       round(CAST(len(list_filter({_DTOKS}, t -> t IN ({_MARKER_LIST}))) AS DOUBLE)
             / CAST(len({_DTOKS}) AS DOUBLE), 6) AS en_marker_ratio,
       CASE WHEN CAST(len(list_filter({_DTOKS}, t -> t IN ({_MARKER_LIST}))) AS DOUBLE)
                 / CAST(len({_DTOKS}) AS DOUBLE) >= 0.05
            THEN 'en' ELSE 'unknown' END AS predicted_lang
FROM documents
"""


@register("text_language_id", oracle=LANGID_ORACLE, tags=("llm", "text"))
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    out = T.language_id(docs)
    # round-before-compare on both sides so the threshold test sees the same
    # value; recompute predicted from the rounded ratio
    return out.select(
        "doc_id",
        "lang",
        "en_marker_ratio",
        F.when(F.col("en_marker_ratio") >= 0.05, "en").otherwise("unknown").alias("predicted_lang"),
    )


QUALITY_ORACLE = f"""
WITH q AS (
  SELECT doc_id, source,
         CAST(len(list_distinct({_DTOKS})) AS DOUBLE) / CAST(len({_DTOKS}) AS DOUBLE) AS diversity,
         least(CAST(len({_DTOKS}) AS DOUBLE) / 100.0, 1.0) AS length_sat,
         1 - CAST(len(list_filter({_DTOKS}, t -> t IN ({_MARKER_LIST}))) AS DOUBLE)
             / CAST(len({_DTOKS}) AS DOUBLE) AS density
  FROM documents
)
SELECT doc_id, source,
       round(diversity, 6) AS diversity,
       round(length_sat, 6) AS length_sat,
       round(density, 6) AS density,
       round(0.4 * diversity + 0.3 * length_sat + 0.3 * density, 6) AS quality_score
FROM q
"""


@register("text_quality_score", oracle=QUALITY_ORACLE, tags=("llm", "text"))
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return T.quality_score(docs).drop("text")


FP_ORACLE = f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct({_DTOKS})), ' ')) AS fingerprint
FROM documents
"""


@register("text_fingerprint", oracle=FP_ORACLE, tags=("llm", "text", "dedup"))
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return T.fingerprint(docs).drop("text")


TOKCOUNT_ORACLE = f"""
SELECT doc_id,
       CAST(len({_DTOKS}) AS BIGINT) AS ws_token_count,
       CAST(len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'), t -> len(t) > 0)) AS BIGINT)
         AS regex_token_count,
       CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS bpe_token_estimate
FROM documents
"""


@register("text_token_counts", oracle=TOKCOUNT_ORACLE, tags=("llm", "text"))
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return T.token_count_estimates(docs).drop("text")


@register("text_rolling_hash_fingerprint", oracle=None, tags=("llm", "text", "dedup"))
def text_rolling_hash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial rolling-hash fingerprint per document
    (operators/text.py:rolling_hash). xxhash64-based → rows-only; equality
    and order-sensitivity properties are pytest-verified."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return T.rolling_hash(docs).drop("text")


TFIDF_ORACLE = f"""
WITH tok AS (SELECT doc_id, unnest({_DTOKS}) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.token AS token, tf, df,
         round(tf * ln((1.0 + n_docs) / (1.0 + df)), 6) AS tf_idf
  FROM tf JOIN dfreq ON tf.token = dfreq.token CROSS JOIN n
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tf_idf DESC, token) AS rk
  FROM scored
)
SELECT doc_id, token, tf, df, tf_idf, rk FROM ranked WHERE rk <= 5
"""


@register("text_tf_idf_topk", oracle=TFIDF_ORACLE, tags=("llm", "text", "agg", "window"))
def text_tf_idf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic tokens per document by TF-IDF."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return T.tf_idf_topk(docs, "text", "doc_id", k=5)


CHUNK_ORACLE = f"""
WITH t AS (SELECT doc_id, {_DTOKS} AS toks FROM documents),
c AS (
  SELECT doc_id,
         CAST(i - 1 AS INTEGER) AS chunk_idx,
         array_to_string(toks[(i - 1) * 50 + 1 : (i - 1) * 50 + 50], ' ') AS chunk_text
  FROM t, unnest(generate_series(1, CAST(ceil(len(toks) / 50.0) AS BIGINT))) AS u(i)
)
SELECT doc_id, chunk_idx, chunk_text,
       CAST(len(string_split_regex(chunk_text, '\\s+')) AS BIGINT) AS n_chunk_tokens
FROM c
"""


@register("text_chunk_documents", oracle=CHUNK_ORACLE, tags=("llm", "text", "explode"))
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 50-token chunking — the packing step ahead of tokenization."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return T.chunk_documents(docs, "text", "doc_id", chunk_tokens=50)


QUANTILE_ORACLE = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE n_chars > (SELECT quantile_cont(n_chars, 0.75) FROM documents)
"""


@register("text_quantile_filter", oracle=QUANTILE_ORACLE, tags=("llm", "text", "scalar-subquery"))
def text_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs above the corpus p75 length — distribution-relative quality gate."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return T.quantile_filter(docs, "n_chars", 0.75)


REDACT_ORACLE = r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(text, '\b[a-z]*[0-9][a-z0-9]*\b', '<NUM>', 'g'),
         '\b[a-z]{11,}\b', '<LONG>', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '\b[a-z]*[0-9][a-z0-9]*\b'))
            + len(regexp_extract_all(text, '\b[a-z]{11,}\b')) AS BIGINT)
         AS n_redactions
FROM documents
"""


@register("text_redact_tokens", oracle=REDACT_ORACLE, tags=("llm", "text", "regex"))
def text_redact_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing: digit-bearing tokens -> <NUM>, overlong -> <LONG>."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return T.redact_tokens(docs).drop("text")


@register("sample_stratified_by_lang", oracle=None, tags=("llm", "sample"))
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded per-stratum Bernoulli sampling (lang-balanced downsampling —
    the data-mixing step of corpus curation). Engine-specific RNG ->
    rows-only; per-stratum bounds asserted in tests."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    fractions = {"en": 0.5, "es": 0.25}
    return docs.sampleBy("lang", fractions, seed=42)
