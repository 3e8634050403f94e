"""PySpark-native analytics engine with the capabilities of the reference
``AmericoGarciaG/DataIngestion_PT_MS`` (see SURVEY.md), rebuilt Spark-first.

The reference is a single-process ingest microservice (fetch OHLCV bars ->
pandas normalize -> keyed upsert -> summary event -> status serving). This
package re-expresses those semantics — plus the full relational / windowed /
streaming / LLM-data-pipeline operator surface of SURVEY.md §2.B — as
declarative DataFrame / SQL plans that Catalyst optimizes, designed for a
1000-executor cluster at ~100 TB even though tests run on local mode.

Layout:
- ``session``    SparkSession factory (AQE, UTC, Arrow)
- ``catalog``    test-table loaders (TESTDATA.md parquet)
- ``operators``  reusable operator implementations (as-of join, OHLC re-agg,
                 sessionize, dedup family, similarity search, text analysis,
                 multimodal plumbing)
- ``functions``  column-expression helpers (vector math, tokenization)
- ``sources``    batch/streaming readers and sinks (incl. idempotent upsert)
- ``plans``      plan-inspection helpers (pushdown/broadcast assertions)
- ``streaming``  Structured Streaming jobs + the reference-shaped ingest
- ``queries``    named query registry backing ``__spark_entry__``
"""

__version__ = "0.1.0"
