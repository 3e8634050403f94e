"""Readers (SURVEY.md §2.B scans): schema-enforced batch reads + streaming
file/rate sources.

The reference *defensively infers* its input schema (renames/projects only
columns that exist, aborts when the timestamp is missing —
``app/alpaca_service.py:139-151``). Spark-first, that becomes: always read
with an explicit ``StructType`` (R8's schema guard moves to read time) and
never ``inferSchema`` in production paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", header).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    # PERMISSIVE + corrupt-record column = the reference's per-row error
    # channel (R24) expressed declaratively.
    full = schema.add("_corrupt_record", T.StringType(), True)
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC batch scan — the other columnar format Spark reads natively with
    predicate pushdown + column pruning (same scan-level guarantees the
    plan tests assert for parquet)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Raw line-per-row text scan (``value: string``) — the ingest shape
    for line-oriented corpora feeding operators/text.py:line_dedup."""
    return spark.read.text(path)


def stream_from_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming file source — the engine's stand-in for the reference's
    scheduled remote fetch (R2/R23): new files in ``path`` are the arriving
    batches; ``availableNow`` triggers reproduce "catch up then stop"."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def stream_rate(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic rate source (timestamp, value) for streaming smoke tests."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: union the schemas of every file under
    ``path`` (``mergeSchema``), so a table whose writers added columns
    over time reads as one relation — old files surface the new columns
    as NULL. The per-file footer merge costs one extra metadata pass;
    production tables should pin the canonical schema once evolution
    settles (read with an explicit StructType again)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """``binaryFile`` scan: one row per file with (path, modificationTime,
    length, content: binary) — the ingest shape for multimodal corpora
    (operators/multimodal.py consumes the ``content`` column). Listing is
    distributed and ``pathGlobFilter`` prunes at the driver's file index,
    so a 10^8-object image bucket scans without a driver-side listing loop.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def schema_drift(spark: SparkSession, old_path: str, new_path: str) -> DataFrame:
    """Schema-drift audit between two parquet snapshots: one row per
    changed column — ``added`` / ``removed`` / ``type_changed`` (with both
    type strings) — the contract check a pipeline owner runs before
    pointing 1000 executors at a refreshed upstream drop (the data-level
    sibling is queries.warehouse.warehouse_snapshot_diff). Footer-only:
    two schema reads, zero data scan, so it costs the same at 100 TB as
    at 100 MB; the comparison itself is a driver-side dict walk over
    column metadata (bounded by column count, never rows) emitted as a
    DataFrame so downstream alerting composes."""
    old_fields = {f.name: f.dataType.simpleString() for f in spark.read.parquet(old_path).schema.fields}
    new_fields = {f.name: f.dataType.simpleString() for f in spark.read.parquet(new_path).schema.fields}
    rows = []
    for name in sorted(old_fields.keys() - new_fields.keys()):
        rows.append((name, "removed", old_fields[name], None))
    for name in sorted(new_fields.keys() - old_fields.keys()):
        rows.append((name, "added", None, new_fields[name]))
    for name in sorted(old_fields.keys() & new_fields.keys()):
        if old_fields[name] != new_fields[name]:
            rows.append((name, "type_changed", old_fields[name], new_fields[name]))
    schema = T.StructType(
        [
            T.StructField("column", T.StringType(), False),
            T.StructField("change", T.StringType(), False),
            T.StructField("old_type", T.StringType(), True),
            T.StructField("new_type", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema)
