"""Source/sink reader tests: schema'd CSV/JSON reads, PERMISSIVE corrupt
-record channel (reference R24), partitioned writes, sampling bounds."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataingestion_pt_ms_spark.catalog import load_table
from dataingestion_pt_ms_spark.sources.readers import read_csv, read_json
from dataingestion_pt_ms_spark.sources.sinks import write_partitioned_parquet

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_read_csv_with_schema(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,name,score\n1,alpha,1.5\n2,beta,2.5\n")
    df = read_csv(spark, str(p), SCHEMA)
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows == {1: ("alpha", 1.5), 2: ("beta", 2.5)}
    assert [f.dataType for f in df.schema.fields] == [
        T.LongType(), T.StringType(), T.DoubleType(),
    ]


def test_read_json_permissive_corrupt_channel(spark, tmp_path):
    p = tmp_path / "in.json"
    p.write_text(
        '{"id": 1, "name": "ok", "score": 1.0}\n'
        "{not valid json at all}\n"
        '{"id": 2, "name": "also ok", "score": 2.0}\n'
    )
    df = read_json(spark, str(p), SCHEMA).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    # R24 semantics: bad rows are quarantined, run continues
    assert good.count() == 2
    assert bad.count() == 1
    assert "not valid" in bad.first()._corrupt_record


def test_partitioned_parquet_layout(spark, tmp_path):
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")], "id long, v string, dt string"
    )
    write_partitioned_parquet(df, out, ["dt"])
    import os

    parts = {d for d in os.listdir(out) if d.startswith("dt=")}
    assert parts == {"dt=2024-01-01", "dt=2024-01-02"}
    assert spark.read.parquet(out).count() == 2


def test_sample_fraction_bounds(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    total = li.count()
    n = li.sample(fraction=0.1, seed=42).count()
    assert 0.05 * total < n < 0.15 * total
    # seeded → deterministic within the engine
    assert n == li.sample(fraction=0.1, seed=42).count()


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC is the second natively-scanned columnar format: write, re-read
    with explicit schema, and confirm the filter reaches the ORC scan."""
    from dataingestion_pt_ms_spark.sources.readers import read_orc

    out = str(tmp_path / "orc")
    spark.createDataFrame(
        [(i, f"v{i}", i * 1.5) for i in range(100)], "id long, v string, x double"
    ).write.orc(out)
    df = read_orc(spark, out)
    assert df.filter(F.col("id") >= 90).count() == 10
    plan = df.filter(F.col("id") >= 90)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThanOrEqual(id,90" in plan


def test_text_lines_reader(spark, tmp_path):
    from dataingestion_pt_ms_spark.sources.readers import read_text_lines

    p = tmp_path / "corpus.txt"
    p.write_text("alpha beta\nboilerplate line\ngamma delta\nboilerplate line\n")
    df = read_text_lines(spark, str(p))
    assert df.columns == ["value"]
    assert df.count() == 4
    # feeds line-level dedup directly
    from dataingestion_pt_ms_spark.operators.text import line_dedup

    docs = df.groupBy(F.lit(1).alias("doc_id")).agg(
        F.concat_ws("\n", F.collect_list("value")).alias("text")
    )
    out = line_dedup(docs, "text", "doc_id", max_count=1).first()
    assert out.n_removed == 2 and "boilerplate" not in out.clean_text


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Writers added a column over time: mergeSchema reads old + new files
    as one relation, old rows NULL in the added column; a filter on the
    added column still prunes correctly."""
    from dataingestion_pt_ms_spark.sources.readers import read_parquet_evolved

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string").write.parquet(
        path
    )
    spark.createDataFrame(
        [(3, "c", 0.5)], "id long, name string, score double"
    ).write.mode("append").parquet(path)

    df = read_parquet_evolved(spark, path)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows[1] is None and rows[2] is None and rows[3] == 0.5
    assert df.filter(F.col("score").isNotNull()).count() == 1


def test_binary_file_source(spark, tmp_path):
    """binaryFile scan: one row per file, content bytes intact, glob prunes."""
    from dataingestion_pt_ms_spark.sources.readers import read_binary_files

    (tmp_path / "a.img").write_bytes(b"\x89PNGfake-a")
    (tmp_path / "b.img").write_bytes(b"\x89PNGfake-bb")
    (tmp_path / "skip.txt").write_text("not binary payload")
    df = read_binary_files(spark, str(tmp_path), glob="*.img")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.img", "b.img"}
    assert bytes(rows["a.img"].content) == b"\x89PNGfake-a"
    assert rows["b.img"].length == 11
    assert set(df.columns) == {"path", "modificationTime", "length", "content"}


def test_compact_parquet_dir(spark, tmp_path):
    """Many tiny files -> one compacted file; rows identical; clustered
    files are sorted within themselves on the sort column."""
    from dataingestion_pt_ms_spark.sources.sinks import compact_parquet_dir

    out = str(tmp_path / "frag")
    df = spark.range(0, 1000).withColumn("v", F.col("id") % 7)
    df.repartition(40).write.parquet(out)
    import glob as g

    assert len(g.glob(f"{out}/part-*.parquet")) == 40
    before = {(r.id, r.v) for r in spark.read.parquet(out).collect()}
    n = compact_parquet_dir(spark, out, target_file_bytes=1 << 30, sort_cols=["id"])
    assert n == 1
    files = g.glob(f"{out}/part-*.parquet")
    assert len(files) == 1
    after_df = spark.read.parquet(out)
    assert {(r.id, r.v) for r in after_df.collect()} == before
    ids = [r.id for r in spark.read.parquet(files[0]).collect()]
    assert ids == sorted(ids)


def test_compact_refuses_partitioned_layout(spark, tmp_path):
    """Hive-partitioned dirs must be refused, not silently flattened (the
    non-recursive-listing bug class: data in subdirs sized as 0 bytes)."""
    import pytest

    from dataingestion_pt_ms_spark.sources.sinks import compact_parquet_dir

    out = str(tmp_path / "parted")
    spark.range(0, 100).withColumn("p", F.col("id") % 3).write.partitionBy(
        "p"
    ).parquet(out)
    with pytest.raises(ValueError, match="partitioned layout"):
        compact_parquet_dir(spark, out)
    # partition data untouched by the refusal
    assert spark.read.parquet(out).count() == 100


def test_python_datasource_synth_bars(spark):
    """Custom Python DataSource (Spark 4 extension surface, the engine
    equivalent of the reference's in-process REST fetch loop,
    app/alpaca_service.py:101-132): schema declaration, partition
    planning (one split per symbol-chunk → executor-parallel reads, no
    driver fan-in), option passthrough, and determinism (md5-derived
    values reproduced by the plain-Python twin)."""
    from dataingestion_pt_ms_spark.sources.pydatasource import (
        register_synth_bars,
        synth_bar,
    )

    register_synth_bars(spark)
    df = (
        spark.read.format("synth_bars")
        .option("symbols", "AAPL,MSFT,GOOG")
        .option("bars_per_symbol", "40")
        .option("chunk", "16")
        .load()
    )
    rows = df.collect()
    assert len(rows) == 120
    # partition planning: ceil(40/16)=3 chunks × 3 symbols = 9 splits
    assert len({r.part_id for r in rows}) == 9
    # determinism + twin equality on a sample
    got = {(r.symbol, r.bar_idx): (r.open, r.close, r.volume) for r in rows}
    for sym in ("AAPL", "GOOG"):
        for i in (0, 17, 39):
            s, idx, o, c, v = synth_bar(sym, i)
            assert got[(sym, i)] == (o, c, v)
    # it's a first-class DataFrame: aggregates compose
    agg = df.groupBy("symbol").count().collect()
    assert {(r.symbol, r["count"]) for r in agg} == {
        ("AAPL", 40), ("MSFT", 40), ("GOOG", 40)
    }


def test_observe_ingest_metrics(spark):
    """df.observe(): task-side metric accumulation during the action that
    produced the result — the zero-extra-pass version of the reference's
    run counters (records_processed/saved, app/alpaca_service.py:234-262).
    A separate count()+filter pass would scan 100 TB twice; observe rides
    the existing job."""
    from pyspark.sql import Observation

    obs = Observation("ingest")
    df = spark.range(0, 1000).withColumn(
        "v", F.when(F.col("id") % 7 == 0, None).otherwise(F.col("id"))
    )
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("v").isNull().cast("long")).alias("n_nulls"),
        F.max("id").alias("max_id"),
    )
    # the action that triggers metric collection
    assert observed.where(F.col("v").isNotNull()).count() == 857
    m = obs.get
    assert m["n_rows"] == 1000
    assert m["n_nulls"] == 143
    assert m["max_id"] == 999


def test_schema_drift_audit(spark, tmp_path):
    """added / removed / type_changed columns between two parquet
    snapshots, from footers only (no data scan)."""
    from dataingestion_pt_ms_spark.sources.readers import schema_drift

    old = str(tmp_path / "v1")
    new = str(tmp_path / "v2")
    spark.range(0, 10).select(
        F.col("id"),
        F.col("id").cast("int").alias("a"),
        F.lit("x").alias("gone"),
    ).write.parquet(old)
    spark.range(0, 10).select(
        F.col("id"),
        F.col("id").cast("double").alias("a"),  # int -> double
        F.lit(1).alias("fresh"),
    ).write.parquet(new)
    got = {
        (r.column, r.change, r.old_type, r.new_type)
        for r in schema_drift(spark, old, new).collect()
    }
    assert got == {
        ("gone", "removed", "string", None),
        ("fresh", "added", None, "int"),
        ("a", "type_changed", "int", "double"),
    }


def test_custom_python_stream_source_drains_and_matches_twin(spark, tmp_path):
    """Streaming half of the custom DataSource (DataSourceStreamReader):
    the reference's interval re-poll (app/main.py:48-78) expressed as
    offset management — latestOffset walks bars_per_batch per micro-batch
    up to max_bars, partitions fan out per symbol, and the drained stream
    equals the deterministic twin exactly (same md5-derived bar space as
    the batch reader)."""
    from dataingestion_pt_ms_spark.sources.pydatasource import (
        register_synth_bars,
        synth_bar,
    )

    register_synth_bars(spark)
    stream = (
        spark.readStream.format("synth_bars")
        .option("symbols", "AAPL,MSFT")
        .option("bars_per_batch", "7")
        .option("max_bars", "25")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_bars_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    # the offset head advances one bars_per_batch quantum per micro-batch
    # (the re-poll cadence); wait until the capped space is fully drained
    import time as _time

    deadline = _time.time() + 120
    while _time.time() < deadline:
        if spark.sql("SELECT count(*) c FROM synth_bars_stream").first().c >= 50:
            break
        _time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    # multiple micro-batches actually ran (quantum 7 over 25 bars → >= 4)
    assert q.lastProgress is not None and q.lastProgress["batchId"] >= 3
    rows = spark.sql("SELECT * FROM synth_bars_stream").collect()
    # drained exactly to the cap for each symbol, no dup, no gap
    assert len(rows) == 2 * 25, len(rows)
    got = {(r.symbol, r.bar_idx): (r.open, r.close, r.volume) for r in rows}
    assert len(got) == 50
    for sym in ("AAPL", "MSFT"):
        for i in (0, 13, 24):
            s, idx, o, c, v = synth_bar(sym, i)
            assert got[(sym, i)] == (o, c, v)


def test_synth_kafka_batch_matches_twin_and_interface(spark):
    """Round 7 (VERDICT r6 #8): the wire-format source emits records in
    EXACTLY the real kafka source's schema, values equal the
    plain-Python twin byte-for-byte, the envelope parse recovers typed
    columns, and the provider dispatcher rejects unknown providers (the
    'kafka' branch is the same call path with format('kafka') — broker
    wiring is the only absent piece in this container)."""
    import pytest

    from dataingestion_pt_ms_spark.sources.kafka import (
        KAFKA_RECORDS_SCHEMA,
        kafka_records,
        parse_kafka_envelope,
        synth_kafka_record,
    )

    recs = kafka_records(
        spark, provider="synthetic", topic="t1", partitions=2, rows_per_partition=5
    )
    assert recs.schema == KAFKA_RECORDS_SCHEMA
    got = sorted(
        (r.topic, r.partition, r.offset, bytes(r.key), bytes(r.value), r.timestampType)
        for r in recs.collect()
    )
    want = sorted(
        (t, p, o, k, v, tt)
        for p in range(2)
        for o in range(5)
        for (k, v, t, _p, _o, _ts, tt) in [synth_kafka_record("t1", p, o, 5)]
    )
    assert got == want
    ev = parse_kafka_envelope(recs).collect()
    assert len(ev) == 10
    assert all(r.event_type in ("click", "view", "error", "buy") for r in ev)
    assert all(r.event_id == r.partition * 5 + r.offset for r in ev)
    with pytest.raises(ValueError, match="provider"):
        kafka_records(spark, provider="pulsar")
