"""Sketch-law and graph-algorithm invariants the DuckDB differential check
cannot express: the count-min overestimate guarantee, HLL register-state
bounds, and degree-oriented triangle counting agreeing with the naive
enumeration on an adversarially skewed graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestion_pt_ms_spark.operators.graph import triangle_counts
from dataingestion_pt_ms_spark.queries import registry


def _run(spark, sf_dir, name):
    return registry()[name].fn(spark, sf_dir)


def test_count_min_never_underestimates(spark, sf_dir):
    rows = _run(spark, sf_dir, "sketch_cm_heavy_hitters").collect()
    assert rows, "heavy-hitter set empty on the fixture corpus"
    for r in rows:
        assert r.est_count >= r.exact_count, r


def test_hll_registers_bounded_and_estimate_sane(spark, sf_dir):
    rows = _run(spark, sf_dir, "agg_hll_distinct_customers").collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.v_zero < 64
        # m=64 registers => ~13% standard error; 3 sigma with margin
        assert abs(r.hll_estimate - r.n_exact) / r.n_exact < 0.5, r


def test_triangle_counts_match_naive_on_skewed_graph(spark):
    # star K1,5 (hub 0) + triangle closing two spokes + a disjoint K4:
    # exercises the celebrity-node case the orientation exists for.
    edges = [(0, i) for i in range(1, 6)] + [(1, 2)]
    k4 = [10, 11, 12, 13]
    edges += [(a, b) for a in k4 for b in k4 if a < b]
    df = spark.createDataFrame(edges, "u int, v int")
    got = {
        r.node: r.n_triangles for r in triangle_counts(df).collect()
    }
    # naive: triangle (0,1,2); K4 has C(4,3)=4 triangles, each node in 3
    assert got == {0: 1, 1: 1, 2: 1, 10: 3, 11: 3, 12: 3, 13: 3}


def test_dq_checks_detect_known_fixture_violation(spark, sf_dir):
    # the driver's synthetic lineitem reuses (l_orderkey, l_linenumber) —
    # a REAL constraint violation the suite must flag; everything else
    # about the fixture is clean and must pass.
    rows = _run(spark, sf_dir, "warehouse_dq_checks").collect()
    assert len(rows) == 8
    by_name = {r.check_name: r for r in rows}
    assert by_name["lineitem.key_unique"].status == "fail"
    assert by_name["lineitem.key_unique"].violations > 0
    for name, r in by_name.items():
        if name != "lineitem.key_unique":
            assert r.status == "pass", r


def test_snapshot_diff_classes_consistent(spark, sf_dir):
    rows = _run(spark, sf_dir, "warehouse_snapshot_diff").collect()
    kinds = {r.change_type for r in rows}
    assert kinds == {"added", "removed", "changed"}
    for r in rows:
        if r.change_type == "added":
            assert r.old_price is None and r.new_price is not None
        elif r.change_type == "removed":
            assert r.new_price is None and r.old_price is not None
        else:
            assert r.old_price != r.new_price


def test_kmv_partial_merge_equals_single_pass(spark, sf_dir):
    """Bottom-k sets are mergeable: taking bottom-k per half-corpus, then
    bottom-k of the union of the two partials, yields EXACTLY the single-
    pass bottom-k — so the (k-1)/v_k estimate is identical. This is the
    sketch-once/merge-later contract that lets 1000 executors each ship
    k values instead of their raw key sets."""
    from pyspark.sql import Window as W

    from dataingestion_pt_ms_spark.catalog import load_table

    K = 32
    HEX13 = float(1 << 52)
    orders = load_table(spark, sf_dir, "orders")
    hashed = (
        orders.select(F.col("o_custkey").alias("k"),
                      (F.col("o_orderkey") % 2).alias("half"))
        .distinct()
        .select(
            "k", "half",
            (F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 13), 16, 10)
             .cast("long") / F.lit(HEX13)).alias("v"),
        )
    )
    # single pass over distinct keys
    single = {
        (r.k, r.v)
        for r in hashed.select("k", "v").distinct()
        .withColumn("rn", F.row_number().over(W.orderBy("v", "k")))
        .where(F.col("rn") <= K).select("k", "v").collect()
    }
    # per-half partial bottom-k, then merge and re-take bottom-k
    wh = W.partitionBy("half").orderBy("v", "k")
    partials = (
        hashed.withColumn("rn", F.row_number().over(wh))
        .where(F.col("rn") <= K)
        .select("k", "v")
        .distinct()  # a key can appear in both halves
    )
    merged = {
        (r.k, r.v)
        for r in partials
        .withColumn("rn", F.row_number().over(W.orderBy("v", "k")))
        .where(F.col("rn") <= K).select("k", "v").collect()
    }
    assert merged == single and len(single) == K


def test_ddsketch_quantiles_within_relative_error_bound(spark, sf_dir):
    """DDSketch's defining guarantee (Masson et al. VLDB'19): every
    reported quantile is within relative error alpha of the true
    rank-matched value. The query emits its own audit columns; the law
    check is that they honor the bound (alpha = 1%, tiny slack for the
    two rounds applied before the ratio)."""
    rows = registry()["sketch_ddsketch_quantiles"].fn(spark, sf_dir).collect()
    assert {r["q"] for r in rows} == {0.5, 0.9, 0.99}
    for r in rows:
        assert abs(r["rel_err"]) <= 0.0101, r


def test_split_finder_gain_nonnegative_and_bins_partition(spark, sf_dir):
    """Gini split gain is >= 0 by construction, and the best split must
    leave both children non-empty (n_left + n_right = N per feature)."""
    rows = registry()["lineitem_histogram_split_finder"].fn(spark, sf_dir).collect()
    assert {r["feature"] for r in rows} == {"qty", "disc", "price"}
    n_tot = {r["feature"]: r["n_left"] + r["n_right"] for r in rows}
    assert len(set(n_tot.values())) == 1  # same N for every feature
    for r in rows:
        assert r["gain"] >= 0 and r["n_left"] > 0 and r["n_right"] > 0, r
