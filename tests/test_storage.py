"""Engine tests for the parquet footer-audit operators (operators/storage.py).

No oracled registry row exists for these (the shipped testdata tables are
single-row-group, which would make a pruning audit vacuous), so the tests
build multi-row-group fixtures and differentially check the distributed
footer reader against DuckDB's ``parquet_metadata`` plus a brute-force
pruning computation over the raw rows.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dataingestion_pt_ms_spark.operators.storage import (
    pruning_effectiveness,
    rowgroup_stats,
    table_paths,
)


@pytest.fixture(scope="module")
def multi_rg_file(tmp_path_factory):
    """A parquet file with 10 row groups of 100 rows, sorted on `k` so
    min/max envelopes are selective (the layout a z-order/sort write
    produces)."""
    path = str(tmp_path_factory.mktemp("storage") / "sorted.parquet")
    k = np.arange(1000, dtype="int64")
    v = (k * 37 % 1000).astype("float64")
    s = np.array([f"s{i:04d}" for i in k])
    tbl = pa.table({"k": k, "v": v, "s": s})
    pq.write_table(tbl, path, row_group_size=100)
    return path


def test_rowgroup_stats_matches_duckdb_parquet_metadata(spark, multi_rg_file):
    got = (
        rowgroup_stats(table_paths(spark, multi_rg_file))
        .orderBy("row_group", "column")
        .toPandas()
    )
    want = (
        duckdb.connect()
        .execute(
            f"""
            SELECT row_group_id, path_in_schema, row_group_num_rows,
                   stats_null_count, stats_min_value, stats_max_value
            FROM parquet_metadata('{multi_rg_file}')
            ORDER BY row_group_id, path_in_schema
            """
        )
        .fetchdf()
    )
    assert len(got) == len(want) == 10 * 3
    assert got["row_group"].tolist() == want["row_group_id"].tolist()
    assert got["column"].tolist() == want["path_in_schema"].tolist()
    assert got["num_values"].tolist() == want["row_group_num_rows"].tolist()
    assert got["null_count"].tolist() == want["stats_null_count"].tolist()
    # numeric stats compare as floats (duckdb stringifies "5.0" vs "5.0");
    # string stats compare verbatim
    for i in range(len(got)):
        g_min, g_max = got["stat_min"][i], got["stat_max"][i]
        w_min, w_max = want["stats_min_value"][i], want["stats_max_value"][i]
        if got["column"][i] == "s":
            assert (g_min, g_max) == (w_min, w_max)
        else:
            assert float(g_min) == float(w_min)
            assert float(g_max) == float(w_max)


def test_pruning_effectiveness_matches_bruteforce(spark, multi_rg_file):
    stats = rowgroup_stats(table_paths(spark, multi_rg_file))
    # predicate: 250 <= k <= 340 — on the k-sorted layout exactly the row
    # groups [200,300) and [300,400) overlap; 8 of 10 prune
    rep = pruning_effectiveness(stats, "k", lo=250, hi=340).collect()
    assert len(rep) == 1
    row = rep[0]
    assert row.n_row_groups == 10
    assert row.n_prunable == 8
    assert row.prunable_frac == 0.8
    assert row.rows_skipped == 800
    # brute force: a row group prunes iff no raw row in it satisfies the
    # predicate (min/max envelopes are exact for sorted integer data)
    con = duckdb.connect()
    brute = con.execute(
        f"""
        SELECT CAST(floor(k / 100) AS BIGINT) AS rg,
               max(CASE WHEN k BETWEEN 250 AND 340 THEN 1 ELSE 0 END) AS hit
        FROM read_parquet('{multi_rg_file}') GROUP BY rg
        """
    ).fetchdf()
    assert int((brute["hit"] == 0).sum()) == row.n_prunable


def test_pruning_unsorted_column_prunes_nothing(spark, multi_rg_file):
    # v = k*37 % 1000 cycles within every row group, so every envelope
    # spans nearly the full domain: selective predicates prune 0 groups —
    # the negative result that motivates sort/z-order layout audits
    stats = rowgroup_stats(table_paths(spark, multi_rg_file))
    rep = pruning_effectiveness(stats, "v", lo=400, hi=420).collect()
    assert rep[0].n_prunable == 0


def test_rowgroup_stats_is_distributed_over_files(spark, tmp_path):
    # two files -> stats for both appear; the mapInPandas plan carries no
    # single-partition exchange for the footer scan itself
    paths = []
    for fi in range(2):
        p = str(tmp_path / f"f{fi}.parquet")
        pq.write_table(
            pa.table({"k": np.arange(fi * 10, fi * 10 + 10, dtype="int64")}),
            p,
            row_group_size=5,
        )
        paths.append(p)
    df = spark.createDataFrame([(p,) for p in paths], ["path"]).repartition(2)
    got = rowgroup_stats(df).toPandas()
    assert sorted(got["path"].unique()) == paths
    assert len(got) == 2 * 2  # 2 files x 2 row groups x 1 column
