"""Differential gate: every registered query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01 — SURVEY.md §5)."""

from __future__ import annotations

import duckdb
import pytest

from dataingestion_pt_ms_spark.catalog import TABLES, table_path
from dataingestion_pt_ms_spark.queries import registry

from conftest import SF_DIR

sys_path_marker = None  # conftest inserts repo root

_SPECS = registry()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    yield con
    con.close()


def _canon(pdf):
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_query_matches_oracle(name, spark, duck):
    spec = _SPECS[name]
    got = _canon(spec.fn(spark, SF_DIR).toPandas())
    if spec.oracle is None:
        assert len(got.columns) > 0  # rows-only: runs, stable schema
        return
    want = _canon(duck.execute(spec.oracle).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    assert got.equals(want), f"value mismatch for {name}"
