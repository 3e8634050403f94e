"""Local differential checker: run every registered query on Spark AND its
DuckDB oracle, compare row count + column names/dtypes + order-insensitive
values. Mimics the driver's CORRECTNESS gate so regressions surface before a
round ends.

Usage:
    python tools/check_oracle.py [--sf-dir /root/testdata/sf0.001] [name ...]
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from dataingestion_pt_ms_spark.catalog import TABLES, table_path
from dataingestion_pt_ms_spark.queries import registry
from dataingestion_pt_ms_spark.session import get_spark


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = table_path(sf_dir, t)
        # Spark writes a DIRECTORY named <table>.parquet; DuckDB needs
        # the file glob (lets the checker run against .benchdata/sf1x)
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    if len(df.columns):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    a, b = canon(spark_pdf), canon(duck_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
    dt_a, dt_b = list(map(str, a.dtypes)), list(map(str, b.dtypes))
    if dt_a != dt_b:
        problems.append(f"dtypes differ: spark={dt_a} duck={dt_b}")
    if not problems:
        if not a.equals(b):
            for c in a.columns:
                col_a, col_b = a[c], b[c]
                eq = (col_a == col_b) | (col_a.isna() & col_b.isna())
                if not eq.all():
                    i = int((~eq).idxmax())
                    problems.append(
                        f"values differ in {c!r}: first at row {i}: "
                        f"spark={col_a.iloc[i]!r} duck={col_b.iloc[i]!r} "
                        f"({int((~eq).sum())} rows differ)"
                    )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    specs = registry()
    names = args.names or sorted(specs)
    spark = get_spark("oracle-check")
    con = duck_connection(args.sf_dir)

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: spark query raised")
            traceback.print_exc()
            n_fail += 1
            continue
        if spec.oracle is None:
            n_rows_only += 1
            print(
                f"rows-only {name}: {len(spark_pdf)} rows, "
                f"cols={sorted(spark_pdf.columns)} ({time.time()-t0:.1f}s)"
            )
            continue
        try:
            duck_pdf = con.execute(spec.oracle).fetchdf()
        except Exception:
            print(f"FAIL {name}: duckdb oracle raised")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({len(spark_pdf)} spark rows):")
            for p in problems:
                print(f"   - {p}")
        else:
            n_pass += 1
            print(f"ok   {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{n_pass} ok, {n_fail} FAIL, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
