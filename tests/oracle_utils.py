"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side-by-side, then
compares row count, column names, and order-insensitive values —
exactly the properties the driver hashes (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from martian_moments_spark.catalog import TABLES, table_path


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.isdir(p):  # Spark-written dataset (e.g. .scale_data/sf1)
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    if set(spdf.columns) != set(oracle_pdf.columns):
        problems.append(f"columns differ: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}")
        return problems
    if len(spdf) != len(oracle_pdf):
        problems.append(f"row count differs: spark={len(spdf)} oracle={len(oracle_pdf)}")
        return problems
    a, b = _canon(spdf), _canon(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            bad = 0
            for x, y in zip(av, bv):
                if (isinstance(x, float) and math.isnan(x)) and (isinstance(y, float) and math.isnan(y)):
                    continue
                if x != y:
                    bad += 1
            if bad:
                problems.append(f"column {c!r}: {bad}/{len(av)} float values differ exactly")
        else:
            neq = (av != bv) & ~(av.isna() & bv.isna())
            if neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"column {c!r}: {int(neq.sum())}/{len(av)} values differ "
                    f"(first at sorted row {i}: spark={av[i]!r} oracle={bv[i]!r})"
                )
    return problems
