"""Spark-vs-DuckDB comparison harness, mirroring the driver's correctness
gate: run the Spark query and the oracle SQL on the same parquet tables,
sort columns by name and rows by value, compare exactly."""

from __future__ import annotations

import duckdb
import pandas as pd

from ..operators.common import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).fetchdf()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )
    return out


def compare(spark_df, oracle_sql: str, sf_dir: str):
    """Returns (ok, detail) with row-count / column / value comparison."""
    got = canonicalize(spark_df.toPandas())
    exp = canonicalize(run_oracle(oracle_sql, sf_dir))
    if list(got.columns) != list(exp.columns):
        return False, f"columns differ: {list(got.columns)} vs {list(exp.columns)}"
    if len(got) != len(exp):
        return False, f"row count differs: {len(got)} vs {len(exp)}"
    for c in got.columns:
        a, b = got[c], exp[c]
        # Strict dtype-kind parity mirrors the driver's value hash: int64
        # 50662700 and float64 50662700.0 hash differently there (DuckDB
        # sum -> HUGEINT -> float64 was the round-1 failure mode), so an
        # int-vs-float pairing must fail here too.
        a_num = pd.api.types.is_numeric_dtype(a)
        b_num = pd.api.types.is_numeric_dtype(b)
        if a_num and b_num and (
            pd.api.types.is_float_dtype(a) != pd.api.types.is_float_dtype(b)
        ):
            return (
                False,
                f"dtype kind mismatch in column {c}: {a.dtype} vs {b.dtype} "
                "(driver hash distinguishes int from float)",
            )
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            eq = (
                a.astype(float).fillna(-1e308).values
                == b.astype(float).fillna(-1e308).values
            ).all()
        else:
            try:
                eq = (a.values == b.values).all()
            except Exception:
                eq = a.astype(str).equals(b.astype(str))
        if not eq:
            mism = (a.astype(str) != b.astype(str)).idxmax()
            return (
                False,
                f"value mismatch in column {c} (first at row {mism}: "
                f"{a[mism]!r} vs {b[mism]!r})",
            )
    return True, f"{len(got)} rows equal"
