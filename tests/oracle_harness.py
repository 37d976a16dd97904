"""Local replica of the driver's DuckDB-oracle correctness check.

For each (name, spark_query, oracle_sql): run both at a given sf dir,
sort columns by name, sort rows, and compare values — exact for
ints/strings, tight tolerance for floats. Catching a mismatch here means
catching it before CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, duck_df: pd.DataFrame, name: str, float_tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errs: list[str] = []
    sp = _normalize(spark_df.toPandas())
    du = _normalize(duck_df)
    if list(sp.columns) != list(du.columns):
        errs.append(f"{name}: columns differ spark={list(sp.columns)} duck={list(du.columns)}")
        return errs
    if len(sp) != len(du):
        errs.append(f"{name}: row count spark={len(sp)} duck={len(du)}")
        return errs
    # Dtype-aware check, mirroring the driver's value-hash: an int64 column on
    # the Spark side vs a float64 on the DuckDB side (e.g. an un-cast SUM that
    # DuckDB widens to HUGEINT) hash-mismatches even when every value compares
    # equal numerically. Compare numpy dtype *kinds* (i/u vs f vs O vs b vs M)
    # so that exactly this class of bug fails locally before the driver sees it.
    _KIND = {"u": "i"}  # unsigned ints hash like ints
    for col in sp.columns:
        ks = _KIND.get(sp[col].dtype.kind, sp[col].dtype.kind)
        kd = _KIND.get(du[col].dtype.kind, du[col].dtype.kind)
        if ks != kd:
            errs.append(
                f"{name}.{col}: dtype kind differs spark={sp[col].dtype} duck={du[col].dtype}"
            )
    if errs:
        return errs
    for col in sp.columns:
        a, b = sp[col], du[col]
        for i, (x, y) in enumerate(zip(a, b)):
            if x is None and y is None:
                continue
            if isinstance(x, float) or isinstance(y, float):
                fx, fy = float(x), float(y)
                if math.isnan(fx) and math.isnan(fy):
                    continue
                if not math.isclose(fx, fy, rel_tol=float_tol, abs_tol=float_tol):
                    errs.append(f"{name}.{col}[{i}]: {x!r} != {y!r}")
                    break
                # The driver's value-hash works on the float's repr/bits, so
                # -0.0 vs +0.0 hash-mismatches even though IEEE (and isclose)
                # call them equal. This shipped knn_cosine red in r5: DuckDB's
                # round() preserved the sign of a -2.2e-16 self-match distance
                # while Spark's BigDecimal round returned +0.0. Compare the
                # sign explicitly for zeros so this class fails locally.
                if (
                    fx == 0.0
                    and fy == 0.0
                    and math.copysign(1.0, fx) != math.copysign(1.0, fy)
                ):
                    errs.append(
                        f"{name}.{col}[{i}]: signed-zero mismatch {x!r} != {y!r}"
                    )
                    break
            elif str(x) != str(y):
                errs.append(f"{name}.{col}[{i}]: {x!r} != {y!r}")
                break
    return errs


def run_pair(spark, con, query_fn, sql: str, sf_dir: str, name: str) -> list[str]:
    spark_df = query_fn(spark, sf_dir)
    duck_df = con.sql(sql).df()
    return compare(spark_df, duck_df, name)
