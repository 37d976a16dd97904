"""Unit tests for the driver-side quantizer fit + codegen'd encode
helpers (operators/fitting.py) — the shared machinery under IVF/PQ/IVF-PQ.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from custom_vector_database_spark.operators.fitting import (
    collect_sample_matrix,
    kmeans_fit_np,
    nearest_centroid_expr,
    nearest_centroid_sql,
    squared_distances_sql,
)


def test_kmeans_deterministic_for_seed():
    rng = np.random.RandomState(0)
    x = rng.rand(500, 8)
    a = kmeans_fit_np(x, 16, seed=42)
    b = kmeans_fit_np(x, 16, seed=42)
    assert a == b
    c = kmeans_fit_np(x, 16, seed=43)
    assert a != c  # different seed, different init


def test_kmeans_k_larger_than_sample():
    x = np.asarray([[0.0, 0.0], [10.0, 10.0], [20.0, 0.0]])
    cent = kmeans_fit_np(x, k=8, seed=1)
    assert len(cent) == 8  # padded, never fewer than k
    # every sample point is (near-)exactly represented by some centroid
    c = np.asarray(cent)
    for p in x:
        assert np.min(((c - p) ** 2).sum(axis=1)) < 1e-18


def test_kmeans_separated_clusters_recovered():
    rng = np.random.RandomState(7)
    centers = np.asarray([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0]])
    x = np.vstack([centers[i % 3] + rng.randn(2) * 0.1 for i in range(300)])
    cent = np.asarray(kmeans_fit_np(x, 3, seed=5, max_iter=20))
    # each true center has a fitted centroid within noise distance
    for tc in centers:
        assert np.min(((cent - tc) ** 2).sum(axis=1)) < 1.0


def test_nearest_centroid_expr_matches_numpy(spark):
    rng = np.random.RandomState(3)
    x = rng.rand(200, 4)
    cent = kmeans_fit_np(x, 7, seed=9)
    c = np.asarray(cent)
    d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    expected = d2.argmin(axis=1).tolist()

    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "i LONG, v ARRAY<DOUBLE>",
    )
    got = {
        r["i"]: r["code"]
        for r in df.select("i", nearest_centroid_expr("v", cent).alias("code")).collect()
    }
    assert [got[i] for i in range(len(x))] == expected


def test_sql_double_literals_are_float64_exact(spark):
    # 17-sig-digit rendering must round-trip awkward doubles bit-exactly
    vals = [1 / 3, 2**-30, 1e300, -0.1, 123456789.123456789]
    cent = [vals]
    sql = squared_distances_sql("v", cent)
    row = spark.createDataFrame([([float(v) for v in vals],)], "v ARRAY<DOUBLE>")
    d = row.selectExpr(f"element_at({sql}, 1) AS d").first()["d"]
    assert d == 0.0  # identical literal ⇒ exactly zero distance


def test_non_finite_sample_rejected(spark):
    df = spark.createDataFrame(
        [(1, [1.0, float("nan")]), (2, [0.0, 1.0])], "id LONG, v ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="non-finite"):
        collect_sample_matrix(df, "v", 2, 100, seed=1)


def test_non_finite_centroid_still_renders_parseable_sql(spark):
    # belt-and-braces: even if a non-finite centroid slipped through, the
    # SQL must parse (CAST literal), not die on a 'nanD' column reference
    sql = nearest_centroid_sql("v", [[float("nan")], [0.0]])
    row = spark.createDataFrame([([1.0],)], "v ARRAY<DOUBLE>")
    assert row.selectExpr(f"{sql} AS c").first()["c"] == 1  # NaN never wins


def test_empty_table_raises(spark):
    df = spark.createDataFrame([], "id LONG, v ARRAY<DOUBLE>")
    with pytest.raises(ValueError, match="empty"):
        collect_sample_matrix(df, "v", 0, 100, seed=1)
