"""PCA dimensionality reduction for embedding columns.

Same split as the ANN quantizers (operators/fitting.py): the FIT is
sample-bounded and runs driver-side in vectorized numpy (an SVD over
≤ fit_sample × dim float64 — small math, zero Spark jobs), while the
full-table PROJECTION is one generated-SQL Catalyst expression (center →
k dot-product folds) that runs inside whole-stage codegen. No MLlib model
UDF, no job storm, no Python in the hot path.

Why it's here: shrinking stored embeddings (64→8/16 dims) is the cheapest
lever on vector-search I/O and index size in a training-data pipeline —
and the residual/orthonormality certificates make the transform
verifiable (the embedding_pca_project query registers them as a
guarantee-oracle boolean).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from custom_vector_database_spark.operators.fitting import collect_sample_matrix

__all__ = ["pca_fit", "project_expr", "PCAModel"]


class PCAModel:
    """Plain-data PCA model: mean (dim,), components (k, dim) with
    orthonormal rows, and the sample explained-variance ratio. Engine
    independent — everything is embedded as SQL literals at projection
    time."""

    def __init__(self, mean: list[float], components: list[list[float]], evr: float):
        self.mean = mean
        self.components = components
        self.evr = evr

    @property
    def k(self) -> int:
        return len(self.components)

    def orthonormality_error(self) -> float:
        """max |VᵀV - I| over the component Gram matrix — the fit
        certificate (≈1e-12 for a healthy SVD)."""
        v = np.asarray(self.components)
        gram = v @ v.T
        return float(np.abs(gram - np.eye(len(v))).max())


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    fit_sample: int = 100_000,
    seed: int = 42,
) -> PCAModel:
    """Fit top-``k`` principal components on a bounded sample (one
    distributed sampling pass; the SVD itself is driver-side numpy —
    O(sample·dim²), independent of table size)."""
    n = df.count()
    x = collect_sample_matrix(df, vec_col, n, fit_sample, seed)
    if k > x.shape[1]:
        raise ValueError(f"k={k} exceeds dim={x.shape[1]}")
    mu = x.mean(axis=0)
    _, s, vt = np.linalg.svd(x - mu, full_matrices=False)
    var = s * s
    evr = float(var[:k].sum() / var.sum()) if var.sum() > 0 else 1.0
    return PCAModel(
        mean=[float(v) for v in mu],
        components=[[float(v) for v in row] for row in vt[:k]],
        evr=evr,
    )


def _arr(vals: list[float]) -> str:
    return "array(" + ",".join(repr(float(v)) + "D" for v in vals) + ")"


def project_expr(
    model: PCAModel, vec_col: str, round_to: int | None = 6
) -> Column:
    """array<double> of the k projected coordinates, as ONE generated-SQL
    expression: center the vector once, then one zip_with/aggregate dot
    fold per component. Emitted as a single SQL string (one py4j
    round-trip — the operators/fitting.py lesson: building m×k nested
    Columns through the Python API costs hundreds of driver round-trips
    before Spark ever parses the plan)."""
    centered = (
        f"zip_with(CAST({vec_col} AS array<double>), {_arr(model.mean)}, "
        "(x, m) -> x - m)"
    )
    folds = []
    for row in model.components:
        fold = (
            f"aggregate(zip_with(_c, {_arr(row)}, (a, v) -> a * v), "
            "0D, (acc, p) -> acc + p)"
        )
        if round_to is not None:
            fold = f"round({fold}, {round_to})"
        folds.append(fold)
    # bind the centered vector ONCE via a 1-element transform (a poor
    # man's let-expression): without it each of the k folds would inline
    # and re-evaluate the centering zip_with
    sql = (
        "transform(array(" + centered + "), _c -> array(" + ",".join(folds) + "))[0]"
    )
    return F.expr(sql)


def residual_fraction(
    df: DataFrame, model: PCAModel, vec_col: str = "embedding"
) -> float:
    """1 - (projected energy / centered energy) over the FULL table — the
    distributed certificate that the sample-fit generalizes (components
    are orthonormal, so ‖proj‖² ≤ ‖centered‖² always; a fraction near the
    sample's 1-evr means the fit holds off-sample). Two scalar float
    aggregates — partial-sum order varies, which is why callers compare
    against LOOSE bounds, never exact values."""
    centered = (
        f"zip_with(CAST({vec_col} AS array<double>), {_arr(model.mean)}, "
        "(x, m) -> x - m)"
    )
    proj = project_expr(model, vec_col, round_to=None)
    e_tot = F.expr(
        f"aggregate(transform({centered}, x -> x * x), 0D, (a, v) -> a + v)"
    )
    e_proj = F.aggregate(
        F.transform(proj, lambda p: p * p), F.lit(0.0), lambda a, v: a + v
    )
    row = df.select(
        F.sum(e_tot).alias("tot"), F.sum(e_proj).alias("kept")
    ).first()
    tot, kept = float(row["tot"] or 0.0), float(row["kept"] or 0.0)
    return 1.0 - (kept / tot) if tot > 0 else 0.0
