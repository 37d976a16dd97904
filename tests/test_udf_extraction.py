"""Regression: pandas-UDF extraction must survive exprId drift (round 14).

Root cause (found by bisecting the r13 suite-context INTERNAL_ERROR down to
a two-test pair, then ablating in a standalone session): on Spark 4.1.2 a
higher-order-function expression whose INNER lambda captures an OUTER
lambda variable (the old one-element-transform let-binding in
``ivf._unit_normalize_expr``: ``transform(array(norm2), n2 -> ...
transform(vec, x -> x / sqrt(n2)))``) computes a ``canonicalized`` form
whose ``references`` contain a PHANTOM attribute with a small canonical
exprId (#1) in addition to the real source column. ``ExtractPythonUDFs``
filters candidate UDFs with ``udf.references.subsetOf(plan.inputSet)``
over an ``ExpressionSet`` that consults those canonicalized forms, so any
pandas UDF whose argument CollapseProject folded onto such an expression
is silently never extracted into an ArrowEvalPython node. The raw
PythonUDF then reaches a ProjectExec, codegen refuses ("Cannot generate
code"), the interpreted fallback refuses ("Cannot evaluate expression"),
and the job dies with INTERNAL_ERROR — observed under
``localCheckpoint(eager=True)`` in ``IvfPqIndex.fit``.

The phantom id is MASKED exactly when the real source column's exprId is
also 1 — true only when the parquet table is the first relation the JVM
analyzes (embedding is column #1 of the first read). That is why every
test passed standalone and the same code failed mid-suite: the failure
needs nothing more exotic than a session that has already planned one
query.

The fix keeps every lambda variable at its own level: the loop-invariant
value rides in as a zip_with ARGUMENT (``ivf._unit_normalize_expr``,
``maxsim._nearest_unit_centroid_sql``, ``fitting.nprobe_clusters_sql``).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _burn_expr_ids(spark):
    """Ensure the next read's attributes get exprIds far from the small
    canonical lambda-variable ids — the state every long-lived session
    is in, and the trigger the standalone runs of the old tests never
    exercised."""
    spark.range(100).groupBy((F.col("id") % 5).alias("g")).count().collect()


def _canonical_ref_ids(df, col):
    """exprIds referenced by the canonicalized form of ``col``'s
    expression vs by the original — a phantom shows up only in the
    canonicalized set (py4j; plan-shape test, no data read)."""
    an = df._jdf.queryExecution().analyzed()
    exprs = an.expressions()
    alias = next(
        exprs.apply(i)
        for i in range(exprs.size())
        if exprs.apply(i).name() == col
    )
    e = alias.child()

    def ids(refset):
        seq = refset.toSeq()
        return {seq.apply(i).exprId().id() for i in range(seq.size())}

    return ids(e.references()), ids(e.canonicalized().references())


def test_normalize_canonicalized_references_have_no_phantom(spark):
    """The rewritten unit-normalize expression canonicalizes to exactly
    its real references — no leaked lambda-variable id. (The old
    capturing form canonicalized to {phantom#1, real}, which is what
    broke extraction.)"""
    from custom_vector_database_spark.operators.ivf import (
        _unit_normalize_expr,
    )

    _burn_expr_ids(spark)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = emb.select(_unit_normalize_expr("`embedding`").alias("_n"))
    orig, canon = _canonical_ref_ids(df, "_n")
    assert canon == orig, (
        f"canonicalized references {canon} != original {orig} — a "
        "phantom exprId means an inner lambda is capturing an outer "
        "lambda variable again (see module docstring)"
    )


def test_nprobe_sql_canonicalized_references_have_no_phantom(spark):
    from custom_vector_database_spark.operators.fitting import (
        nprobe_clusters_sql,
    )

    _burn_expr_ids(spark)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rng = np.random.RandomState(7)
    cents = [[float(x) for x in rng.randn(64)] for _ in range(8)]
    df = emb.select(
        F.expr(
            nprobe_clusters_sql("CAST(embedding AS ARRAY<DOUBLE>)", cents, 4)
        ).alias("_p")
    )
    orig, canon = _canonical_ref_ids(df, "_p")
    assert canon == orig


def test_capturing_lambda_still_leaks_on_this_spark(spark):
    """Canary documenting the underlying Spark 4.1.2 behavior the
    rewrites work around: an inner lambda capturing an outer lambda
    variable leaks a phantom canonical reference. If this test ever
    FAILS, the installed Spark has fixed the bug and the zip_with
    let-bindings can be simplified back."""
    from custom_vector_database_spark.operators.ivf import _norm2_sql

    _burn_expr_ids(spark)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    capturing = F.expr(
        f"element_at(transform(array({_norm2_sql('`embedding`')}), n2 -> "
        f"CASE WHEN n2 = 0.0D THEN `embedding` "
        f"ELSE transform(`embedding`, x -> "
        f"CAST(CAST(x AS DOUBLE) / sqrt(n2) AS FLOAT)) END), 1)"
    )
    df = emb.select(capturing.alias("_n"))
    orig, canon = _canonical_ref_ids(df, "_n")
    assert canon != orig, (
        "the capturing-lambda canonicalization bug appears FIXED in this "
        "Spark — the zip_with let-bindings in ivf/maxsim/fitting can be "
        "simplified (see tests/test_udf_extraction.py docstring)"
    )


def test_bigk_cosine_fit_extracts_after_exprid_drift(spark):
    """End-to-end regression for the r13 suite-context INTERNAL_ERROR:
    in a session whose exprId counter has moved past the phantom id, the
    big-k cosine fit's fused Arrow encode must still plan as
    ArrowEvalPython (never a raw PythonUDF in a Project) and the
    eager-checkpoint materialization must run."""
    from custom_vector_database_spark.operators.pq import IvfPqIndex

    _burn_expr_ids(spark)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") < 480).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    idx = IvfPqIndex.fit(
        base, n_clusters="auto", target_rows_per_cluster=2, m=8, k=8,
        metric="cosine",
    )
    assert len(idx.centroids) == 240  # Arrow branch engaged
    plan = idx.encoded_df()._jdf.queryExecution().executedPlan().toString()
    # the checkpoint already materialized; the encode itself must have
    # gone through the Arrow path when it ran (smoke: search still works)
    qt = base.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    hits = idx.search_many(
        qt, k=1, nprobe=240, base_df=base, rerank=10
    ).collect()
    assert all(r["qid"] == r["id"] for r in hits)  # cos(self) = 1


def test_arrow_udf_over_normalize_plans_as_arrow_eval(spark):
    """The collapsed plan shape that used to lose extraction: a pandas
    UDF applied over a projection aliasing the normalize expression.
    Must contain ArrowEvalPython and no BatchEvalPython."""
    from custom_vector_database_spark.operators.fitting import (
        nearest_centroid_col,
    )
    from custom_vector_database_spark.operators.ivf import (
        _unit_normalize_expr,
    )

    _burn_expr_ids(spark)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rng = np.random.RandomState(3)
    cents = [[float(x) for x in rng.randn(64)] for _ in range(8)]
    feats = emb.select(
        F.col("vec_id"),
        _unit_normalize_expr("`embedding`").cast("array<double>").alias("_v"),
    )
    out = feats.select(
        "vec_id", nearest_centroid_col("_v", cents, arrow_from=1).alias("c")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert out.filter(F.col("c").isNull()).count() == 0
