"""Automatic layout sizing (round 12, r11 verdict lead item):

``fitting.auto_n_clusters`` derives the coarse-cluster count from the
corpus row count (ceil(n / target_rows_per_cluster), clamped), every
IVF-family fit accepts ``n_clusters="auto"``, and the autopilot
surfaces an occupancy-tripped executable ``resize`` action that refits
at the computed k — closing the sizing half of the accuracy/cost loop
(r11's calibrate_nprobe closed the recall half). The r11 sf100 probe
measured both the pathology (fixed 16 clusters: search 1.8 s → 7.2 s
across a decade) and the cure (10× clusters: 4.4× faster); this file
pins the rule that automates the cure.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_vector_database_spark.operators.fitting import (
    auto_n_clusters,
    resolve_n_clusters,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _vecs(emb, hi=500):
    return emb.filter(F.col("vec_id") < hi).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


# ---------------------------------------------------------------------------
# the pure sizing rule
# ---------------------------------------------------------------------------
def test_auto_n_clusters_formula_clamps_and_monotonicity():
    # ceil(n / target)
    assert auto_n_clusters(512 * 100, 512) == 100
    assert auto_n_clusters(512 * 100 + 1, 512) == 101
    # floor: tiny corpora keep a real multi-cluster layout
    assert auto_n_clusters(100, 512) == 8
    # ...but never more clusters than rows
    assert auto_n_clusters(3, 512) == 3
    # ceiling: the literal-centroid/driver-fit design bound
    assert auto_n_clusters(10**9, 512) == 4096
    assert auto_n_clusters(10**9, 512, max_clusters=160) == 160
    # MONOTONE in n_rows — the certified property (a bigger corpus can
    # never be assigned fewer clusters)
    ladder = [auto_n_clusters(n, 512) for n in
              (1, 10, 10**3, 10**4, 10**5, 10**6, 10**7, 10**8)]
    assert ladder == sorted(ladder)
    # growing the per-cluster target shrinks k (the scale-out lever once
    # the ceiling binds)
    assert auto_n_clusters(10**6, 2048) < auto_n_clusters(10**6, 512)
    with pytest.raises(ValueError):
        auto_n_clusters(0, 512)
    with pytest.raises(ValueError):
        auto_n_clusters(100, 0)


def test_resolve_n_clusters_auto_vs_explicit():
    # explicit passes through untouched
    assert resolve_n_clusters(16, 10**6) == 16
    # auto applies the rule, additionally bounded by fit-sample support
    # (>= 8 training points per centroid)
    assert resolve_n_clusters("auto", 512 * 64) == 64
    assert resolve_n_clusters("auto", 10**9, fit_sample=800) == 100
    assert resolve_n_clusters("auto", 10**9) == 4096


# ---------------------------------------------------------------------------
# n_clusters="auto" at fit, every family
# ---------------------------------------------------------------------------
def test_ivf_fit_auto_sizes_from_corpus(spark, emb):
    from custom_vector_database_spark.operators.ivf import IvfIndex

    small = _vecs(emb, hi=256)
    big = _vecs(emb, hi=500)
    k_small = len(
        IvfIndex.fit(small, n_clusters="auto",
                     target_rows_per_cluster=16).centroids
    )
    k_big = len(
        IvfIndex.fit(big, n_clusters="auto",
                     target_rows_per_cluster=16).centroids
    )
    assert k_small == auto_n_clusters(256, 16) == 16
    assert k_big == auto_n_clusters(500, 16) == 32
    assert k_big > k_small  # monotone through the real fit path
    # the auto-sized layout still searches correctly (exact within the
    # probed set; full probe == brute force top-1 on a build vector)
    idx = IvfIndex.fit(small, n_clusters="auto", target_rows_per_cluster=16)
    q = small.filter(F.col("id") == 7).first()["vec"]
    top = idx.search([float(x) for x in q], k=1, nprobe=16).first()
    assert top["id"] == 7


def test_ivfpq_ivfbq_maxsim_fit_auto(spark, emb):
    from custom_vector_database_spark.operators.ivfbq import IvfBqIndex
    from custom_vector_database_spark.operators.maxsim import MaxSimIndex
    from custom_vector_database_spark.operators.pq import IvfPqIndex

    base = _vecs(emb, hi=500)
    k_want = auto_n_clusters(500, 32)  # 16
    assert k_want == 16
    assert len(IvfPqIndex.fit(
        base, n_clusters="auto", target_rows_per_cluster=32, m=8
    ).centroids) == k_want
    assert len(IvfBqIndex.fit(
        base, n_clusters="auto", target_rows_per_cluster=32
    ).centroids) == k_want
    toks = emb.filter(F.col("vec_id") < 500).select(
        F.expr("vec_id DIV 8").alias("doc"), "embedding"
    )
    assert len(MaxSimIndex.fit(
        toks, n_clusters="auto", target_rows_per_cluster=32
    ).centroids) == k_want


# ---------------------------------------------------------------------------
# the autopilot resize action
# ---------------------------------------------------------------------------
def test_plan_surfaces_resize_and_execute_refits_at_computed_k(
    spark, emb, tmp_path
):
    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.maintenance import (
        maintenance_plan,
        run_maintenance,
    )

    base = _vecs(emb, hi=500)
    path = str(tmp_path / "ivf")
    # deliberately undersized: 2 clusters over 500 rows = 250 rows/cluster
    IvfIndex.fit(base, n_clusters=2).save(path)
    idx = IvfIndex.load(spark, path)
    ent = {
        "name": "l", "index": idx, "build_df": base,
        "recent_df": base.limit(16), "path": path,
        "target_rows_per_cluster": 16, "occupancy_trip": 4.0,
        "resize_refit": lambda k: IvfIndex.fit(base, n_clusters=k),
    }
    plan = maintenance_plan(spark, [ent])
    by = {(a["target"], a["action"]): a for a in plan}
    row = by[("l", "resize")]
    assert row["executable"] and not row["blocked"]
    assert row["metric"] == 250.0 and row["threshold"] == 64.0
    # not stale, so no executable rebuild row rides along
    assert not by[("l", "none")]["executable"]
    # resize ranks with the actionable band, before the calibrate
    # advisory and the healthy staleness row
    assert [a["action"] for a in plan] == ["resize", "calibrate", "none"]

    _, executed = run_maintenance(spark, [ent], execute=True)
    assert [e["action"] for e in executed] == ["resize"]
    k = auto_n_clusters(500, 16)
    assert executed[0]["n_clusters"] == k == 32
    rebuilt = IvfIndex.load(spark, path)
    assert len(rebuilt.centroids) == k
    # the new occupancy is back at target: the next plan has no resize
    plan2 = maintenance_plan(
        spark,
        [{"name": "l", "index": rebuilt, "build_df": base,
          "recent_df": base.limit(16), "path": path,
          "target_rows_per_cluster": 16, "occupancy_trip": 4.0,
          "resize_refit": lambda k: IvfIndex.fit(base, n_clusters=k)}],
    )
    assert "resize" not in [a["action"] for a in plan2]


def test_resize_subsumes_rebuild_and_recalibrates_in_one_run(
    spark, emb, tmp_path
):
    """A stale AND oversized layout plans exactly ONE refit: the resize
    row (its computed-k refit refreshes the quantizer too); the rebuild
    row is demoted to informational with the supersession named, and
    the calibrate row (re-earning the pin the resize drops) still rides
    the same execute run."""
    from custom_vector_database_spark.operators.calibrate import (
        calibrate_nprobe,
    )
    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.maintenance import (
        run_maintenance,
    )

    base = _vecs(emb, hi=500)
    drifted = base.limit(16).withColumn(
        "vec",
        F.expr("transform(vec, x -> CAST(CAST(x AS DOUBLE) + 1.0 AS FLOAT))"),
    )
    path = str(tmp_path / "ivf")
    IvfIndex.fit(base, n_clusters=2).save(path)
    idx = IvfIndex.load(spark, path)
    qbag = base.limit(4).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    calibrate_nprobe(idx, qbag, k=5, target_recall=0.5, persist=True)
    ent = {
        "name": "l", "index": IvfIndex.load(spark, path),
        "build_df": base, "recent_df": drifted, "path": path,
        "target_rows_per_cluster": 16, "occupancy_trip": 4.0,
        "refit": lambda: IvfIndex.fit(base, n_clusters=2),
        "resize_refit": lambda k: IvfIndex.fit(base, n_clusters=k),
        "calibrate": {"queries": qbag, "k": 5, "target_recall": 0.5},
    }
    plan, executed = run_maintenance(spark, [ent], execute=True)
    by = {(a["target"], a["action"]): a for a in plan}
    assert not by[("l", "rebuild")]["executable"]
    assert "superseded by the resize row" in by[("l", "rebuild")]["reason"]
    assert by[("l", "resize")]["executable"]
    assert by[("l", "calibrate")]["executable"]
    assert "drops the pin" in by[("l", "calibrate")]["reason"]
    assert [e["action"] for e in executed] == ["resize", "calibrate"]
    rebuilt = IvfIndex.load(spark, path)
    assert len(rebuilt.centroids) == auto_n_clusters(500, 16)
    assert rebuilt.calibration["nprobe"] == executed[1]["nprobe"]


# ---------------------------------------------------------------------------
# the Arrow assign/probe fast path (fitting.nearest_centroid_col /
# nprobe_clusters_col) — what makes the auto-sized big-k layouts
# affordable (the codegen fold's interpreted lambdas cost ~7M element-ops
# per core-second; measured 77 s -> 0.6 s at k=4096 on one slice)
# ---------------------------------------------------------------------------
def test_arrow_assign_matches_codegen_exactly(spark, emb):
    import numpy as np
    from pyspark.sql import functions as F

    from custom_vector_database_spark.operators.fitting import (
        nearest_centroid_col,
        nearest_centroid_expr,
        nprobe_clusters_col,
        nprobe_clusters_sql,
    )

    rng = np.random.RandomState(7)
    cents = [[float(x) for x in rng.randn(64)] for _ in range(32)]
    v = "CAST(embedding AS ARRAY<DOUBLE>)"
    a = emb.select("vec_id", nearest_centroid_expr(v, cents).alias("c"))
    b = emb.select(
        "vec_id", nearest_centroid_col(v, cents, arrow_from=1).alias("c2")
    )
    assert (
        a.join(b, "vec_id").filter(F.col("c") != F.col("c2")).count() == 0
    )
    pa = emb.select(
        "vec_id", F.expr(nprobe_clusters_sql(v, cents, 4)).alias("p")
    )
    pb = emb.select(
        "vec_id", nprobe_clusters_col(v, cents, 4, arrow_from=1).alias("p2")
    )
    assert (
        pa.join(pb, "vec_id")
        .filter(F.col("p").cast("string") != F.col("p2").cast("string"))
        .count()
        == 0
    )


def test_arrow_assign_null_and_dim_mismatch_semantics(spark, emb):
    """The Arrow path preserves the codegen route's NULL contract: a
    NULL or wrong-dim vector assigns a NULL cluster (never a crash,
    never a bogus id) — the upstream guards are what turn those into
    hard errors."""
    import numpy as np
    from pyspark.sql import functions as F

    from custom_vector_database_spark.operators.fitting import (
        nearest_centroid_col,
    )

    rng = np.random.RandomState(7)
    cents = [[float(x) for x in rng.randn(64)] for _ in range(4)]
    df = emb.limit(8).select(
        "vec_id",
        F.when(F.col("vec_id") == 0, F.lit(None))
        .when(F.col("vec_id") == 1, F.expr("slice(embedding, 1, 3)"))
        .otherwise(F.col("embedding"))
        .cast("array<double>")
        .alias("v"),
    )
    out = df.select(
        "vec_id", nearest_centroid_col("v", cents, arrow_from=1).alias("c")
    ).collect()
    by = {r["vec_id"]: r["c"] for r in out}
    assert by[0] is None and by[1] is None
    assert all(v is not None for k, v in by.items() if k > 1)


def test_auto_sized_big_k_fit_uses_arrow_and_searches(spark, emb):
    """End-to-end through IvfIndex at a cluster count past
    ARROW_ASSIGN_FROM: the fit encodes through the Arrow path, the plan
    carries ArrowEvalPython (never row-at-a-time BatchEvalPython), and a
    full-probe search over the layout is exact."""
    from pyspark.sql import functions as F

    from custom_vector_database_spark.operators.ivf import IvfIndex

    base = _vecs(emb, hi=500)
    idx = IvfIndex.fit(base, n_clusters="auto", target_rows_per_cluster=2)
    assert len(idx.centroids) == 250  # past ARROW_ASSIGN_FROM=192
    plan = idx._clustered._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # Arrow-batched, never per-row
    q = base.filter(F.col("id") == 3).first()["vec"]
    top = idx.search([float(x) for x in q], k=1, nprobe=250).first()
    assert top["id"] == 3
    # batch path: the probe shortlist also rides the Arrow column
    qt = base.limit(4).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    hits = idx.search_many(qt, k=1, nprobe=250)
    assert {r["qid"] for r in hits.collect()} == {0, 1, 2, 3}
    assert all(r["qid"] == r["id"] for r in hits.collect())


def test_maxsim_unit_arrow_assign_matches_codegen(spark, emb, tmp_path):
    """MaxSim's unit-space assign joins the Arrow fast path: identical
    cluster ids on both routes (incl. the zero-norm pass-through-raw
    rule), and an auto-sized big-k MaxSim fit builds + searches through
    it end-to-end."""
    import numpy as np
    from pyspark.sql import functions as F

    from custom_vector_database_spark.operators.maxsim import (
        MaxSimIndex,
        _nearest_unit_centroid_col,
        _nearest_unit_centroid_sql,
    )

    rng = np.random.RandomState(11)
    cents = [[float(x) for x in rng.randn(64)] for _ in range(16)]
    toks = emb.limit(200).select(
        "vec_id",
        F.when(F.col("vec_id") == 3,
               F.expr("transform(embedding, x -> CAST(0.0 AS FLOAT))"))
        .otherwise(F.col("embedding")).alias("v"),
    )
    a = toks.select(
        "vec_id", F.expr(_nearest_unit_centroid_sql("`v`", cents)).alias("c")
    )
    b = toks.select(
        "vec_id",
        _nearest_unit_centroid_col("`v`", cents, arrow_from=1).alias("c2"),
    )
    assert (
        a.join(b, "vec_id").filter(F.col("c") != F.col("c2")).count() == 0
    )

    # end-to-end: auto sizing past ARROW_ASSIGN_FROM on the token IVF
    tok_tbl = emb.select(F.expr("vec_id DIV 2").alias("doc"), "embedding")
    idx = MaxSimIndex.fit(
        tok_tbl, n_clusters="auto", target_rows_per_cluster=2
    )
    assert len(idx.centroids) == 250  # past the 192 threshold
    path = str(tmp_path / "ms_big")
    idx.save(path)
    loaded = MaxSimIndex.load(spark, path)
    qt = emb.filter(F.col("vec_id") < 2).select(
        F.lit(0).alias("qid"), F.col("vec_id").alias("qtid"),
        F.col("embedding").alias("qvec"),
    )
    # full probe + n_candidates >= n_docs = exact: doc 0 owns both
    # query tokens, so it must rank first
    top = loaded.search_many(
        qt, k=1, nprobe=250, n_candidates=1000
    ).first()
    assert top["doc"] == 0
