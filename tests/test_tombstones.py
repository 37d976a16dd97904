"""Tombstone deletes on the saved index layouts (round 6, VERDICT item 3).

Contract under test (operators/tombstones.py): delete() hides rows from
every search path immediately WITHOUT touching pre-existing part files;
upsert() of a tombstoned id REFUSES until a compact() physically clears
the deletion (id reuse = compact first — no duplicate-id resurrection,
no crash window over the two artifacts); compact() drops tombstoned
rows and clears the sidecar; save()/rebuild-style full rewrites never
resurrect deleted rows, on the fresh load NOR on the saving handle.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from custom_vector_database_spark.operators import knn as knn_ops
from custom_vector_database_spark.operators.ivf import IvfIndex
from custom_vector_database_spark.operators.pq import IvfPqIndex

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _part_mtimes(rows_path: str) -> dict[str, float]:
    return {
        os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
        for dp, _dn, fs in os.walk(rows_path)
        for f in fs
        if f.endswith(".parquet")
    }


@pytest.fixture()
def ivf(spark, emb, tmp_path):
    idx = IvfIndex.fit(emb, id_col="vec_id", vec_col="embedding", n_clusters=8)
    path = str(tmp_path / "ivf")
    idx.save(path)
    return IvfIndex.load(spark, path)


def test_ivf_delete_hides_rows_without_touching_parts(spark, emb, ivf):
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    # the self-match row is the certain top-1 — delete it
    top = ivf.search(qvec, k=3, nprobe=8).collect()
    victim = top[0]["vec_id"]
    assert victim == 0

    pre = _part_mtimes(os.path.join(ivf._path, "rows"))
    n = ivf.delete([victim, 999_999_999])  # one live, one absent
    assert n == 1
    for p, mt in pre.items():
        assert os.path.exists(p) and os.path.getmtime(p) == mt, p

    hit_ids = {r["vec_id"] for r in ivf.search(qvec, k=10, nprobe=8).collect()}
    assert victim not in hit_ids and len(hit_ids) == 10
    assert ivf.describe()["n_tombstones"] == 2
    # count the live view, not the stored rows
    assert ivf.clustered_df().filter(F.col("vec_id") == victim).count() == 0

    # double-delete counts zero new live rows
    assert ivf.delete([victim]) == 0


def test_ivf_delete_matches_exact_over_remaining(spark, emb, ivf):
    """Search-after-delete == exact k-NN over base MINUS deleted (the
    ivf_delete oracle's contract, asserted with full probes so the
    approximate search is exhaustive)."""
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    deleted = [0, 1, 2, 3]
    ivf.delete(deleted)
    exact = knn_ops.knn(
        emb.filter(~F.col("vec_id").isin(deleted)), qvec, k=10,
        id_col="vec_id", vec_col="embedding",
    ).collect()
    approx = ivf.search(qvec, k=10, nprobe=8).collect()
    assert [r["vec_id"] for r in approx] == [r["vec_id"] for r in exact]


def test_ivf_search_many_excludes_deleted(spark, emb, ivf):
    ivf.delete([0, 1])
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    hits = ivf.search_many(queries, k=5, nprobe=8).collect()
    assert hits and all(r["vec_id"] not in (0, 1) for r in hits)


def test_ivf_upsert_refuses_tombstoned_id_until_compact(spark, emb, ivf):
    """Id reuse after delete requires a compact first: clearing the
    tombstone at upsert time would resurrect the OLD physical copy
    alongside the new one (duplicate id), and either commit order over
    the two artifacts has a crash window. The reference never reuses ids
    at all (monotonic nextId, vectordb.cpp:43)."""
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    ivf.delete([0])
    assert 0 not in {
        r["vec_id"] for r in ivf.search(qvec, k=5, nprobe=8).collect()
    }
    delta = emb.filter(F.col("vec_id") == 0).select("vec_id", "embedding")
    with pytest.raises(ValueError, match="compact"):
        ivf.upsert(delta)
    # compact physically clears the deletion; then the id is free again
    ivf.compact()
    assert ivf.upsert(delta) == 1
    hits = ivf.search(qvec, k=5, nprobe=8).collect()
    assert 0 in {r["vec_id"] for r in hits}
    # exactly ONE physical copy — no duplicate-id resurrection
    assert ivf.clustered_df().filter(F.col("vec_id") == 0).count() == 1
    assert ivf.describe()["n_tombstones"] == 0


def test_ivf_compact_physically_drops_tombstoned_rows(spark, emb, ivf):
    from custom_vector_database_spark.operators.layout import tombstones_path

    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    ivf.delete([0, 1])
    before = ivf.search(qvec, k=10, nprobe=8).collect()
    n_live = ivf.clustered_df().count()
    ivf.compact()
    # sidecar gone, stored layout == live layout, answers unchanged
    assert not os.path.exists(tombstones_path(ivf._path))
    assert ivf._tombstones is None
    assert ivf._clustered.count() == n_live
    assert ivf._clustered.filter(F.col("vec_id").isin([0, 1])).count() == 0
    after = ivf.search(qvec, k=10, nprobe=8).collect()
    assert [r["vec_id"] for r in after] == [r["vec_id"] for r in before]


def test_ivf_save_does_not_resurrect(spark, emb, ivf, tmp_path):
    ivf.delete([0])
    path2 = str(tmp_path / "ivf2")
    ivf.save(path2)
    reloaded = IvfIndex.load(spark, path2)
    assert reloaded.clustered_df().filter(F.col("vec_id") == 0).count() == 0
    assert reloaded._tombstones is None
    # the SAME handle must not resurrect either: after save() cleared the
    # tombstone view, its raw layout must be the freshly written one (the
    # old path still physically holds row 0)
    assert ivf.clustered_df().filter(F.col("vec_id") == 0).count() == 0
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    assert 0 not in {
        r["vec_id"] for r in ivf.search(qvec, k=5, nprobe=8).collect()
    }


def test_ivf_delete_requires_saved_index(emb):
    idx = IvfIndex.fit(emb, id_col="vec_id", vec_col="embedding", n_clusters=4)
    with pytest.raises(ValueError, match="saved"):
        idx.delete([0])


def test_ivf_delete_accepts_dataframe_ids(spark, emb, ivf):
    ids = spark.range(0, 5).select(F.col("id").alias("vec_id"))
    assert ivf.delete(ids) == 5
    assert ivf.clustered_df().filter(F.col("vec_id") < 5).count() == 0


def test_ivfpq_delete_hides_and_compact_clears(spark, emb, tmp_path):
    from custom_vector_database_spark.operators.layout import tombstones_path

    idx = IvfPqIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=8, m=8, k=16
    )
    path = str(tmp_path / "ivfpq")
    idx.save(path)
    idx = IvfPqIndex.load(spark, path)
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])

    pre = _part_mtimes(os.path.join(path, "codes"))
    assert idx.delete([0]) == 1
    for p, mt in pre.items():
        assert os.path.getmtime(p) == mt, p
    assert 0 not in {
        r["vec_id"] for r in idx.search(qvec, k=10, nprobe=8).collect()
    }
    # rerank path also excludes (candidates already filtered)
    assert 0 not in {
        r["vec_id"]
        for r in idx.search(
            qvec, k=10, nprobe=8, base_df=emb, vec_col="embedding", rerank=4
        ).collect()
    }
    # batch path
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    assert all(
        r["vec_id"] != 0
        for r in idx.search_many(queries, k=5, nprobe=8).collect()
    )
    assert idx.describe()["n_tombstones"] == 1

    idx.compact()
    assert not os.path.exists(tombstones_path(path))
    assert idx._encoded.filter(F.col("vec_id") == 0).count() == 0


def test_fit_rejects_null_and_ragged_vectors(spark, emb):
    bad = emb.select(
        "vec_id",
        F.when(F.col("vec_id") == 0, F.lit(None)).otherwise(
            F.col("embedding")
        ).alias("embedding"),
    )
    with pytest.raises(ValueError, match="NULL"):
        IvfIndex.fit(bad, id_col="vec_id", vec_col="embedding", n_clusters=4)
    with pytest.raises(ValueError, match="NULL"):
        IvfPqIndex.fit(
            bad, id_col="vec_id", vec_col="embedding", n_clusters=4, m=8, k=16
        )
    ragged = emb.select(
        "vec_id",
        F.when(
            F.col("vec_id") == 0, F.expr("slice(embedding, 1, 3)")
        ).otherwise(F.col("embedding")).alias("embedding"),
    )
    with pytest.raises(ValueError, match="dims spanning"):
        IvfIndex.fit(ragged, id_col="vec_id", vec_col="embedding", n_clusters=4)


def test_describe_reports_caller_facing_dim_on_dot_indexes(spark, emb):
    """describe()['dim'] is what a caller must feed search/upsert — the
    RAW dim, one less than the stored augmented dim on dot indexes, on
    BOTH index classes (they must agree on what 'dim' means)."""
    ivf = IvfIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=4, metric="dot"
    )
    d1 = ivf.describe()
    pq = IvfPqIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=4, m=13,
        k=16, metric="dot",
    )
    d2 = pq.describe()
    assert d1["dim"] == d2["dim"] == 64
    assert d1["stored_dim"] == d2["stored_dim"] == 65


# ---------------------------------------------------------------------------
# Codebook staleness report (round 9): the when-to-rebuild metric for
# saved quantized layouts (operators/pq.quantization_error_report).
# ---------------------------------------------------------------------------
def test_pq_staleness_report_trips_on_drifted_delta(spark):
    """A delta drawn from the build distribution reports err_ratio ~1
    (not stale); a deliberately drifted delta (every component shifted
    by +1.0 — far outside the trained residual space) quantizes much
    worse and trips the report. Both for IvfPqIndex (residual
    codebooks) and flat PqIndex (raw-vector codebooks)."""
    from pyspark.sql import functions as F

    from custom_vector_database_spark.operators.pq import (
        IvfPqIndex,
        PqIndex,
        quantization_error_report,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.select("vec_id", F.col("embedding").alias("vec"))
    drifted = base.select(
        "vec_id",
        F.expr(
            "transform(vec, x -> CAST(CAST(x AS DOUBLE) + 1.0 AS FLOAT))"
        ).alias("vec"),
    )
    same = base.filter(F.col("vec_id") % 3 == 0)  # in-distribution slice

    for idx in (
        IvfPqIndex.fit(base, id_col="vec_id", n_clusters=8, m=8, k=16),
        PqIndex.fit(base, id_col="vec_id", m=8, k=16),
    ):
        fresh = quantization_error_report(idx, base, same).first()
        assert fresh["n_build"] == 500 and fresh["n_recent"] == 167
        assert not fresh["stale"]
        assert 0.5 < fresh["err_ratio"] < 1.5  # same distribution
        rep = quantization_error_report(idx, base, drifted).first()
        assert rep["stale"] and rep["err_ratio"] > 2.0
        assert rep["mean_recent_err_micro"] > 2 * rep["mean_build_err_micro"]

    # empty recent slice: ratio 0, never stale (no false rebuild signal)
    idx = PqIndex.fit(base, id_col="vec_id", m=8, k=16)
    empty = base.filter(F.col("vec_id") < 0)
    rep = quantization_error_report(idx, base, empty).first()
    assert rep["n_recent"] == 0 and rep["err_ratio"] == 0.0 and not rep["stale"]


def test_pq_staleness_zero_build_error_still_trips(spark):
    """Review finding (r9): a perfectly-quantizing build corpus (k >=
    distinct sub-vectors, every per-row error floors to 0 micro) must
    NOT suppress the rebuild signal — a drifted recent slice still
    reports a huge ratio and trips; only an EMPTY recent slice reports
    0.0/fresh."""
    from pyspark.sql import functions as F

    from custom_vector_database_spark.operators.pq import (
        PqIndex,
        quantization_error_report,
    )

    # 8 distinct vectors repeated: k=16 codebooks quantize them exactly
    base = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 16), i -> CAST(CAST(id % 8 AS DOUBLE) "
            "/ 8.0 AS FLOAT))"
        ).alias("vec"),
    )
    idx = PqIndex.fit(base, id_col="vec_id", m=8, k=16)
    build_rep = quantization_error_report(idx, base, base).first()
    assert build_rep["mean_build_err_micro"] == 0  # exact quantization
    drifted = base.select(
        "vec_id",
        F.expr("transform(vec, x -> CAST(CAST(x AS DOUBLE) + 3.0 AS FLOAT))")
        .alias("vec"),
    )
    rep = quantization_error_report(idx, base, drifted).first()
    assert rep["stale"] and rep["err_ratio"] > 1000  # ratio vs floor(1)


def test_pq_staleness_refuses_undecidable_inputs(spark):
    """Second r9 review pass: NULL-component report vectors refuse on
    BOTH index kinds (a NULL error silently dilutes the mean), and an
    empty build baseline refuses instead of spuriously tripping stale
    against the 1-micro denominator floor."""
    import pytest
    from pyspark.sql import functions as F

    from custom_vector_database_spark.operators.pq import (
        IvfPqIndex,
        PqIndex,
        quantization_error_report,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.select("vec_id", F.col("embedding").alias("vec"))
    nullcomp = spark.createDataFrame(
        [(1, [None] + [0.5] * 63)], "vec_id long, vec array<float>"
    )
    for idx in (
        IvfPqIndex.fit(base, id_col="vec_id", n_clusters=8, m=8, k=16),
        PqIndex.fit(base, id_col="vec_id", m=8, k=16),
    ):
        with pytest.raises(ValueError, match="NULL"):
            quantization_error_report(idx, base, nullcomp).first()
        with pytest.raises(ValueError, match="empty build_df"):
            quantization_error_report(
                idx, base.filter(F.col("vec_id") < 0), base
            ).first()


def test_staleness_report_covers_ivf_and_maxsim(spark):
    """The when-to-rebuild metric covers every fitted layout: the same
    quantization_error_report runs against IvfIndex (coarse-centroid
    distortion, incl. the cosine metric's unit space) and MaxSimIndex
    (token-IVF unit-space distortion) — in-distribution slices report
    ~1 and don't trip, drifted slices trip."""
    import pytest
    from pyspark.sql import functions as F

    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.maxsim import MaxSimIndex
    from custom_vector_database_spark.operators.pq import (
        quantization_error_report,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.select("vec_id", F.col("embedding").alias("vec"))
    same = base.filter(F.col("vec_id") % 3 == 0)
    drifted = base.select(
        "vec_id",
        F.expr(
            "transform(vec, x -> CAST(CAST(x AS DOUBLE) + 1.0 AS FLOAT))"
        ).alias("vec"),
    )
    # l2: residual distortion swings hard — the default 2.0 trips
    idx = IvfIndex.fit(
        base, id_col="vec_id", vec_col="vec", n_clusters=8, metric="l2_sq"
    )
    assert not quantization_error_report(
        idx, base, same, vec_col="vec"
    ).first()["stale"]
    assert quantization_error_report(
        idx, base, drifted, vec_col="vec"
    ).first()["stale"]
    # cosine: unit-sphere coarse distortion SATURATES (the docstring's
    # calibration note) — the drift signal is real but compressed, so
    # the layout thresholds lower; fresh stays well under it
    cidx = IvfIndex.fit(
        base, id_col="vec_id", vec_col="vec", n_clusters=64, metric="cosine"
    )
    cfresh = quantization_error_report(
        cidx, base, same, vec_col="vec", ratio_threshold=1.15
    ).first()
    assert not cfresh["stale"] and cfresh["err_ratio"] < 1.1
    cdrift = quantization_error_report(
        cidx, base, drifted, vec_col="vec", ratio_threshold=1.15
    ).first()
    assert cdrift["stale"] and cdrift["err_ratio"] > 1.25

    # maxsim's token IVF assigns in unit space — same saturating-sphere
    # calibration as cosine IVF
    toks = emb.select(
        F.expr("vec_id DIV 8").alias("doc"), F.col("embedding")
    )
    midx = MaxSimIndex.fit(
        toks, doc_col="doc", vec_col="embedding", n_clusters=64,
        n_doc_buckets=4,
    )
    fresh = quantization_error_report(
        midx, toks, toks.limit(100), vec_col="embedding",
        ratio_threshold=1.15,
    ).first()
    assert not fresh["stale"]
    tok_drift = toks.select(
        "doc",
        F.expr(
            "transform(embedding, x -> CAST(CAST(x AS DOUBLE) + 1.0 AS FLOAT))"
        ).alias("embedding"),
    )
    rep = quantization_error_report(
        midx, toks, tok_drift, vec_col="embedding", ratio_threshold=1.15
    ).first()
    assert rep["stale"] and rep["err_ratio"] > 1.25
    with pytest.raises(ValueError, match="NULL"):
        quantization_error_report(
            midx,
            toks,
            spark.createDataFrame(
                [(1, [None] + [0.5] * 63)], "doc long, embedding array<float>"
            ),
            vec_col="embedding",
        ).first()


def test_staleness_report_covers_ivfbq(spark):
    """IvfBq's sign codes are fit-free, but its coarse ROUTING quantizer
    drifts exactly like IvfIndex's — the report protocol covers it."""
    from pyspark.sql import functions as F

    from custom_vector_database_spark.operators.ivfbq import IvfBqIndex
    from custom_vector_database_spark.operators.pq import (
        quantization_error_report,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.select("vec_id", F.col("embedding").alias("vec"))
    idx = IvfBqIndex.fit(base, id_col="vec_id", vec_col="vec", n_clusters=8)
    fresh = quantization_error_report(
        idx, base, base.filter(F.col("vec_id") % 3 == 0), vec_col="vec"
    ).first()
    assert not fresh["stale"]
    drifted = base.select(
        "vec_id",
        F.expr(
            "transform(vec, x -> CAST(CAST(x AS DOUBLE) + 1.0 AS FLOAT))"
        ).alias("vec"),
    )
    assert quantization_error_report(
        idx, base, drifted, vec_col="vec"
    ).first()["stale"]
