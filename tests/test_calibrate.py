"""Recall auto-calibration contract (operators/calibrate.py): the sweep
measures recall@k against the exact k-NN join, picks the MINIMAL nprobe
meeting the target, pins it in the saved layout's meta, and
``nprobe="auto"`` resolves the pin — refusing with the remedy when the
layout never earned one. Lifecycle: the pin survives save/load and
compact (quantizer unchanged) and is dropped by a refit."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from custom_vector_database_spark.operators.calibrate import (
    auto_nprobe,
    calibrate_nprobe,
)
from custom_vector_database_spark.operators.ivf import IvfIndex

SF = "/root/testdata/sf0.001"
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qbag(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


@pytest.fixture(scope="module")
def saved_ivf(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("calib") / "ivf")
    IvfIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=8
    ).save(path)
    return IvfIndex.load(spark, path)


def test_full_sweep_monotone_and_exact_at_full_probe(saved_ivf, qbag):
    rep = calibrate_nprobe(
        saved_ivf, qbag, k=K, target_recall=0.9, full_sweep=True
    )
    recalls = [s["recall"] for s in rep["steps"]]
    nprobes = [s["nprobe"] for s in rep["steps"]]
    # doubling schedule, capped by n_clusters
    assert nprobes == [1, 2, 4, 8]
    # a larger probe is a superset of candidates -> recall never drops
    assert all(a <= b + 1e-12 for a, b in zip(recalls, recalls[1:]))
    # full probe over a raw-vector layout IS the exact search
    assert recalls[-1] == 1.0
    assert rep["met"] and rep["nprobe"] is not None
    # minimality: every step before the chosen one missed the target
    for s in rep["steps"]:
        if s["nprobe"] < rep["nprobe"]:
            assert s["recall"] < 0.9
    assert rep["recall"] >= 0.9
    assert rep["scan_fraction"] == rep["nprobe"] / rep["n_clusters"]


def test_early_stop_prefix_matches_full_sweep(saved_ivf, qbag):
    full = calibrate_nprobe(
        saved_ivf, qbag, k=K, target_recall=0.9, full_sweep=True
    )
    fast = calibrate_nprobe(saved_ivf, qbag, k=K, target_recall=0.9)
    assert fast["nprobe"] == full["nprobe"]
    assert fast["steps"] == full["steps"][: len(fast["steps"])]
    assert fast["steps"][-1]["nprobe"] == fast["nprobe"]


def test_persist_roundtrip_and_auto(spark, saved_ivf, qbag):
    rep = calibrate_nprobe(
        saved_ivf, qbag, k=K, target_recall=0.9, persist=True
    )
    assert saved_ivf.calibration["nprobe"] == rep["nprobe"]
    # the pin survives a reload
    reloaded = IvfIndex.load(spark, saved_ivf._path)
    assert reloaded.calibration["nprobe"] == rep["nprobe"]
    # auto resolves to the pinned value and returns the same rows
    auto_rows = reloaded.search_many(qbag, k=K, nprobe="auto").collect()
    pin_rows = reloaded.search_many(qbag, k=K, nprobe=rep["nprobe"]).collect()
    assert auto_rows == pin_rows
    # single-query path too
    q = [float(x) for x in qbag.orderBy("qid").first()["qvec"]]
    assert (
        reloaded.search(q, k=K, nprobe="auto").collect()
        == reloaded.search(q, k=K, nprobe=rep["nprobe"]).collect()
    )


def test_pin_survives_compact_and_is_dropped_by_refit(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    IvfIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=8
    ).save(path)
    idx = IvfIndex.load(spark, path)
    qbag = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    calibrate_nprobe(idx, qbag, k=5, target_recall=0.5, persist=True)
    # compact rewrites rows, not meta: the pin (still valid — the
    # quantizer is unchanged) survives
    idx.compact()
    assert IvfIndex.load(spark, path).calibration is not None
    # a refit writes a FRESH meta: the pin must be re-earned
    IvfIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=8
    ).save(path)
    assert IvfIndex.load(spark, path).calibration is None
    with open(os.path.join(path, "meta.json")) as f:
        assert "calibration" not in json.load(f)


def test_auto_without_pin_refuses_with_remedy(spark, emb):
    idx = IvfIndex.fit(emb, id_col="vec_id", vec_col="embedding", n_clusters=4)
    with pytest.raises(ValueError, match="calibrate_nprobe"):
        idx.search([0.0] * 64, k=5, nprobe="auto")
    with pytest.raises(ValueError, match="calibrate_nprobe"):
        auto_nprobe(idx)


def test_persist_on_unsaved_handle_refuses(emb, qbag):
    idx = IvfIndex.fit(emb, id_col="vec_id", vec_col="embedding", n_clusters=4)
    with pytest.raises(ValueError, match="saved index"):
        calibrate_nprobe(idx, qbag, k=5, target_recall=0.1, persist=True)


def test_oversized_bag_refuses(saved_ivf, emb):
    bag = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    with pytest.raises(ValueError, match="max_queries"):
        calibrate_nprobe(saved_ivf, bag, max_queries=8)


def test_codes_only_layout_requires_corpus(spark, emb, qbag, tmp_path):
    from custom_vector_database_spark.operators.pq import IvfPqIndex

    idx = IvfPqIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=4, m=8, k=16
    )
    with pytest.raises(ValueError, match="corpus="):
        calibrate_nprobe(idx, qbag, k=5)
    # with the source table supplied the sweep runs (and the full probe
    # need not be exact — ADC ranks on quantized codes)
    rep = calibrate_nprobe(
        idx, qbag, corpus=emb.select("vec_id", "embedding"),
        corpus_vec="embedding", k=5, target_recall=0.5, full_sweep=True,
    )
    assert [s["nprobe"] for s in rep["steps"]] == [1, 2, 4]
    # NOTE: no monotonicity claim here — ADC ranks on quantized codes, so
    # a newly probed cluster can contribute a quantized imposter that
    # displaces a true hit (observed on this very fixture); monotone
    # recall is guaranteed only for raw-vector layouts (test above)
    assert all(0.0 <= s["recall"] <= 1.0 for s in rep["steps"])


def test_unmet_target_refuses_persist(saved_ivf, qbag):
    class Stub:
        centroids = saved_ivf.centroids
        id_col = saved_ivf.id_col
        vec_col = saved_ivf.vec_col
        metric = "l2_sq"
        _path = saved_ivf._path

        def clustered_df(self):
            return saved_ivf.clustered_df()

        def search_many(self, queries, k, nprobe, **kw):
            # an index that never finds anything: recall 0 at every step
            return saved_ivf.search_many(queries, k=k, nprobe=nprobe).filter(
                F.lit(False)
            )

    rep = calibrate_nprobe(Stub(), qbag, k=5, target_recall=0.9)
    assert not rep["met"] and rep["nprobe"] is None
    assert rep["scan_fraction"] is None
    with pytest.raises(ValueError, match="refusing to pin"):
        calibrate_nprobe(Stub(), qbag, k=5, target_recall=0.9, persist=True)


def test_dot_metric_ground_truth_slices_off_augmentation(spark, emb, qbag):
    """r11 third review: the dot layout stores M-augmented dim+1 vectors;
    judged raw-vs-augmented the 'exact' top-k degenerated to the k lowest
    ids (NULL-padded zip_with distances). The ground truth now slices the
    augmentation off, so the full probe reproduces true MIPS exactly."""
    idx = IvfIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=8,
        metric="dot",
    )
    rep = calibrate_nprobe(
        idx, qbag, k=K, target_recall=0.9, full_sweep=True
    )
    recalls = [s["recall"] for s in rep["steps"]]
    assert recalls[-1] == 1.0  # full probe IS exact MIPS
    assert all(a <= b + 1e-12 for a, b in zip(recalls, recalls[1:]))
    assert rep["met"]


def test_persist_refuses_after_concurrent_rebuild(spark, emb, qbag, tmp_path):
    """r11 third review: the sweep runs unlocked; if a rebuild swapped a
    fresh quantizer in before persist, pinning the old measurement would
    re-add exactly the stale pin a rebuild drops — the persist verifies
    the meta's quantizer still matches the measured handle and refuses."""
    from custom_vector_database_spark.operators.calibrate import (
        _persist_calibration,
    )

    path = str(tmp_path / "ivf")
    IvfIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=8
    ).save(path)
    idx = IvfIndex.load(spark, path)
    # measure BEFORE the rebuild (the realistic interleaving: the sweep
    # is minutes of unlocked Spark jobs)
    rep = calibrate_nprobe(idx, qbag, k=5, target_recall=0.5)
    # a rebuild lands at the same path with a DIFFERENT quantizer
    IvfIndex.fit(
        emb.filter(F.col("vec_id") % 2 == 0),
        id_col="vec_id", vec_col="embedding", n_clusters=8,
    ).save(path)
    with pytest.raises(ValueError, match="rebuilt while this calibration"):
        _persist_calibration(idx, rep)
    assert IvfIndex.load(spark, path).calibration is None


def test_ivfbq_calibrates_with_injected_base_df(spark, emb, qbag, tmp_path):
    """IVF-BQ's search_many REQUIRES base_df (mandatory exact rerank):
    calibrate injects the ground-truth corpus automatically, the pin
    round-trips through save/load, and nprobe="auto" resolves it. NOTE:
    full probe is NOT exact for BQ — the Hamming shortlist keeps only
    k*rerank candidates per query, and 1-bit sign codes can rank a true
    neighbor outside that cut (measured ~0.72 at rerank=8 on this
    fixture) — which is precisely why a measured recall contract beats
    assuming one."""
    from custom_vector_database_spark.operators.ivfbq import IvfBqIndex

    idx = IvfBqIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=4
    )
    # codes-only layout: ground truth needs the raw source table
    with pytest.raises(ValueError, match="corpus="):
        calibrate_nprobe(idx, qbag, k=5)
    rep = calibrate_nprobe(
        idx, qbag, corpus=emb.select("vec_id", "embedding"),
        corpus_vec="embedding", k=5, target_recall=0.5, full_sweep=True,
        search_kwargs={"rerank": 8},
    )
    assert [s["nprobe"] for s in rep["steps"]] == [1, 2, 4]
    assert all(0.0 <= s["recall"] <= 1.0 for s in rep["steps"])
    assert rep["met"]
    # persist + auto round-trip on the saved layout
    path = str(tmp_path / "ivfbq")
    idx.save(path)
    loaded = IvfBqIndex.load(spark, path)
    rep2 = calibrate_nprobe(
        loaded, qbag, corpus=emb.select("vec_id", "embedding"),
        corpus_vec="embedding", k=5, target_recall=0.5, persist=True,
    )
    reloaded = IvfBqIndex.load(spark, path)
    assert reloaded.calibration["nprobe"] == rep2["nprobe"]
    base = emb.select("vec_id", "embedding")
    a = reloaded.search_many(qbag, k=5, base_df=base, nprobe="auto").collect()
    b = reloaded.search_many(
        qbag, k=5, base_df=base, nprobe=rep2["nprobe"]
    ).collect()
    assert a == b


def test_maxsim_calibration_end_to_end(spark, emb, tmp_path):
    """calibrate_nprobe_maxsim closes the LAST hand-tuned pruned layout:
    recall over per-qid doc sets vs the exact batch scorer, same schedule
    and pin lifecycle, nprobe="auto" in both MaxSim search verbs. With
    n_candidates >= n_docs the full probe IS brute force (the registered
    row's pinned property), so the sweep ends at recall 1.0."""
    from custom_vector_database_spark.operators.calibrate import (
        calibrate_nprobe_maxsim,
    )
    from custom_vector_database_spark.operators.maxsim import MaxSimIndex

    toks = emb.select(
        F.expr("vec_id DIV 8").alias("doc"), "embedding"
    )
    path = str(tmp_path / "maxsim")
    MaxSimIndex.fit(toks, n_clusters=8).save(path)
    idx = MaxSimIndex.load(spark, path)
    qt = emb.filter(F.col("vec_id") < 16).select(
        F.expr("vec_id DIV 8").alias("qid"),
        F.col("vec_id").alias("qtid"),
        F.col("embedding").alias("qvec"),
    )
    rep = calibrate_nprobe_maxsim(
        idx, qt, k=5, target_recall=0.9, full_sweep=True,
        search_kwargs={"n_candidates": 1000},
    )
    assert [s["nprobe"] for s in rep["steps"]] == [1, 2, 4, 8]
    assert rep["steps"][-1]["recall"] == 1.0
    assert rep["met"] and rep["n_queries"] == 2

    # persist + auto resolution in the batch verb
    rep2 = calibrate_nprobe_maxsim(
        idx, qt, k=5, target_recall=0.9, persist=True,
        search_kwargs={"n_candidates": 1000},
    )
    reloaded = MaxSimIndex.load(spark, path)
    assert reloaded.calibration["nprobe"] == rep2["nprobe"]
    a = reloaded.search_many(
        qt, k=5, nprobe="auto", n_candidates=1000
    ).collect()
    b = reloaded.search_many(
        qt, k=5, nprobe=rep2["nprobe"], n_candidates=1000
    ).collect()
    assert a == b
    # single-bag verb resolves the pin too
    bag = qt.filter(F.col("qid") == 0).select(
        F.col("qtid").alias("qid"), "qvec"
    )
    c = reloaded.search(bag, k=5, nprobe="auto", n_candidates=1000).collect()
    d = reloaded.search(
        bag, k=5, nprobe=rep2["nprobe"], n_candidates=1000
    ).collect()
    assert c == d
    # tombstoned docs leave the ground truth (the live-corpus rule)
    reloaded.delete([0])
    rep3 = calibrate_nprobe_maxsim(
        reloaded, qt, k=5, target_recall=1.0, full_sweep=True,
        search_kwargs={"n_candidates": 1000},
    )
    assert rep3["steps"][-1]["recall"] == 1.0
