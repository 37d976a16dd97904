"""Round-12 ADVICE regression tests (see ADVICE.md, r11 judge round):

1. run_maintenance's calibrate runner dispatches MaxSim-style layouts to
   calibrate_nprobe_maxsim instead of mis-routing them into the vector
   flavor (which could only ever skip with a misleading remedy).
2. Every calibratable layout's save() installs its meta under the
   artifact's sibling ``<path>_lock`` lease (layout.meta_write_lease),
   closing the window where calibrate's read-modify-replace could
   clobber a fresh save's meta with the old body + pin.
3. _durable_claim fsyncs the PARENT directory entry of a freshly
   created claims_dir — a power loss on the first batch of a fresh
   sidecar could otherwise drop the whole claims dir while the sidecar
   append survives (the batch-shadowing hazard).
4. maintenance_plan emits the calibrate row for a PINNED layout whose
   rebuild row is planned executable: the rebuild drops the pin, and
   one execute run must close the rebuild→recalibrate loop.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _vecs(emb, lo=0, hi=64):
    return emb.filter(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    ).select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))


def _drift(df):
    return df.withColumn(
        "vec",
        F.expr("transform(vec, x -> CAST(CAST(x AS DOUBLE) + 1.0 AS FLOAT))"),
    )


def test_run_calibrate_dispatches_maxsim(spark, emb, tmp_path):
    """ADVICE item 1: a MaxSim entry supplying a calibrate spec must
    actually calibrate (via calibrate_nprobe_maxsim) — previously the
    runner always called the vector flavor, which refused a MaxSim
    handle with a 'stores codes, pass corpus=' skip that can never be
    satisfied, so the advertised rebuild→recalibrate loop silently
    never closed for the fourth pruned family."""
    from custom_vector_database_spark.operators.maintenance import (
        run_maintenance,
    )
    from custom_vector_database_spark.operators.maxsim import MaxSimIndex

    toks = emb.filter(F.col("vec_id") < 128).select(
        F.expr("vec_id DIV 8").alias("doc"), "embedding"
    )
    path = str(tmp_path / "maxsim")
    MaxSimIndex.fit(toks, n_clusters=4).save(path)
    idx = MaxSimIndex.load(spark, path)
    assert idx.calibration is None
    qt = emb.filter(F.col("vec_id") < 16).select(
        F.expr("vec_id DIV 8").alias("qid"),
        F.col("vec_id").alias("qtid"),
        F.col("embedding").alias("qvec"),
    )
    ent = {
        "name": "ms", "index": idx,
        "build_df": toks.select(F.col("embedding").alias("vec")),
        "recent_df": toks.limit(16).select(F.col("embedding").alias("vec")),
        "path": path,
        # n_candidates >= n_docs: the full probe IS brute force, so the
        # sweep deterministically meets any target (the vacuity-safe
        # construction from tests/test_calibrate.py)
        "calibrate": {
            "queries": qt, "k": 5, "target_recall": 0.9,
            "search_kwargs": {"n_candidates": 1000},
        },
    }
    plan, executed = run_maintenance(spark, [ent], execute=True)
    by = {(a["target"], a["action"]): a for a in plan}
    assert by[("ms", "calibrate")]["executable"]
    cal = [e for e in executed if e["action"] == "calibrate"]
    assert len(cal) == 1
    # the run SUCCEEDED (dispatched to the MaxSim verb) — not the old
    # misleading 'stores codes' skip, not a TypeError failure
    assert "skipped" not in cal[0] and "failed" not in cal[0]
    assert cal[0]["nprobe"] is not None and cal[0]["recall"] >= 0.9
    # and the pin landed in the saved meta
    assert MaxSimIndex.load(spark, path).calibration["nprobe"] == (
        cal[0]["nprobe"]
    )


@pytest.mark.parametrize("family", ["ivf", "maxsim"])
def test_save_meta_install_takes_the_sibling_lock(
    spark, emb, tmp_path, family
):
    """ADVICE item 2: save()'s meta install must serialize on the same
    ``<path>_lock`` lease calibrate's read-modify-replace holds. A
    foreign live-pid lease on that lock makes save refuse loudly
    (WriterLeaseHeld after the brief retry) instead of interleaving;
    clearing the lock lets the identical save succeed."""
    import json as _json

    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.maxsim import MaxSimIndex
    from custom_vector_database_spark.streaming.lease import (
        LEASE_FILE,
        WriterLeaseHeld,
    )

    path = str(tmp_path / family)
    if family == "ivf":
        idx = IvfIndex.fit(_vecs(emb), n_clusters=4)
    else:
        toks = emb.filter(F.col("vec_id") < 64).select(
            F.expr("vec_id DIV 8").alias("doc"), "embedding"
        )
        idx = MaxSimIndex.fit(toks, n_clusters=4)

    # a FOREIGN holder: pid 1 exists but is not ours (possibly-alive →
    # no dead-pid reclaim), epoch/owner unknown to this process
    lock_dir = path + "_lock"
    os.makedirs(lock_dir)
    import socket

    with open(os.path.join(lock_dir, LEASE_FILE), "w") as f:
        _json.dump(
            {"owner": "someone-else", "epoch": 3, "pid": 1,
             "host": socket.gethostname(), "verb": "calibrate_nprobe"},
            f,
        )
    with pytest.raises(WriterLeaseHeld):
        idx.save(path)
    os.remove(os.path.join(lock_dir, LEASE_FILE))
    idx.save(path)  # lock cleared → the identical save lands
    with open(os.path.join(path, "meta.json")) as f:
        assert _json.load(f)["centroids"] == idx.centroids


def test_durable_claim_fsyncs_new_claims_dir_parent(tmp_path, monkeypatch):
    """ADVICE item 3: when _durable_claim CREATES claims_dir, the parent
    directory entry is fsynced too; when the dir already exists, it is
    not re-fsynced (the steady-state cost stays two fsyncs)."""
    from custom_vector_database_spark.streaming import stream_ops

    synced: list[str] = []
    real_fsync = os.fsync

    def spy(fd):
        try:
            synced.append(os.readlink(f"/proc/self/fd/{fd}"))
        except OSError:
            synced.append("<unknown>")
        real_fsync(fd)

    monkeypatch.setattr(os, "fsync", spy)
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    claims_dir = str(corpus / "_ingest_claims")

    stream_ops._durable_claim(claims_dir, os.path.join(claims_dir, "claim_1"))
    assert str(corpus) in synced  # the parent entry was made durable

    synced.clear()
    stream_ops._durable_claim(claims_dir, os.path.join(claims_dir, "claim_2"))
    assert str(corpus) not in synced  # steady state: claim + dir only
    assert any(s.endswith("claim_2") for s in synced)
    assert claims_dir in synced


def test_plan_emits_calibrate_after_rebuild_for_pinned_layout(
    spark, emb, tmp_path
):
    """ADVICE item 4: a PINNED-but-drifted layout with an executable
    rebuild row also gets the calibrate row (ranked after rebuild) —
    the rebuild is guaranteed to drop the pin, so without it one
    execute run would leave the rebuilt layout unpinned until the next
    maintenance pass, against the docstring's promise."""
    from custom_vector_database_spark.operators.calibrate import (
        calibrate_nprobe,
    )
    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.maintenance import (
        maintenance_plan,
        run_maintenance,
    )

    base = _vecs(emb)
    path = str(tmp_path / "ivf")
    IvfIndex.fit(base, n_clusters=4).save(path)
    idx = IvfIndex.load(spark, path)
    qbag = base.limit(4).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    calibrate_nprobe(idx, qbag, k=5, target_recall=0.5, persist=True)
    assert IvfIndex.load(spark, path).calibration is not None  # pinned

    ent = {
        "name": "l", "index": IvfIndex.load(spark, path),
        "build_df": base, "recent_df": _drift(base.limit(16)),
        "refit": lambda: IvfIndex.fit(base, n_clusters=4),
        "path": path,
        "calibrate": {"queries": qbag, "k": 5, "target_recall": 0.5},
    }
    plan = maintenance_plan(spark, [ent])
    assert [a["action"] for a in plan] == ["rebuild", "calibrate"]
    cal_row = plan[1]
    assert cal_row["executable"]
    assert "drops the pin" in cal_row["reason"]

    # one execute run closes the loop: rebuild (pin dropped) then
    # calibrate (fresh pin measured on the NEW layout)
    _, executed = run_maintenance(spark, [ent], execute=True)
    assert [e["action"] for e in executed] == ["rebuild", "calibrate"]
    assert executed[1]["nprobe"] is not None
    new_idx = IvfIndex.load(spark, path)
    assert new_idx.calibration["nprobe"] == executed[1]["nprobe"]

    # a pinned HEALTHY layout (no rebuild planned) still emits no
    # calibrate row — the pin is valid
    plan2 = maintenance_plan(
        spark,
        [{"name": "l", "index": new_idx, "build_df": base,
          "recent_df": base.limit(16)}],
    )
    assert [a["action"] for a in plan2] == ["none"]


def test_gc_sidecar_branch_heartbeats_its_lease(spark, tmp_path, monkeypatch):
    """r12 review finding: with the cross-host TTL live, every corpus
    contender ages out a lease 3600 s past its last beat — so the gc
    runner's sidecar branch must hold its lease WITH the heartbeat (the
    layout branch already did), or a >1 h debris rmtree gets fenced
    mid-delete by the very expiry rule round 12 added."""
    import custom_vector_database_spark.streaming.lease as L
    from custom_vector_database_spark.operators.maintenance import (
        run_maintenance,
    )
    from custom_vector_database_spark.queries.pipeline_queries import (
        _fragmented_sb_corpus,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    frag = _fragmented_sb_corpus(
        spark, emb, str(tmp_path / "frag"), n_batches=1
    )
    # plant safe debris so a gc row exists and executes
    os.makedirs(os.path.join(frag, "_sb_bands_tmp"))

    calls = []
    real = L.writer_lease

    def spy(corpus_dir, verb, **kw):
        calls.append((verb, kw.get("stale_after_s"), kw.get("heartbeat_s")))
        return real(corpus_dir, verb, **kw)

    monkeypatch.setattr(L, "writer_lease", spy)
    _, executed = run_maintenance(
        spark, corpora=[("frag", frag)], execute=True
    )
    gc_calls = [c for c in calls if c[0] == "gc"]
    assert gc_calls, f"gc never took the lease (executed={executed})"
    for _, stale, beat in gc_calls:
        assert stale == 3600 and beat == 600
