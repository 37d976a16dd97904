"""The rebuild/compact autopilot (operators/maintenance.py, round 10):
plan mode turns quantization_error_report + sidecar_report into a ranked
action table; execute mode runs EXACTLY the plan's executable rows via
the existing crash-safe verbs — never a blocked row, never an action the
plan didn't list. Closes the ops loop the reference hands the operator
as an explicit rebuild command (main.cpp:34, vectordb.cpp:82-118)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _vecs(spark, lo=0, hi=64):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    )


def _drift(df):
    return df.withColumn(
        "vec",
        F.expr("transform(vec, x -> CAST(CAST(x AS DOUBLE) + 1.0 AS FLOAT))"),
    )


def _frag_sb_corpus(spark, tmp_path, name):
    """The SHARED fragmented-sign-band-corpus fixture (ONE copy —
    queries/pipeline_queries._fragmented_sb_corpus, also used by the
    maintenance_plan/maintenance_execute rows)."""
    from custom_vector_database_spark.queries.pipeline_queries import (
        _fragmented_sb_corpus,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    return _fragmented_sb_corpus(
        spark, emb, str(tmp_path / name), n_batches=2
    )


def test_plan_ranks_and_classifies(spark, tmp_path):
    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.maintenance import (
        maintenance_plan,
    )
    from custom_vector_database_spark.streaming.stream_ops import (
        _ensure_fp_sidecar,
    )

    base = _vecs(spark)
    idx = IvfIndex.fit(base, n_clusters=4)
    layouts = [
        {"name": "fresh", "index": idx, "build_df": base,
         "recent_df": base.limit(16)},
        {"name": "drifted", "index": idx, "build_df": base,
         "recent_df": _drift(base.limit(16))},
    ]
    frag = _frag_sb_corpus(spark, tmp_path, "frag")
    # a second corpus: healthy exact sidecar but ONE outstanding claim
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(10)
    claimed = str(tmp_path / "claimed")
    docs.write.parquet(claimed)
    _ensure_fp_sidecar(
        spark, claimed, os.path.join(claimed, "_fingerprints"), "text", 16
    )
    os.makedirs(os.path.join(claimed, "_ingest_claims"), exist_ok=True)
    with open(os.path.join(claimed, "_ingest_claims", "claim_7"), "a"):
        pass

    plan = maintenance_plan(
        spark, layouts,
        [("frag", frag), ("claimed", claimed)],
        max_files_per_bucket=1.4,
    )
    by = {(a["target"], a["action"]): a for a in plan}
    assert by[("drifted", "rebuild")]["metric"] > 2.0
    assert not by[("drifted", "rebuild")]["executable"]  # no refit supplied
    assert ("fresh", "none") in by
    assert by[("frag:signband", "compact")]["executable"]
    assert by[("frag:signband", "compact")]["metric"] > 1.4
    assert ("claimed:exact", "resolve_claims") in by
    assert not by[("claimed:exact", "resolve_claims")]["executable"]
    # ranking: claims first, healthy rows last
    assert plan[0]["action"] == "resolve_claims"
    assert plan[-1]["action"] == "none"
    actionable = [a for a in plan if a["action"] in ("rebuild", "compact")]
    # within the actionable band, farther past threshold ranks higher
    overs = [a["metric"] / a["threshold"] for a in actionable]
    assert overs == sorted(overs, reverse=True)


def test_execute_runs_exactly_the_plan(spark, tmp_path):
    """The autopilot contract: executed == the plan's executable rows —
    the blocked compact does NOT run, the unlisted layout is NOT refit,
    the listed rebuild + compact both land via the crash-safe verbs."""
    import glob

    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.maintenance import (
        run_maintenance,
    )
    from custom_vector_database_spark.operators.pq import (
        quantization_error_report,
    )

    base = _vecs(spark)
    drifted = _drift(base)
    path = str(tmp_path / "ivf")
    idx = IvfIndex.fit(base, n_clusters=4)
    idx.save(path)

    calls = []

    def refit_drifted():
        calls.append("drifted")
        # the rebuild a real operator runs: refit on the data the layout
        # must serve NOW (the drifted distribution)
        return IvfIndex.fit(drifted, n_clusters=4)

    def refit_fresh():
        calls.append("fresh")
        return IvfIndex.fit(base, n_clusters=4)

    layouts = [
        {"name": "drifted", "index": idx, "build_df": base,
         "recent_df": drifted.limit(16), "refit": refit_drifted,
         "path": path},
        {"name": "fresh", "index": idx, "build_df": base,
         "recent_df": base.limit(16), "refit": refit_fresh, "path": path},
    ]
    frag = _frag_sb_corpus(spark, tmp_path, "frag")
    # blocked: fragmented AND claimed — compact listed but must not run
    blocked = _frag_sb_corpus(spark, tmp_path, "blocked")
    os.makedirs(os.path.join(blocked, "_sb_claims"), exist_ok=True)
    with open(os.path.join(blocked, "_sb_claims", "claim_9"), "a"):
        pass
    count_files = lambda d: len(  # noqa: E731
        glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
    )
    frag_before = count_files(os.path.join(frag, "_sb_bands"))
    blocked_before = count_files(os.path.join(blocked, "_sb_bands"))

    plan, executed = run_maintenance(
        spark, layouts, [("frag", frag), ("blocked", blocked)],
        max_files_per_bucket=1.4, execute=True,
    )
    # executed == exactly the executable plan rows
    assert sorted((e["target"], e["action"]) for e in executed) == sorted(
        (a["target"], a["action"]) for a in plan if a["executable"]
    )
    assert calls == ["drifted"]  # the fresh layout was never refit
    by = {(a["target"], a["action"]): a for a in plan}
    assert by[("blocked:signband", "compact")]["blocked"]
    assert count_files(os.path.join(blocked, "_sb_bands")) == blocked_before
    assert count_files(os.path.join(frag, "_sb_bands")) < frag_before
    # the rebuilt layout is installed at path, loadable, and fresh again
    new = IvfIndex.load(spark, path)
    rep = quantization_error_report(new, drifted, drifted.limit(16)).first()
    assert not rep["stale"]
    assert not os.path.isdir(path + "_tmp") and not os.path.isdir(
        path + "_old"
    )


def test_swap_layout_in_heals_mid_swap_crash(spark, tmp_path):
    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.maintenance import (
        _swap_layout_in,
    )

    base = _vecs(spark)
    path = str(tmp_path / "ivf")
    IvfIndex.fit(base, n_clusters=4).save(path)
    # simulate a crash between the two renames: old moved away, tmp gone
    os.rename(path, path + "_old")
    _swap_layout_in(IvfIndex.fit(base, n_clusters=4), path)
    assert os.path.isdir(path)
    assert not os.path.isdir(path + "_old")
    q = [float(x) for x in base.first()["vec"]]
    assert IvfIndex.load(spark, path).search(q, 3).count() == 3


def test_duplicate_layout_names_refuse(spark, tmp_path):
    """r10 second-review finding: by-name execute routing would silently
    run the LAST same-named entry's refit for BOTH rebuild rows — now a
    loud refusal before any signal is read."""
    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.maintenance import (
        run_maintenance,
    )

    base = _vecs(spark)
    idx = IvfIndex.fit(base, n_clusters=4)
    ent = {"name": "same", "index": idx, "build_df": base,
           "recent_df": base.limit(8)}
    with pytest.raises(ValueError, match="duplicate layout name"):
        run_maintenance(spark, [ent, dict(ent)], execute=True)


def test_lsh_layout_joins_staleness_protocol(spark, tmp_path):
    """Round 11: the saved LSH layout implements the two-method
    staleness protocol — fresh slices don't trip, a +1.0 drift does,
    and bad report inputs refuse (the _refuse_report_vectors story)."""
    from custom_vector_database_spark.operators.ann import LshIndex
    from custom_vector_database_spark.operators.pq import (
        quantization_error_report,
    )

    vecs = _vecs(spark)
    idx = LshIndex.fit(vecs, id_col="id", vec_col="vec")
    fresh = quantization_error_report(idx, vecs, vecs.limit(16)).first()
    assert not fresh["stale"] and fresh["err_ratio"] < 1.5
    drift = quantization_error_report(
        idx, vecs, _drift(vecs.limit(16))
    ).first()
    assert drift["stale"] and drift["err_ratio"] > 2.0
    # pin-aware like every protocol layout
    pinned = LshIndex.fit(vecs, id_col="id", vec_col="vec",
                          model_id="emb-v1")
    with pytest.raises(ValueError, match="incompatible spaces"):
        quantization_error_report(
            pinned, vecs, vecs.limit(4), model_id="emb-v2"
        )
    # undecidable report inputs refuse (NULL component / wrong dim)
    bad = spark.createDataFrame(
        [(999, [0.5] * 32)], "id long, vec array<float>"
    )
    with pytest.raises(ValueError, match="wrong-dimension|NULL"):
        quantization_error_report(idx, vecs, bad)


def test_maintenance_plan_prices_lsh_layout(spark, tmp_path):
    """Round 11: maintenance_plan accepts an LSH entry — the one saved
    layout the autopilot couldn't price in r10 — and execute mode
    rebuilds it through the shared crash-safe swap."""
    from custom_vector_database_spark.operators.ann import LshIndex
    from custom_vector_database_spark.operators.maintenance import (
        run_maintenance,
    )
    from custom_vector_database_spark.operators.pq import (
        quantization_error_report,
    )

    vecs = _vecs(spark)
    drifted = _drift(vecs)
    path = str(tmp_path / "lsh")
    LshIndex.fit(vecs, id_col="id", vec_col="vec").save(path)
    idx = LshIndex.load(spark, path)

    calls = []

    def refit():
        calls.append("refit")
        # the refit trains on the data the layout must now serve
        return LshIndex.fit(drifted, id_col="id", vec_col="vec")

    layouts = [{
        "name": "lsh_drifted", "index": idx, "build_df": vecs,
        "recent_df": drifted, "refit": refit, "path": path,
    }, {
        "name": "lsh_fresh", "index": idx, "build_df": vecs,
        "recent_df": vecs.limit(16), "refit": refit, "path": path,
    }]
    plan, executed = run_maintenance(spark, layouts, execute=True)
    actions = {a["target"]: a["action"] for a in plan}
    assert actions["lsh_drifted"] == "rebuild"
    assert actions["lsh_fresh"] == "none"
    assert calls == ["refit"]  # exactly the stale layout was refit
    assert [e["target"] for e in executed] == ["lsh_drifted"]
    assert all(a["kind"] == "layout:LshIndex" for a in plan)
    # the swapped-in layout serves the drifted distribution: not stale
    rebuilt = LshIndex.load(spark, path)
    rep = quantization_error_report(
        rebuilt, drifted, drifted.limit(16)
    ).first()
    assert not rep["stale"]
    assert not os.path.isdir(path + "_old")


def test_gc_surfaces_and_removes_exactly_planted_debris(spark, tmp_path):
    """Round 11: the autopilot's gc action — planted _tmp/_old debris on
    a sidecar corpus AND a saved layout shows up as executable gc plan
    rows, execute removes exactly the listed debris, and the NON-debris
    states (pending rebucket marker tmps, _old without a live frame,
    live frames themselves) are left alone."""
    import shutil

    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.maintenance import (
        maintenance_plan,
        run_maintenance,
    )
    from custom_vector_database_spark.streaming.stream_ops import (
        _MH_REBUCKET_MARKER,
        _MH_SIGS,
        _ensure_fp_sidecar,
        _ensure_mh_sidecar,
        list_sidecar_debris,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < 6).select("doc_id", "text")
    )
    corpus = str(tmp_path / "corpus")
    docs.write.parquet(corpus)
    _ensure_fp_sidecar(
        spark, corpus, os.path.join(corpus, "_fingerprints"), "text", 8
    )
    _ensure_mh_sidecar(spark, corpus, "text", 16, 4, 8)

    # plant: exact _old beside a LIVE frame (safe), exact stray _tmp
    # (safe), minhash _tmp under a PENDING rebucket marker (NOT debris —
    # mid-rebucket tmps belong to the in-flight swap)
    shutil.copytree(
        os.path.join(corpus, "_fingerprints"),
        os.path.join(corpus, "_fingerprints_old"),
    )
    os.makedirs(os.path.join(corpus, "_fingerprints_tmp"))
    os.makedirs(os.path.join(corpus, _MH_SIGS + "_tmp"))
    with open(os.path.join(corpus, _MH_REBUCKET_MARKER), "w"):
        pass

    deb = list_sidecar_debris(corpus)
    assert deb == {
        "exact": ["_fingerprints_old", "_fingerprints_tmp"]
    }  # the marker shields the minhash tmp
    # clear the synthetic mid-rebucket state before running the real
    # verbs: a PRESENT marker tells the heal path the tmps are complete
    # frames to roll forward (the protocol writes it only after both
    # tmps land), which a hand-planted empty tmp is not
    os.remove(os.path.join(corpus, _MH_REBUCKET_MARKER))
    shutil.rmtree(os.path.join(corpus, _MH_SIGS + "_tmp"))

    # layout debris: a saved IVF with a stray _tmp and a safe _old
    vecs = _vecs(spark, 0, 32)
    lpath = str(tmp_path / "ivf")
    IvfIndex.fit(vecs, n_clusters=4).save(lpath)
    idx = IvfIndex.load(spark, lpath)
    os.makedirs(lpath + "_tmp")
    shutil.copytree(lpath, lpath + "_old")

    layouts = [{
        "name": "ivf_gc", "index": idx, "build_df": vecs,
        "recent_df": vecs.limit(8),
    }]
    plan = maintenance_plan(spark, layouts, corpora=[("c", corpus)])
    gc_rows = {a["target"]: a for a in plan if a["action"] == "gc"}
    assert set(gc_rows) == {"c:exact", "ivf_gc"}
    assert gc_rows["c:exact"]["executable"]
    assert gc_rows["c:exact"]["metric"] == 2.0
    assert "_fingerprints_old" in gc_rows["c:exact"]["reason"]
    assert gc_rows["ivf_gc"]["metric"] == 2.0
    # fixed row shape preserved
    documented = {"target", "kind", "action", "metric_name", "metric",
                  "threshold", "blocked", "executable", "reason"}
    assert all(set(a) == documented for a in plan)

    plan2, executed = run_maintenance(
        spark, layouts, corpora=[("c", corpus)], execute=True
    )
    gc_exec = {e["target"]: e for e in executed if e["action"] == "gc"}
    assert set(gc_exec) == {"c:exact", "ivf_gc"}
    assert gc_exec["c:exact"]["removed"] == [
        "_fingerprints_old", "_fingerprints_tmp"
    ]
    assert sorted(gc_exec["ivf_gc"]["removed"]) == ["ivf_old", "ivf_tmp"]
    # exactly the debris is gone; live artifacts stay
    assert not os.path.isdir(os.path.join(corpus, "_fingerprints_old"))
    assert not os.path.isdir(os.path.join(corpus, "_fingerprints_tmp"))
    assert os.path.isdir(os.path.join(corpus, "_fingerprints"))
    assert os.path.isdir(os.path.join(corpus, _MH_SIGS))
    assert os.path.isdir(lpath) and not os.path.isdir(lpath + "_old")
    # idempotent: a re-plan lists no gc rows
    plan3 = maintenance_plan(spark, layouts, corpora=[("c", corpus)])
    assert all(a["action"] != "gc" for a in plan3)


def test_duplicate_corpus_names_refuse(spark, tmp_path):
    """r11 review: two bare dirs sharing a basename would collapse in
    execute's name->dir map and maintain the WRONG corpus."""
    from custom_vector_database_spark.operators.maintenance import (
        maintenance_plan,
    )

    a = tmp_path / "a" / "corpus"
    b = tmp_path / "b" / "corpus"
    for d in (a, b):
        os.makedirs(d)
    with pytest.raises(ValueError, match="duplicate corpus name"):
        maintenance_plan(spark, corpora=[str(a), str(b)])
    # distinct explicit names over the same basenames are fine
    assert maintenance_plan(
        spark, corpora=[("a", str(a)), ("b", str(b))]
    ) == []


def test_execute_skips_lease_held_corpus_and_continues(spark, tmp_path):
    """r11 review: one busy corpus (live writer holds its lease) must
    not abort maintenance everywhere — its actions are recorded as
    skipped and every other target still executes."""
    import json as _json
    import socket

    from custom_vector_database_spark.operators.maintenance import (
        run_maintenance,
    )
    from custom_vector_database_spark.streaming.lease import LEASE_FILE

    busy = _frag_sb_corpus(spark, tmp_path, "busy")
    free = _frag_sb_corpus(spark, tmp_path, "free")
    with open(os.path.join(busy, LEASE_FILE), "w") as f:
        _json.dump({"owner": "other", "epoch": 1, "pid": 1,
                    "host": socket.gethostname(), "verb": "ingest"}, f)
    plan, executed = run_maintenance(
        spark, corpora=[("busy", busy), ("free", free)],
        max_files_per_bucket=1.0, execute=True,
    )
    by = {e["target"]: e for e in executed}
    assert "skipped" in by["busy:signband"]
    assert "another writer" in by["busy:signband"]["skipped"]
    assert by["free:signband"]["action"] == "compact"
    assert "stats" in by["free:signband"]
    os.unlink(os.path.join(busy, LEASE_FILE))


def test_layout_gc_excluded_by_live_swap_lock(spark, tmp_path):
    """r11 review: layout gc takes the install_dir_swap sibling lock, so
    it can never rmtree the tmp a live swap is about to rename in."""
    import json as _json
    import socket

    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.maintenance import (
        run_maintenance,
    )
    from custom_vector_database_spark.streaming.lease import LEASE_FILE

    vecs = _vecs(spark, 0, 32)
    path = str(tmp_path / "ivf")
    IvfIndex.fit(vecs, n_clusters=4).save(path)
    idx = IvfIndex.load(spark, path)
    os.makedirs(path + "_tmp")  # "mid-swap" tmp
    os.makedirs(path + "_lock", exist_ok=True)
    with open(os.path.join(path + "_lock", LEASE_FILE), "w") as f:
        _json.dump({"owner": "swapper", "epoch": 1, "pid": 1,
                    "host": socket.gethostname(),
                    "verb": "install_dir_swap"}, f)
    layouts = [{"name": "ivf", "index": idx, "build_df": vecs,
                "recent_df": vecs.limit(8)}]
    plan, executed = run_maintenance(spark, layouts, execute=True)
    by = {e["target"]: e for e in executed}
    assert "skipped" in by["ivf"]
    assert os.path.isdir(path + "_tmp")  # the live swap's tmp survives
    os.unlink(os.path.join(path + "_lock", LEASE_FILE))
    # lock free: the same gc now removes it
    plan, executed = run_maintenance(spark, layouts, execute=True)
    by = {e["target"]: e for e in executed}
    assert by["ivf"]["removed"] == ["ivf_tmp"]
    assert not os.path.isdir(path + "_tmp")


def test_maintenance_accepts_generator_inputs(spark, tmp_path):
    """r11 second review: one-shot iterables must not silently exhaust
    across the plan's multiple passes (an empty corpus plan would read
    as a clean estate)."""
    from custom_vector_database_spark.operators.maintenance import (
        run_maintenance,
    )

    frag = _frag_sb_corpus(spark, tmp_path, "frag")
    plan, executed = run_maintenance(
        spark,
        corpora=(c for c in [("frag", frag)]),
        max_files_per_bucket=1.0,
        execute=True,
    )
    assert any(a["target"] == "frag:signband" for a in plan)
    assert [e["target"] for e in executed] == ["frag:signband"]


def test_unpinned_layout_surfaces_calibrate_advisory(spark, tmp_path):
    """A layout that supports the recall pin (operators/calibrate.py) but
    carries none gets a 'calibrate' advisory row — never executable,
    ranked between actionable and healthy; pinning it removes the row.
    This is how the loop closes after a rebuild (a refit drops the pin)."""
    from custom_vector_database_spark.operators.calibrate import (
        calibrate_nprobe,
    )
    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.maintenance import (
        maintenance_plan,
        run_maintenance,
    )

    base = _vecs(spark)
    path = str(tmp_path / "ivf")
    IvfIndex.fit(base, n_clusters=4).save(path)
    idx = IvfIndex.load(spark, path)
    layouts = [
        {"name": "l", "index": idx, "build_df": base,
         "recent_df": base.limit(16)},
    ]
    plan = maintenance_plan(spark, layouts)
    by = {(a["target"], a["action"]): a for a in plan}
    row = by[("l", "calibrate")]
    assert not row["executable"] and not row["blocked"]
    assert "calibrate_nprobe" in row["reason"]
    # advisory ranks after actionable (here: nothing actionable) and
    # before the healthy 'none' row
    assert [a["action"] for a in plan] == ["calibrate", "none"]
    # execute mode never touches it
    _, executed = run_maintenance(spark, layouts, execute=True)
    assert executed == []

    # pin the calibration -> the advisory disappears
    qbag = base.limit(4).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    calibrate_nprobe(idx, qbag, k=5, target_recall=0.5, persist=True)
    reloaded = IvfIndex.load(spark, path)
    plan2 = maintenance_plan(
        spark,
        [{"name": "l", "index": reloaded, "build_df": base,
          "recent_df": base.limit(16)}],
    )
    assert [a["action"] for a in plan2] == ["none"]


def test_execute_rebuilds_then_calibrates_the_new_layout(spark, tmp_path):
    """With a calibrate spec in the entry, ONE execute run closes the
    whole loop: the stale quantizer is rebuilt first (rank 1), then the
    calibrate row (rank 2) pins a recall calibration measured on the
    NEWLY INSTALLED layout — reloaded from the path post-swap, never the
    entry's stale handle."""
    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.maintenance import (
        maintenance_plan,
        run_maintenance,
    )

    base = _vecs(spark)
    path = str(tmp_path / "ivf")
    IvfIndex.fit(base, n_clusters=4).save(path)
    idx = IvfIndex.load(spark, path)
    qbag = base.limit(4).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    ent = {
        "name": "l", "index": idx, "build_df": base,
        "recent_df": _drift(base.limit(16)),
        "refit": lambda: IvfIndex.fit(base, n_clusters=4),
        "path": path,
        "calibrate": {"queries": qbag, "k": 5, "target_recall": 0.5},
    }
    plan, executed = run_maintenance(spark, [ent], execute=True)
    assert [a["action"] for a in plan] == ["rebuild", "calibrate"]
    assert all(a["executable"] for a in plan)
    assert [e["action"] for e in executed] == ["rebuild", "calibrate"]
    assert executed[1]["nprobe"] is not None
    assert executed[1]["recall"] >= 0.5
    # the pin landed in the POST-REBUILD meta and the loop is closed:
    # the next plan over the reloaded layout is clean
    new_idx = IvfIndex.load(spark, path)
    assert new_idx.calibration["nprobe"] == executed[1]["nprobe"]
    plan2 = maintenance_plan(
        spark,
        [{"name": "l", "index": new_idx, "build_df": base,
          "recent_df": base.limit(16)}],
    )
    assert [a["action"] for a in plan2] == ["none"]


def test_execute_records_unmet_calibration_as_skipped(spark, tmp_path):
    """A sweep that misses the target refuses to pin; the refusal is
    recorded (with the remedy) instead of aborting the other actions."""
    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.maintenance import (
        run_maintenance,
    )

    base = _vecs(spark)
    path = str(tmp_path / "ivf")
    IvfIndex.fit(base, n_clusters=4).save(path)
    idx = IvfIndex.load(spark, path)
    # deterministic refusal: an EMPTY query bag — calibrate_nprobe
    # raises its "empty query bag" ValueError, which the execute loop
    # must surface as a recorded skip, not an aborted run (a
    # missed-target sweep takes the identical except-ValueError path)
    qbag = base.filter(F.col("id") < 0).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    ent = {
        "name": "l", "index": idx, "build_df": base,
        "recent_df": base.limit(16),
        "path": path,
        "calibrate": {"queries": qbag, "k": 5, "target_recall": 0.9},
    }
    plan, executed = run_maintenance(spark, [ent], execute=True)
    assert [a["action"] for a in plan] == ["calibrate", "none"]
    assert len(executed) == 1
    assert executed[0]["action"] == "calibrate"
    assert "empty query bag" in executed[0]["skipped"]
    # nothing was pinned
    assert IvfIndex.load(spark, path).calibration is None


def test_execute_records_runner_failure_and_continues(spark, tmp_path):
    """r11 third review: a runner error other than a held lease (a refit
    crash, a claim planted between plan and execute) must be recorded
    against ITS action as {'failed': ...} while every other executable
    row still runs — one bad target cannot discard the executed record
    or strand the rest of the estate."""
    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.maintenance import (
        run_maintenance,
    )

    base = _vecs(spark)
    path_a = str(tmp_path / "a")
    path_b = str(tmp_path / "b")
    IvfIndex.fit(base, n_clusters=4).save(path_a)
    IvfIndex.fit(base, n_clusters=4).save(path_b)

    def boom():
        raise RuntimeError("refit exploded")

    ents = [
        {"name": "a", "index": IvfIndex.load(spark, path_a),
         "build_df": base, "recent_df": _drift(base.limit(16)),
         "refit": boom, "path": path_a},
        {"name": "b", "index": IvfIndex.load(spark, path_b),
         "build_df": base, "recent_df": _drift(base.limit(16)),
         "refit": lambda: IvfIndex.fit(base, n_clusters=4),
         "path": path_b},
    ]
    plan, executed = run_maintenance(spark, ents, execute=True)
    by = {e["target"]: e for e in executed if e["action"] == "rebuild"}
    assert "RuntimeError: refit exploded" in by["a"]["failed"]
    assert by["b"].get("failed") is None and by["b"]["path"] == path_b
    # b's rebuild actually landed despite a's failure
    assert IvfIndex.load(spark, path_b).centroids is not None
