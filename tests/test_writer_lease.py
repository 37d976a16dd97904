"""Single-writer lease with epoch fencing (streaming/lease.py).

Every dedup-on-ingest correctness proof assumes ONE writer per corpus;
the lease makes that assumption enforced instead of hoped-for:

- conflict refuses loudly with the remedy (per family verb),
- a provably dead pid on this host is reclaimed automatically,
- force_lease=True takes over and the bumped epoch FENCES the old
  holder (verify/release/reentrant-acquire all refuse, file intact),
- reentrant in-process so stream verbs nest their apply functions,
- the lease is held through bootstrap/ingest/compact and released on
  success AND on error.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from custom_vector_database_spark.streaming.lease import (
    LEASE_FILE,
    acquire_writer_lease,
    release_writer_lease,
    verify_writer_lease,
    writer_lease,
)

SF = "/root/testdata/sf0.001"

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _docs(spark, lo=0, hi=6):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .select("doc_id", "text")
    )


def _dead_pid() -> int:
    """A pid that existed a moment ago and is now provably dead."""
    p = subprocess.Popen(["true"])
    p.wait()
    return p.pid


def _plant(corpus: str, pid: int, host: str | None = None,
           epoch: int = 1) -> str:
    os.makedirs(corpus, exist_ok=True)
    path = os.path.join(corpus, LEASE_FILE)
    with open(path, "w") as f:
        json.dump({
            "owner": "foreign-owner", "epoch": epoch, "pid": pid,
            "host": host or socket.gethostname(), "verb": "ingest:exact",
        }, f)
    return path


def test_acquire_release_roundtrip(tmp_path):
    corpus = str(tmp_path / "c")
    path = os.path.join(corpus, LEASE_FILE)
    with writer_lease(corpus, "test") as lease:
        assert os.path.exists(path)
        assert lease["epoch"] == 1
        assert verify_writer_lease(corpus)["owner"] == lease["owner"]
        # reentrant: nested acquire shares the lease, inner release keeps it
        with writer_lease(corpus, "test-inner") as inner:
            assert inner["owner"] == lease["owner"]
        assert os.path.exists(path)
    assert not os.path.exists(path)  # outermost release removes it


def test_conflict_refuses_with_remedy(tmp_path):
    corpus = str(tmp_path / "c")
    _plant(corpus, pid=1)  # pid 1 is always alive
    with pytest.raises(ValueError, match="force_lease=True"):
        acquire_writer_lease(corpus, "ingest:exact")
    # foreign HOST is possibly-alive even with a dead pid: refuse
    corpus2 = str(tmp_path / "c2")
    _plant(corpus2, pid=_dead_pid(), host="some-other-host")
    with pytest.raises(ValueError, match="another writer"):
        acquire_writer_lease(corpus2, "ingest:exact")


def test_dead_pid_auto_reclaims_with_epoch_bump(tmp_path):
    corpus = str(tmp_path / "c")
    _plant(corpus, pid=_dead_pid(), epoch=3)
    lease = acquire_writer_lease(corpus, "ingest:exact")
    try:
        assert lease["epoch"] == 4  # fenced past the crashed holder
        assert lease["pid"] == os.getpid()
    finally:
        release_writer_lease(corpus)
    assert not os.path.exists(os.path.join(corpus, LEASE_FILE))


def test_force_takeover_bumps_epoch(tmp_path):
    corpus = str(tmp_path / "c")
    _plant(corpus, pid=1, epoch=7)
    lease = acquire_writer_lease(corpus, "compact:exact", force=True)
    try:
        assert lease["epoch"] == 8
    finally:
        release_writer_lease(corpus)


def test_fenced_writer_cannot_continue(tmp_path):
    corpus = str(tmp_path / "c")
    path = os.path.join(corpus, LEASE_FILE)
    acquire_writer_lease(corpus, "ingest:exact")
    # another process force-takes-over: simulate by replacing the file
    with open(path, "w") as f:
        json.dump({"owner": "usurper", "epoch": 2, "pid": 1,
                   "host": socket.gethostname(), "verb": "ingest"}, f)
    with pytest.raises(ValueError, match="FENCED"):
        verify_writer_lease(corpus)
    # the fenced holder's release must leave the usurper's lease intact
    acquire_writer_lease(corpus, "ingest:exact", force=True)  # we re-take
    with open(path, "w") as f:
        json.dump({"owner": "usurper2", "epoch": 9, "pid": 1,
                   "host": socket.gethostname(), "verb": "ingest"}, f)
    with pytest.raises(ValueError, match="taken over"):
        release_writer_lease(corpus)
    assert json.load(open(path))["owner"] == "usurper2"
    os.unlink(path)


def test_reentrant_acquire_detects_takeover(tmp_path):
    """The per-micro-batch fencing check: a reentrant acquire under a
    held lease re-reads the file and refuses if the lease moved."""
    corpus = str(tmp_path / "c")
    path = os.path.join(corpus, LEASE_FILE)
    acquire_writer_lease(corpus, "ingest:exact")
    with open(path, "w") as f:
        json.dump({"owner": "usurper", "epoch": 2, "pid": 1,
                   "host": socket.gethostname(), "verb": "ingest"}, f)
    with pytest.raises(ValueError, match="FENCED|taken over"):
        acquire_writer_lease(corpus, "apply:exact")
    os.unlink(path)


# --- verb integration: each family's bootstrap/ingest/compact ----------


def test_exact_family_verbs_take_the_lease(spark, tmp_path):
    from custom_vector_database_spark.streaming.stream_ops import (
        compact_fp_sidecar,
        corpus_ingest_apply_batch,
        stream_corpus_ingest,
    )

    corpus = str(tmp_path / "corpus")
    delta = str(tmp_path / "delta")
    os.makedirs(delta)
    _docs(spark, 0, 4).write.parquet(corpus)
    _docs(spark, 4, 8).write.mode("append").parquet(delta)

    # 1. a live foreign writer refuses the stream verb, apply, compact
    lease_path = _plant(corpus, pid=1)
    with pytest.raises(ValueError, match="another writer"):
        stream_corpus_ingest(spark, delta, corpus, DOC_SCHEMA)
    with pytest.raises(ValueError, match="another writer"):
        corpus_ingest_apply_batch(spark, _docs(spark, 4, 6), 0, corpus)
    with pytest.raises(ValueError, match="another writer"):
        compact_fp_sidecar(spark, corpus)
    os.unlink(lease_path)

    # 2. free lease: the stream verb runs (bootstrap + batches nest
    # reentrantly under ONE lease) and releases on completion
    n = stream_corpus_ingest(spark, delta, corpus, DOC_SCHEMA)
    assert n >= 1
    assert not os.path.exists(lease_path)

    # 3. dead-pid lease auto-reclaims; force_lease=True beats a live one
    _plant(corpus, pid=_dead_pid())
    stats = compact_fp_sidecar(spark, corpus)
    assert stats["n_fps"] == 8
    assert not os.path.exists(lease_path)
    _plant(corpus, pid=1)
    stats = compact_fp_sidecar(spark, corpus, force_lease=True)
    assert stats["n_fps"] == 8
    assert not os.path.exists(lease_path)


@pytest.mark.parametrize("family", ["minhash", "signband"])
def test_two_frame_family_verbs_take_the_lease(spark, tmp_path, family):
    from custom_vector_database_spark.streaming import stream_ops as so

    corpus = str(tmp_path / "corpus")
    lease_path = os.path.join(corpus, LEASE_FILE)
    if family == "minhash":
        _docs(spark, 0, 4).write.parquet(corpus)
        ensure = lambda: so._ensure_mh_sidecar(  # noqa: E731
            spark, corpus, "text", 16, 4, 8
        )
        apply_one = lambda: so.corpus_neardup_apply_batch(  # noqa: E731
            spark, _docs(spark, 4, 6), 0, corpus, n_buckets=8
        )
        compact = so.compact_mh_sidecar
    else:
        emb = (
            spark.read.parquet(f"{SF}/embeddings.parquet")
            .filter(F.col("vec_id") < 4)
            .select(F.col("vec_id").alias("doc_id"), "embedding")
        )
        emb.write.parquet(corpus)
        ensure = lambda: so._ensure_sb_sidecar(  # noqa: E731
            spark, corpus, "doc_id", "embedding", 4, 16, 8
        )
        batch = (
            spark.read.parquet(f"{SF}/embeddings.parquet")
            .filter((F.col("vec_id") >= 4) & (F.col("vec_id") < 6))
            .select(F.col("vec_id").alias("doc_id"), "embedding")
        )
        apply_one = lambda: so.corpus_semdedup_apply_batch(  # noqa: E731
            spark, batch, 0, corpus, n_buckets=8
        )
        compact = so.compact_sb_sidecar

    _plant(corpus, pid=1)
    with pytest.raises(ValueError, match="another writer"):
        ensure()
    os.unlink(lease_path)
    ensure()
    assert not os.path.exists(lease_path)

    _plant(corpus, pid=1)
    with pytest.raises(ValueError, match="another writer"):
        apply_one()
    with pytest.raises(ValueError, match="another writer"):
        compact(spark, corpus)
    os.unlink(lease_path)
    apply_one()
    assert not os.path.exists(lease_path)
    # claims from the direct apply call: clear before compacting
    import glob as _glob

    for c in _glob.glob(os.path.join(corpus, "_*claims", "claim_*")):
        os.remove(c)
    compact(spark, corpus, force_lease=False)
    assert not os.path.exists(lease_path)


def test_lease_released_on_verb_error(spark, tmp_path):
    """A verb that raises mid-run must not wedge the corpus."""
    from custom_vector_database_spark.streaming.stream_ops import (
        _FP_SIDECAR,
        _ensure_fp_sidecar,
        corpus_ingest_apply_batch,
        stream_corpus_ingest,
    )

    corpus = str(tmp_path / "corpus")
    _docs(spark, 0, 4).write.parquet(corpus)
    _ensure_fp_sidecar(
        spark, corpus, os.path.join(corpus, _FP_SIDECAR), "text", 16
    )
    lease_path = os.path.join(corpus, LEASE_FILE)
    null_docs = spark.createDataFrame(
        [(99, None)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="NULL"):
        corpus_ingest_apply_batch(spark, null_docs, 0, corpus)
    assert not os.path.exists(lease_path)
    # and the corpus is immediately writable again
    n = corpus_ingest_apply_batch(spark, _docs(spark, 4, 6), 1, corpus)
    assert n == 2
    for c in __import__("glob").glob(
        os.path.join(corpus, "_ingest_claims", "claim_*")
    ):
        os.remove(c)
    delta = str(tmp_path / "delta")
    os.makedirs(delta)
    _docs(spark, 6, 8).write.mode("append").parquet(delta)
    assert stream_corpus_ingest(spark, delta, corpus, DOC_SCHEMA) >= 1


def test_sidecar_report_skips_heal_under_live_writer(spark, tmp_path):
    """sidecar_report heals a pending rebucket only when the lease is
    free — a live writer owns its own swap."""
    from custom_vector_database_spark.streaming.stream_ops import (
        _MH_REBUCKET_MARKER,
        _ensure_mh_sidecar,
        sidecar_report,
    )

    corpus = str(tmp_path / "corpus")
    _docs(spark, 0, 4).write.parquet(corpus)
    _ensure_mh_sidecar(spark, corpus, "text", 16, 4, 8)
    marker = os.path.join(corpus, _MH_REBUCKET_MARKER)
    with open(marker, "w"):
        pass
    # live foreign writer: report runs, does NOT heal (marker intact)
    lease_path = _plant(corpus, pid=1)
    rep = sidecar_report(spark, corpus)
    assert "minhash" in rep
    assert os.path.exists(marker)
    os.unlink(lease_path)
    # lease free: report heals (marker consumed; no tmps pending -> the
    # heal is the marker removal itself)
    rep = sidecar_report(spark, corpus)
    assert "minhash" in rep
    assert not os.path.exists(marker)
    assert not os.path.exists(lease_path)


def test_acquire_retries_when_holder_vanishes_mid_race(tmp_path,
                                                       monkeypatch):
    """r11 review: os.link fails (lease present) but the holder releases
    before our follow-up read — that is a FREE corpus; acquire must
    retry the create, not refuse with 'another writer (no lease file)'."""
    from custom_vector_database_spark.streaming import lease as L

    corpus = str(tmp_path / "c")
    os.makedirs(corpus)
    path = os.path.join(corpus, LEASE_FILE)

    real_write = L._write_lease_atomic
    calls = {"n": 0}

    def racing_write(p, lease):
        calls["n"] += 1
        if calls["n"] == 1:
            # simulate: someone else's lease existed at link time and
            # vanished before our read
            raise FileExistsError(p)
        return real_write(p, lease)

    monkeypatch.setattr(L, "_write_lease_atomic", racing_write)
    lease = acquire_writer_lease(corpus, "test")
    try:
        assert calls["n"] == 2  # one refused link, one successful retry
        assert lease["epoch"] == 1
    finally:
        release_writer_lease(corpus)
    assert not os.path.exists(path)


def test_conflict_raises_typed_error(tmp_path):
    """WriterLeaseHeld (the acquire-time conflict) is a distinct type so
    deferring callers can catch it without string-matching."""
    from custom_vector_database_spark.streaming.lease import WriterLeaseHeld

    corpus = str(tmp_path / "c")
    _plant(corpus, pid=1)
    with pytest.raises(WriterLeaseHeld):
        acquire_writer_lease(corpus, "ingest:exact")
    # fencing errors are NOT the conflict type (they must never be
    # silently skipped by a deferring caller)
    path = os.path.join(corpus, LEASE_FILE)
    os.unlink(path)
    acquire_writer_lease(corpus, "ingest:exact")
    with open(path, "w") as f:
        json.dump({"owner": "usurper", "epoch": 5, "pid": 1,
                   "host": socket.gethostname(), "verb": "x"}, f)
    with pytest.raises(ValueError) as ei:
        verify_writer_lease(corpus)
    assert not isinstance(ei.value, WriterLeaseHeld)
    os.unlink(path)


def test_stale_after_reclaims_foreign_host_lease(tmp_path):
    """r11 second review: a seconds-long operation's lock must not be
    wedged forever by a crashed foreign-host holder — stale_after_s
    treats an old-enough lease as crashed regardless of host."""
    import time

    corpus = str(tmp_path / "c")
    path = _plant(corpus, pid=1, host="some-other-host", epoch=2)
    os.utime(path, (time.time() - 7200, time.time() - 7200))
    # without the knob: refuse (foreign host, liveness unknown)
    with pytest.raises(ValueError, match="another writer"):
        acquire_writer_lease(corpus, "swap")
    lease = acquire_writer_lease(corpus, "swap", stale_after_s=3600)
    try:
        assert lease["epoch"] == 3  # fenced past the crashed holder
    finally:
        release_writer_lease(corpus)
    # a FRESH foreign lease is NOT stale: still refuses
    path = _plant(corpus, pid=1, host="some-other-host")
    with pytest.raises(ValueError, match="another writer"):
        acquire_writer_lease(corpus, "swap", stale_after_s=3600)
    os.unlink(path)


def test_takeover_replace_is_identity_checked_and_atomic(tmp_path):
    """r11 third review: takeover REPLACES the lease atomically through
    the exclusive claim token — a lease that changed hands since the
    caller read it aborts the takeover untouched (never deleted, never
    transiently absent), and a claim token held by a live claimer makes
    both takeover and removal back off."""
    from custom_vector_database_spark.streaming.lease import (
        _TOKEN_SUFFIX,
        _read_lease,
        _remove_under_token,
        _takeover_replace,
        _write_lease_atomic,
    )

    corpus = str(tmp_path / "c")
    path = _plant(corpus, pid=1, epoch=4)
    mine = _read_lease(path)
    usurper = dict(mine, owner="usurper", epoch=5)
    new = dict(mine, owner="new-owner", epoch=5)
    # expected identity mismatch (the file changed hands): abort, the
    # current lease untouched, and the token cleaned up
    assert _takeover_replace(path, usurper, new) is False
    assert _read_lease(path)["owner"] == "foreign-owner"
    assert not os.path.exists(path + _TOKEN_SUFFIX)
    # a LIVE claimer's token blocks both verbs (one serialization point)
    _write_lease_atomic(
        path + _TOKEN_SUFFIX,
        {"owner": "claimer", "epoch": 9, "pid": os.getpid(),
         "host": socket.gethostname(), "verb": "takeover"},
    )
    assert _takeover_replace(path, mine, new) is False
    assert _remove_under_token(path, mine) is False
    assert _read_lease(path)["owner"] == "foreign-owner"
    os.unlink(path + _TOKEN_SUFFIX)
    # expected identity match: replaced atomically, token consumed
    assert _takeover_replace(path, mine, new) is True
    assert _read_lease(path)["owner"] == "new-owner"
    assert not os.path.exists(path + _TOKEN_SUFFIX)
    # removal under the token: identity match -> removed
    assert _remove_under_token(path, new) is True
    assert not os.path.exists(path)
    # no file at all: takeover aborts cleanly
    assert _takeover_replace(path, new, usurper) is False


def test_heartbeat_keeps_long_held_lock_alive(tmp_path):
    """r11 third review: a long guarded region (install_dir_swap's
    artifact write) must not age past stale_after_s while its holder is
    alive — the heartbeat refreshes the lease mtime, so a second
    acquirer with a staleness budget shorter than the region still
    refuses; once the holder stops beating (crash), age-out works."""
    import time

    from custom_vector_database_spark.streaming.lease import (
        acquire_writer_lease,
        writer_lease,
    )

    corpus = str(tmp_path / "c")
    with writer_lease(corpus, "slow-write", heartbeat_s=0.1):
        path = os.path.join(corpus, LEASE_FILE)
        # simulate "held a long time": push the mtime an hour back and
        # let the beat repair it
        os.utime(path, (time.time() - 3600, time.time() - 3600))
        time.sleep(0.4)
        # the beat repaired the mtime: a stale_after_s=30 acquirer's age
        # check (lease.py acquire loop) sees a FRESH lock, not a stale one
        from custom_vector_database_spark.streaming.lease import (
            _lease_age_s,
        )

        assert _lease_age_s(path) < 30.0
    # crashed holder (no beat): an hour-old foreign lock ages out
    _plant(corpus, pid=1, host="other-host")
    old = time.time() - 3600
    os.utime(os.path.join(corpus, LEASE_FILE), (old, old))
    got = acquire_writer_lease(corpus, "swap", stale_after_s=30)
    assert got["epoch"] == 2
    from custom_vector_database_spark.streaming.lease import (
        release_writer_lease,
    )

    release_writer_lease(corpus)


def test_lease_file_never_absent_across_takeovers(tmp_path):
    """r11 third review: takeover is an atomic rename-REPLACE — across
    hundreds of forced takeovers a concurrent observer must never see
    the lease file missing (the old remove-then-recreate protocol opened
    exactly that hole, letting a fresh acquirer slip a third lease in
    while a live holder still believed it held)."""
    import threading

    from custom_vector_database_spark.streaming.lease import (
        _read_lease,
        _takeover_replace,
    )

    corpus = str(tmp_path / "c")
    path = _plant(corpus, pid=os.getpid(), epoch=1)
    stop = threading.Event()
    holes: list[float] = []

    def watch():
        while not stop.is_set():
            if not os.path.exists(path):
                holes.append(1.0)

    t = threading.Thread(target=watch)
    t.start()
    try:
        for i in range(300):
            current = _read_lease(path)
            new = dict(current, owner=f"o{i}", epoch=current["epoch"] + 1)
            assert _takeover_replace(path, current, new) is True
    finally:
        stop.set()
        t.join()
    assert holes == []
    assert _read_lease(path)["epoch"] == 301


def test_stale_token_clear_has_one_winner(tmp_path):
    """max-review finding: clearing a stale claim token must be an
    exclusive rename-claim, not unlink-by-name — after racer A clears the
    stale token and installs its own FRESH one, racer B must back off,
    never remove A's fresh token."""
    import time

    from custom_vector_database_spark.streaming.lease import (
        _TOKEN_SUFFIX,
        _claim_token,
        _read_lease,
    )

    corpus = str(tmp_path / "c")
    path = _plant(corpus, pid=1)
    token = path + _TOKEN_SUFFIX
    # a STALE token: crashed foreign claimer, 2 minutes old
    with open(token, "w") as f:
        json.dump({"owner": "crashed", "epoch": 3, "pid": 1,
                   "host": "other-host", "verb": "takeover"}, f)
    old = time.time() - 120
    os.utime(token, (old, old))
    a = {"owner": "racer-a", "epoch": 4, "pid": os.getpid(),
         "host": socket.gethostname(), "verb": "takeover"}
    b = {"owner": "racer-b", "epoch": 4, "pid": os.getpid(),
         "host": socket.gethostname(), "verb": "takeover"}
    assert _claim_token(token, a) is True          # A clears + wins
    assert _claim_token(token, b) is False         # B backs off...
    assert _read_lease(token)["owner"] == "racer-a"  # ...A's token intact
    os.unlink(token)
    os.unlink(path)


def test_release_refuses_loudly_when_token_wedged(tmp_path):
    """max-review finding: a crashed-but-live-looking foreign claimer's
    token must not let release silently orphan a live-pid lease — the
    refusal is loud and carries the remedy."""
    from custom_vector_database_spark.streaming.lease import (
        _TOKEN_SUFFIX,
        acquire_writer_lease,
        release_writer_lease,
    )

    corpus = str(tmp_path / "c")
    acquire_writer_lease(corpus, "ingest:exact")
    path = os.path.join(corpus, LEASE_FILE)
    token = path + _TOKEN_SUFFIX
    # a FRESH foreign-host token (live as far as this host can tell)
    with open(token, "w") as f:
        json.dump({"owner": "foreign", "epoch": 9, "pid": 1,
                   "host": "other-host", "verb": "takeover"}, f)
    with pytest.raises(ValueError, match="could not release"):
        release_writer_lease(corpus)
    assert os.path.exists(path)  # the lease file was never unlinked
    os.unlink(token)
    os.unlink(path)


def test_non_numeric_epoch_still_refuses_with_remedy(tmp_path):
    """max-review finding: a hand-edited {"epoch": "five"} lease is valid
    JSON; the conflict path must still raise the typed WriterLeaseHeld
    with the force_lease remedy, and a takeover fences past it."""
    from custom_vector_database_spark.streaming.lease import (
        WriterLeaseHeld,
        acquire_writer_lease,
        release_writer_lease,
    )

    corpus = str(tmp_path / "c")
    path = os.path.join(corpus, LEASE_FILE)
    os.makedirs(corpus, exist_ok=True)
    with open(path, "w") as f:
        json.dump({"owner": "x", "epoch": "five", "pid": 1,
                   "host": socket.gethostname(), "verb": "ingest"}, f)
    with pytest.raises(WriterLeaseHeld, match="force_lease=True"):
        acquire_writer_lease(corpus, "ingest:exact")
    lease = acquire_writer_lease(corpus, "ingest:exact", force=True)
    assert lease["epoch"] == 1  # non-numeric epoch counts as 0
    release_writer_lease(corpus)


def test_stale_clear_restores_a_token_swapped_after_judgment(tmp_path, monkeypatch):
    """r11 fifth review: the staleness/dead-pid judgment is made on a read
    that can be stale by the time the rename lands — if a racer already
    cleared and re-linked its FRESH token in between, the clear must
    detect the body mismatch in the grave and RESTORE it, never keep two
    racers believing they hold the exclusive point."""
    import custom_vector_database_spark.streaming.lease as L

    corpus = str(tmp_path / "c")
    path = _plant(corpus, pid=1)
    token = path + L._TOKEN_SUFFIX
    fresh = {"owner": "fresh-racer", "epoch": 5, "pid": os.getpid(),
             "host": socket.gethostname(), "verb": "takeover"}
    with open(token, "w") as f:
        json.dump(fresh, f)  # the racer's re-linked FRESH token
    stale = {"owner": "crashed", "epoch": 3, "pid": _dead_pid(),
             "host": socket.gethostname(), "verb": "takeover"}
    real = L._read_lease
    first = []

    def stale_first_read(p):
        if p == token and not first:
            first.append(1)
            return dict(stale)  # the judgment read, taken before the swap
        return real(p)

    monkeypatch.setattr(L, "_read_lease", stale_first_read)
    b = {"owner": "racer-b", "epoch": 6, "pid": os.getpid(),
         "host": socket.gethostname(), "verb": "takeover"}
    assert L._claim_token(token, b) is False  # backs off on the live token
    assert real(token)["owner"] == "fresh-racer"  # restored, not destroyed
    os.unlink(token)
    os.unlink(path)


def test_calibration_ground_truth_excludes_tombstoned_rows(spark, tmp_path):
    """r11 fifth review: a user-supplied ground-truth corpus still holds
    rows the index tombstone-deleted; without the live filter the pruned
    search can never reach the target on a corpus with deletes."""
    from pyspark.sql import functions as F

    from custom_vector_database_spark.operators.calibrate import (
        calibrate_nprobe,
    )
    from custom_vector_database_spark.operators.ivf import IvfIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < 128
    )
    path = str(tmp_path / "ivf")
    IvfIndex.fit(emb, id_col="vec_id", vec_col="embedding",
                 n_clusters=4).save(path)
    idx = IvfIndex.load(spark, path)
    idx.delete(list(range(0, 128, 5)))  # tombstone every 5th id
    qbag = emb.filter(F.col("vec_id").isin(1, 2, 3, 4)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    rep = calibrate_nprobe(
        idx, qbag, corpus=emb.select("vec_id", "embedding"),
        corpus_vec="embedding", k=10, target_recall=1.0, full_sweep=True,
    )
    # full probe over LIVE ground truth is exact; with tombstoned rows
    # left in the truth set this capped at ~0.9 and never met the target
    assert rep["steps"][-1]["recall"] == 1.0
    assert rep["met"]


def test_release_raises_fenced_when_takeover_lands_mid_retry(tmp_path):
    """r11 fifth review: a takeover landing DURING the release retry loop
    must raise the same loud fenced signal as one landing before it."""
    import threading
    import time

    from custom_vector_database_spark.streaming.lease import (
        _TOKEN_SUFFIX,
        acquire_writer_lease,
        release_writer_lease,
    )

    corpus = str(tmp_path / "c")
    acquire_writer_lease(corpus, "ingest:exact")
    path = os.path.join(corpus, LEASE_FILE)
    token = path + _TOKEN_SUFFIX
    with open(token, "w") as f:  # wedge the first removal attempt
        json.dump({"owner": "foreign", "epoch": 9, "pid": 1,
                   "host": "other-host", "verb": "takeover"}, f)

    def usurp():
        time.sleep(0.07)  # inside the retry window
        with open(path, "w") as f:
            json.dump({"owner": "usurper", "epoch": 9, "pid": 1,
                       "host": socket.gethostname(), "verb": "ingest"}, f)

    t = threading.Thread(target=usurp)
    t.start()
    try:
        with pytest.raises(ValueError, match="taken over while held"):
            release_writer_lease(corpus)
    finally:
        t.join()
    assert json.load(open(path))["owner"] == "usurper"  # theirs, intact
    os.unlink(token)
    os.unlink(path)


def test_wedged_release_is_retryable_after_clearing_the_token(tmp_path):
    """r11 fifth review: the loud wedged-token refusal must leave the
    registry entry in place so the owner can clear the token and release
    AGAIN — popping first locked the owner out of its own lease."""
    from custom_vector_database_spark.streaming.lease import (
        _TOKEN_SUFFIX,
        acquire_writer_lease,
        release_writer_lease,
        verify_writer_lease,
    )

    corpus = str(tmp_path / "c")
    acquire_writer_lease(corpus, "ingest:exact")
    path = os.path.join(corpus, LEASE_FILE)
    token = path + _TOKEN_SUFFIX
    with open(token, "w") as f:
        json.dump({"owner": "foreign", "epoch": 9, "pid": 1,
                   "host": "other-host", "verb": "takeover"}, f)
    with pytest.raises(ValueError, match="could not release"):
        release_writer_lease(corpus)
    # still the registered owner: verify passes, and after the operator
    # applies the remedy the release completes normally
    assert verify_writer_lease(corpus)["pid"] == os.getpid()
    os.unlink(token)
    release_writer_lease(corpus)
    assert not os.path.exists(path)
