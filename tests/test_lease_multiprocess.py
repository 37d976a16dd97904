"""REAL multi-process torture tests for the single-writer lease.

tests/test_writer_lease.py proves the protocol's branches with
in-process simulations (monkeypatched race windows, a dead pid from a
reaped subprocess). These tests complement them with the evidence a
simulation cannot give: N genuinely concurrent OS processes hammering
one lease file, with the classic lock-torture invariant — a
read-sleep-write counter loses updates with near-certainty if two
writers ever overlap, and per-process [enter, exit] critical-section
intervals must never overlap on the shared host clock.

Reference anchor: the reference is implicitly single-process (one CLI,
one JSON file — /root/reference/src/main.cpp:66-70); the lease is what
makes that contract explicit and enforced at 100 TB where scheduled
autopilot runs and ingest streams genuinely race.

No Spark needed: the lease is pure file protocol.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

import pytest

from custom_vector_database_spark.streaming import lease as L

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Child worker: spin on the gate file, then run `iters` critical
# sections under the lease, retrying WriterLeaseHeld (the expected
# contention refusal). Each CS does read-sleep-write on the counter —
# two overlapping writers WILL lose an update — and logs wall-clock
# enter/exit to its own file (no write contention on the log).
_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from custom_vector_database_spark.streaming.lease import (
    acquire_writer_lease, release_writer_lease, WriterLeaseHeld,
)
corpus, counter, gate, log, iters = (
    sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4], int(sys.argv[5]))
deadline = time.time() + 30
while not os.path.exists(gate):
    if time.time() > deadline:
        sys.exit(3)
    time.sleep(0.005)
spans = []
for _ in range(iters):
    deadline = time.time() + 60
    while True:
        try:
            acquire_writer_lease(corpus, "torture")
            break
        except WriterLeaseHeld:
            if time.time() > deadline:
                sys.exit(4)
            time.sleep(0.01)
    try:
        t_in = time.time()
        with open(counter) as f:
            v = int(f.read())
        time.sleep(0.03)  # widen the lost-update window
        with open(counter, "w") as f:
            f.write(str(v + 1))
        t_out = time.time()
        spans.append([t_in, t_out])
    finally:
        release_writer_lease(corpus)
with open(log, "w") as f:
    json.dump(spans, f)
"""


def _spawn_workers(tmp_path, n_procs, iters, plant_lease=None):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    counter = tmp_path / "counter.txt"
    counter.write_text("0")
    gate = tmp_path / "gate"
    if plant_lease is not None:
        (corpus / L.LEASE_FILE).write_text(json.dumps(plant_lease))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO_ROOT))
    procs, logs = [], []
    for i in range(n_procs):
        log = tmp_path / f"spans_{i}.json"
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(corpus), str(counter),
                 str(gate), str(log), str(iters)],
                cwd=REPO_ROOT,
            )
        )
    gate.write_text("go")  # release every worker at once
    for p in procs:
        assert p.wait(timeout=120) == 0, f"worker exited rc={p.returncode}"
    spans = []
    for log in logs:
        spans.extend(json.loads(log.read_text()))
    return corpus, counter, spans


def _assert_mutual_exclusion(spans, expected_sections):
    assert len(spans) == expected_sections
    spans.sort()
    for (_, prev_out), (nxt_in, _) in zip(spans, spans[1:]):
        assert nxt_in >= prev_out, (
            f"two critical sections overlapped: exit {prev_out} > "
            f"next enter {nxt_in}"
        )


def test_real_processes_never_lose_an_update(tmp_path):
    """8 OS processes x 3 read-sleep-write sections on one counter:
    any overlap loses an update (final < 24) with ~certainty given the
    30 ms in-section sleep. Also asserts the logged [enter, exit]
    intervals are pairwise disjoint on the shared host clock."""
    corpus, counter, spans = _spawn_workers(tmp_path, n_procs=8, iters=3)
    assert int(counter.read_text()) == 24
    _assert_mutual_exclusion(spans, expected_sections=24)
    assert not (corpus / L.LEASE_FILE).exists()  # last release cleans up


def test_real_processes_race_the_dead_pid_reclaim(tmp_path):
    """A crashed writer's lease (provably dead pid on this host) is on
    the corpus when 4 real processes race to acquire: the auto-reclaim
    takeover path (token-serialized atomic rename-replace) must admit
    them one at a time, not mint two concurrent winners."""
    dead = subprocess.Popen(["true"])
    dead.wait()
    planted = {
        "owner": "deadbeef", "epoch": 5, "pid": dead.pid,
        "host": socket.gethostname(), "verb": "crashed-ingest",
    }
    corpus, counter, spans = _spawn_workers(
        tmp_path, n_procs=4, iters=2, plant_lease=planted
    )
    assert int(counter.read_text()) == 8
    _assert_mutual_exclusion(spans, expected_sections=8)
    assert not (corpus / L.LEASE_FILE).exists()


def test_real_process_is_fenced_after_cross_process_takeover(tmp_path):
    """Cross-PROCESS epoch fencing: a child acquires and holds; this
    process force-takes the lease; the child's next verify must raise
    (it may not write another byte), and its follow-up release must be
    a clean no-op that leaves the usurper's lease intact."""
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    acquired = tmp_path / "acquired"
    takeover_done = tmp_path / "takeover_done"
    script = tmp_path / "holder.py"
    script.write_text(
        f"""
import os, sys, time
sys.path.insert(0, {REPO_ROOT!r})
from custom_vector_database_spark.streaming.lease import (
    acquire_writer_lease, release_writer_lease, verify_writer_lease,
)
corpus, acquired, takeover_done = sys.argv[1], sys.argv[2], sys.argv[3]
acquire_writer_lease(corpus, "victim")
open(acquired, "w").write("1")
deadline = time.time() + 30
while not os.path.exists(takeover_done):
    if time.time() > deadline:
        sys.exit(3)
    time.sleep(0.005)
try:
    verify_writer_lease(corpus)
    sys.exit(5)  # NOT fenced: the takeover was invisible — a bug
except ValueError:
    pass
# the failed verify abandoned the handle in-process, so release is a
# documented NO-OP — it must return cleanly and must NOT remove the
# usurper's lease (asserted by the parent after we exit)
release_writer_lease(corpus)
sys.exit(0)
"""
    )
    child = subprocess.Popen(
        [sys.executable, str(script), str(corpus), str(acquired),
         str(takeover_done)],
        cwd=REPO_ROOT,
    )
    try:
        deadline = time.time() + 30
        while not acquired.exists():
            assert time.time() < deadline, "child never acquired"
            time.sleep(0.005)
        mine = L.acquire_writer_lease(str(corpus), "usurper", force=True)
        assert mine["epoch"] == 2
        takeover_done.write_text("1")
        assert child.wait(timeout=60) == 0
        # the fenced child's release left the usurper's lease intact
        on_disk = json.loads((corpus / L.LEASE_FILE).read_text())
        assert on_disk["owner"] == mine["owner"]
        assert on_disk["epoch"] == 2
        L.release_writer_lease(str(corpus))
        assert not (corpus / L.LEASE_FILE).exists()
    finally:
        if child.poll() is None:
            child.kill()


def test_stale_remote_holder_is_reclaimed_and_fenced(tmp_path):
    """Cross-HOST lease expiry (round 12): a real child process acquires
    under a FOREIGN host identity (its pid is unprobeable from 'this'
    host by construction), stops heartbeating, and this process ages it
    out via stale_after_s — no force_lease. The takeover bumps the
    epoch, and the old holder's next verify is FENCED; its release is a
    clean no-op that leaves the usurper's lease intact. Before round 12
    this scenario wedged the corpus until an operator forced it."""
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    acquired = tmp_path / "acquired"
    takeover_done = tmp_path / "takeover_done"
    script = tmp_path / "remote_holder.py"
    script.write_text(
        f"""
import os, socket, sys, time
sys.path.insert(0, {REPO_ROOT!r})
socket.gethostname = lambda: "remote-host-x"  # a foreign-host identity
from custom_vector_database_spark.streaming.lease import (
    acquire_writer_lease, release_writer_lease, verify_writer_lease,
)
corpus, acquired, takeover_done = sys.argv[1], sys.argv[2], sys.argv[3]
acquire_writer_lease(corpus, "remote-ingest")  # no heartbeat: 'crashed'
open(acquired, "w").write("1")
deadline = time.time() + 30
while not os.path.exists(takeover_done):
    if time.time() > deadline:
        sys.exit(3)
    time.sleep(0.005)
try:
    verify_writer_lease(corpus)
    sys.exit(5)  # NOT fenced: the expiry takeover was invisible — a bug
except ValueError:
    pass
release_writer_lease(corpus)  # documented no-op after fencing
sys.exit(0)
"""
    )
    child = subprocess.Popen(
        [sys.executable, str(script), str(corpus), str(acquired),
         str(takeover_done)],
        cwd=REPO_ROOT,
    )
    try:
        deadline = time.time() + 30
        while not acquired.exists():
            assert time.time() < deadline, "child never acquired"
            time.sleep(0.005)
        lease_path = corpus / L.LEASE_FILE
        on_disk = json.loads(lease_path.read_text())
        assert on_disk["host"] == "remote-host-x"

        # fresh beat -> the foreign live-ish holder REFUSES (no pid
        # probe possible, not yet stale), with the expiry remedy named
        with pytest.raises(L.WriterLeaseHeld) as ei:
            L.acquire_writer_lease(str(corpus), "contender",
                                   stale_after_s=3600.0)
        assert "last beat" in str(ei.value)

        # age the last beat past the TTL: now reclaimable WITHOUT force
        old = time.time() - 7200
        os.utime(lease_path, (old, old))
        mine = L.acquire_writer_lease(str(corpus), "contender",
                                      stale_after_s=3600.0)
        assert mine["epoch"] == 2  # fencing bump

        takeover_done.write_text("1")
        assert child.wait(timeout=60) == 0
        now_disk = json.loads(lease_path.read_text())
        assert now_disk["owner"] == mine["owner"]
        assert now_disk["epoch"] == 2
        L.release_writer_lease(str(corpus))
        assert not lease_path.exists()
    finally:
        if child.poll() is None:
            child.kill()


def test_live_remote_holder_with_heartbeat_is_never_aged_out(tmp_path):
    """The discriminating half of the TTL: a LIVE foreign-host holder
    whose beat keeps the lease mtime fresh must refuse a contender
    whose stale_after_s the un-beaten age would have exceeded — the
    expiry rule can only ever reclaim a holder that truly stopped
    beating."""
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    acquired = tmp_path / "acquired"
    done = tmp_path / "done"
    script = tmp_path / "beating_holder.py"
    script.write_text(
        f"""
import os, socket, sys, time
sys.path.insert(0, {REPO_ROOT!r})
socket.gethostname = lambda: "remote-host-y"
from custom_vector_database_spark.streaming.lease import writer_lease
corpus, acquired, done = sys.argv[1], sys.argv[2], sys.argv[3]
with writer_lease(corpus, "remote-ingest", heartbeat_s=0.2):
    open(acquired, "w").write("1")
    deadline = time.time() + 30
    while not os.path.exists(done):
        if time.time() > deadline:
            sys.exit(3)
        time.sleep(0.005)
sys.exit(0)
"""
    )
    child = subprocess.Popen(
        [sys.executable, str(script), str(corpus), str(acquired),
         str(done)],
        cwd=REPO_ROOT,
    )
    try:
        deadline = time.time() + 30
        while not acquired.exists():
            assert time.time() < deadline, "child never acquired"
            time.sleep(0.005)
        # un-beaten, a 3 s-old lease would be stale under a 2 s TTL;
        # the 0.2 s beat keeps its age well under it the whole time
        time.sleep(3.0)
        with pytest.raises(L.WriterLeaseHeld):
            L.acquire_writer_lease(str(corpus), "contender",
                                   stale_after_s=2.0)
        done.write_text("1")
        assert child.wait(timeout=60) == 0
        # holder released cleanly -> the corpus is free again
        L.acquire_writer_lease(str(corpus), "contender", stale_after_s=2.0)
        L.release_writer_lease(str(corpus))
    finally:
        if child.poll() is None:
            child.kill()


def test_decorated_verbs_carry_the_corpus_ttl_by_default(tmp_path):
    """The TTL is wired into holds_writer_lease itself — every decorated
    bootstrap/ingest/apply/compact verb reclaims a stale foreign-host
    lease without force_lease and refuses a fresh one with the expiry
    remedy in the message."""
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    lease_path = corpus / L.LEASE_FILE

    @L.holds_writer_lease("test-verb")
    def verb(corpus_dir):
        return L.verify_writer_lease(corpus_dir)["epoch"]

    def plant_foreign():
        lease_path.write_text(json.dumps({
            "owner": "foreign", "epoch": 4, "pid": 12345,
            "host": "remote-host-z", "verb": "ingest:exact",
        }))

    # fresh foreign lease: refuse, and the message teaches the TTL
    plant_foreign()
    with pytest.raises(L.WriterLeaseHeld) as ei:
        verb(str(corpus))
    assert "last beat" in str(ei.value)

    # stale foreign lease: the decorated verb reclaims it by itself
    old = time.time() - 2 * L.CORPUS_LEASE_STALE_S
    os.utime(lease_path, (old, old))
    assert verb(str(corpus)) == 5  # fenced past the foreign epoch 4
    assert not lease_path.exists()  # released on verb exit


def test_heartbeat_runs_on_outermost_hold_only(tmp_path):
    """The stream-long outer hold owns the one beat thread; nested
    per-batch writer_lease re-acquires must not mint another (thread
    count stays flat) while the beat still refreshes the mtime."""
    import threading

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    lease_path = corpus / L.LEASE_FILE
    with L.writer_lease(str(corpus), "outer", heartbeat_s=0.05):
        base_threads = threading.active_count()
        with L.writer_lease(str(corpus), "inner", heartbeat_s=0.05):
            assert threading.active_count() == base_threads
            old = time.time() - 100
            os.utime(lease_path, (old, old))
            time.sleep(0.3)  # the OUTER beat refreshes the backdated mtime
            assert L._lease_age_s(str(lease_path)) < 50
    assert not lease_path.exists()


@pytest.mark.parametrize("n_procs", [6])
def test_real_processes_churn_through_short_sections(tmp_path, n_procs):
    """High-churn variant: zero-iteration sleeps are replaced by many
    short sections (6 procs x 5 sections), maximizing the
    appear/vanish races in acquire's bounded retry loop. The bounded
    loop plus the callers' retry-on-WriterLeaseHeld must still admit
    every section exactly once."""
    corpus, counter, spans = _spawn_workers(tmp_path, n_procs=n_procs,
                                            iters=5)
    assert int(counter.read_text()) == n_procs * 5
    _assert_mutual_exclusion(spans, expected_sections=n_procs * 5)
