"""Round-13 ADVICE regression tests (see ADVICE.md, r12 judge round):

1. (medium) The writer-lease heartbeat survives transient failures — a
   single os.utime OSError or one corrupt-sentinel read must NOT kill
   the beat forever (a beat dead on one hiccup leaves a live multi-hour
   holder TTL-reclaimable, i.e. two concurrent writers).
2. (low) Outermost-ness for beat-start is decided atomically with the
   acquire (depth returned from under the per-key lock), so two threads
   first-acquiring concurrently cannot BOTH see depth 2 and start no
   beat.
3. (low) The Arrow assign path agrees with the codegen fold on vectors
   containing NULL elements: both yield a NULL cluster, instead of the
   Arrow path silently argmin-ing an all-NaN row to cluster 0. Same for
   the nprobe shortlist and MaxSim's unit-space assign.
"""

from __future__ import annotations

import os
import threading
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- item 1


def _start_beat(tmp_path, heartbeat_s=0.05):
    """Enter writer_lease with a fast heartbeat; return (corpus, path,
    exit_stack_closer)."""
    from custom_vector_database_spark.streaming import lease as L

    corpus = str(tmp_path / "corpus")
    cm = L.writer_lease(corpus, "test", heartbeat_s=heartbeat_s)
    lease = cm.__enter__()
    return corpus, L._lease_path(corpus), lease, cm


def test_beat_survives_transient_utime_failure(tmp_path):
    """ADVICE item 1a: a window where os.utime fails (file briefly
    renamed away) must not kill the beat — once the file is back, the
    mtime keeps advancing."""
    corpus, path, lease, cm = _start_beat(tmp_path)
    try:
        # Induce several failed ticks: move the lease file away so
        # _read_lease -> None... careful: a confirmed-missing file is a
        # legitimate stop. The TRANSIENT utime failure is simulated by
        # making the file unreadable-then-readable instead: write junk
        # (corrupt sentinel => retry), then restore the original body.
        body = open(path).read()
        with open(path, "w") as f:
            f.write("{not json")  # corrupt sentinel from _read_lease
        time.sleep(0.3)  # several ticks hit the sentinel: must retry
        with open(path, "w") as f:
            f.write(body)
        os.utime(path, (1.0, 1.0))  # age the mtime artificially
        deadline = time.time() + 3.0
        while time.time() < deadline and os.stat(path).st_mtime < 2.0:
            time.sleep(0.05)
        assert os.stat(path).st_mtime > 2.0, (
            "heartbeat died on a transient corrupt read instead of "
            "retrying: the lease mtime was never refreshed again"
        )
    finally:
        cm.__exit__(None, None, None)


def test_beat_stops_on_confirmed_takeover(tmp_path):
    """The resilience fix must NOT weaken fencing: a real takeover
    (different owner/epoch in a well-formed lease) still stops the beat
    — the old holder never freshens the new owner's mtime after its
    next tick's check."""
    import json

    corpus, path, lease, cm = _start_beat(tmp_path)
    try:
        other = dict(lease, owner="deadbeef", epoch=lease["epoch"] + 1)
        with open(path, "w") as f:
            json.dump(other, f)
        os.utime(path, (1.0, 1.0))
        time.sleep(0.4)  # several would-be ticks
        assert os.stat(path).st_mtime == 1.0, (
            "a fenced writer kept beating the NEW owner's lease"
        )
    finally:
        with pytest.raises(ValueError):
            cm.__exit__(None, None, None)  # release sees the takeover


def test_concurrent_first_acquire_starts_exactly_one_beat(tmp_path):
    """ADVICE item 2: two threads racing the FIRST acquire of the same
    corpus must start exactly one heartbeat (the winner sees depth 1
    from under the key lock; the reentrant loser sees depth 2). Before
    the fix, the loser's depth bump could land before the winner's
    post-acquire _held_depth() re-query, so BOTH saw 2 and no beat ran."""
    from custom_vector_database_spark.streaming import lease as L

    corpus = str(tmp_path / "corpus2")
    path = L._lease_path(corpus)
    barrier = threading.Barrier(2)
    entered = threading.Barrier(3)
    done = threading.Event()
    errors: list = []

    def hold():
        try:
            barrier.wait(timeout=5)
            with L.writer_lease(corpus, "race", heartbeat_s=0.05):
                entered.wait(timeout=5)
                done.wait(timeout=10)
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    ts = [threading.Thread(target=hold, daemon=True) for _ in range(2)]
    for t in ts:
        t.start()
    entered.wait(timeout=5)  # both holds active (depth 2)
    try:
        os.utime(path, (1.0, 1.0))
        deadline = time.time() + 3.0
        while time.time() < deadline and os.stat(path).st_mtime < 2.0:
            time.sleep(0.05)
        assert os.stat(path).st_mtime > 2.0, (
            "no heartbeat thread ran for a concurrently first-acquired "
            "hold: the lease would be TTL-reclaimable while live"
        )
    finally:
        done.set()
        for t in ts:
            t.join(timeout=10)
    assert not errors, errors


def test_acquire_with_depth_reports_reentrant_depth(tmp_path):
    from custom_vector_database_spark.streaming import lease as L

    corpus = str(tmp_path / "corpus3")
    lease1, d1 = L._acquire_with_depth(corpus, "outer")
    assert d1 == 1
    lease2, d2 = L._acquire_with_depth(corpus, "inner")
    assert d2 == 2 and lease2["owner"] == lease1["owner"]
    L.release_writer_lease(corpus)
    L.release_writer_lease(corpus)
    assert not os.path.exists(L._lease_path(corpus))


# ---------------------------------------------------------------- item 3


def test_arrow_assign_null_elements_match_sql(spark):
    """ADVICE item 3: a vector with a NULL ELEMENT (passes the None/dim
    screen, becomes NaN in numpy) must get a NULL cluster on the Arrow
    path, exactly like the SQL fold — not a silent argmin-to-0."""
    from custom_vector_database_spark.operators.fitting import (
        nearest_centroid_col,
        nprobe_clusters_col,
    )

    cents = [[float(i), float(i)] for i in range(200)]  # k>=192: Arrow path
    df = spark.createDataFrame(
        [(1, [5.0, 5.0]), (2, [None, 5.0]), (3, None)],
        "id int, vec array<double>",
    )
    rows = {
        r["id"]: (r["c_arrow"], r["c_sql"], r["p_arrow"])
        for r in df.select(
            "id",
            nearest_centroid_col("vec", cents, arrow_from=0).alias("c_arrow"),
            nearest_centroid_col("vec", cents, arrow_from=10**9).alias("c_sql"),
            nprobe_clusters_col("vec", cents, 3, arrow_from=0).alias("p_arrow"),
        ).collect()
    }
    assert rows[1][0] == rows[1][1] == 5
    assert rows[1][2] == [5, 4, 6] or rows[1][2][0] == 5
    assert rows[2] == (None, None, None), (
        "NULL-element vector diverged between Arrow and SQL paths"
    )
    assert rows[3] == (None, None, None)


def test_maxsim_unit_assign_null_elements(spark):
    from custom_vector_database_spark.operators.maxsim import (
        _nearest_unit_centroid_col,
    )

    cents = [[1.0, 0.0], [0.0, 1.0]]
    df = spark.createDataFrame(
        [(1, [3.0, 0.0]), (2, [None, 1.0])], "id int, vec array<double>"
    )
    rows = {
        r["id"]: r["c"]
        for r in df.select(
            "id", _nearest_unit_centroid_col("vec", cents, arrow_from=0).alias("c")
        ).collect()
    }
    assert rows[1] == 0
    assert rows[2] is None
