"""MultiVectorTable facade: the reference lifecycle contract
(init/add/get/update/delete/rebuild/search, stale-until-rebuild,
monotonic never-reused ids) lifted to token GROUPS — mirrors
tests/test_vector_table.py for the multi-vector layout
(VERDICT r7 item 5)."""

from __future__ import annotations

import pytest

from custom_vector_database_spark import MultiVectorTable
from custom_vector_database_spark.vector_table import DimensionMismatchError


def _mk(spark, tmp_path, name="mv"):
    return MultiVectorTable(spark, str(tmp_path / name)).init(dim=4)


# dyadic components: exact in float32, so bags round-trip bit-identically
BAGS = [
    ([[1.0, 0.0, 0.0, 0.0], [0.875, 0.125, 0.0, 0.0]], '{"t":"a"}'),
    ([[0.0, 1.0, 0.0, 0.0]], None),
    ([[0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.875, 0.125], [0.0, 0.125, 0.875, 0.0]], '{"t":"c"}'),
]


def test_crud_lifecycle_and_id_contract(spark, tmp_path):
    vt = _mk(spark, tmp_path)
    ids = vt.add(BAGS)
    assert ids == [1, 2, 3]  # contiguous from nextId, one id per BAG

    vecs, meta, found = vt.get(1)
    assert found and meta == '{"t":"a"}'
    assert vecs == BAGS[0][0]  # bag round-trips in tok order

    # update replaces the WHOLE bag (shrinking it too)
    assert vt.update(3, [[0.5, 0.5, 0.0, 0.0]], '{"t":"c2"}')
    vecs3, meta3, _ = vt.get(3)
    assert vecs3 == [[0.5, 0.5, 0.0, 0.0]] and meta3 == '{"t":"c2"}'
    assert not vt.update(99, [[1.0, 0.0, 0.0, 0.0]], None)  # absent -> False

    assert vt.delete(2)
    assert vt.get(2) == (None, None, False)
    assert not vt.delete(2)  # already gone

    # ids are never reused after delete (reference vectordb.cpp:43)
    assert vt.add([([[0.0, 1.0, 0.0, 0.0]], None)]) == [4]

    d = vt.describe()
    assert d["n_docs"] == 3 and d["next_id"] == 5 and d["dim"] == 4

    # delete_many: one rewrite, counts only docs that existed
    assert vt.delete_many([1, 2, 4, 77]) == 2
    assert vt.describe()["n_docs"] == 1


def test_init_refusal_and_dim_errors(spark, tmp_path):
    vt = _mk(spark, tmp_path)
    with pytest.raises(FileExistsError):
        MultiVectorTable(spark, vt.path).init(dim=4)
    with pytest.raises(DimensionMismatchError):
        vt.add([([[1.0, 0.0]], None)])
    with pytest.raises(ValueError, match="at least one token"):
        vt.add([([], None)])
    vt.add(BAGS)
    with pytest.raises(DimensionMismatchError):
        vt.update(1, [[1.0]], None)
    with pytest.raises(DimensionMismatchError):
        vt.search([[1.0, 0.0]], k=2)


def test_rebuild_search_and_stale_contract(spark, tmp_path):
    vt = _mk(spark, tmp_path)
    vt.add(BAGS)
    with pytest.raises(RuntimeError, match="rebuild"):
        vt.search([[1.0, 0.0, 0.0, 0.0]], k=2, exact=False)
    vt.rebuild(kind="maxsim", n_clusters=2, n_doc_buckets=2)

    q = BAGS[0][0]  # doc 1's own bag -> doc 1 must rank first
    exact = vt.search(q, k=3, exact=True).collect()
    approx = vt.search(q, k=3, exact=False, nprobe=2, n_candidates=8).collect()
    assert exact[0]["doc"] == approx[0]["doc"] == 1
    assert [(r["doc"], r["score"]) for r in exact] == [
        (r["doc"], r["score"]) for r in approx
    ]  # stage 2 is exact: true scores from the index path too

    # stale-until-rebuild: a doc added AFTER rebuild is visible to the
    # exact path immediately, to the index path only after rebuild()
    new_id = vt.add([([[1.0, 0.0, 0.0, 0.0]], None)])[0]
    fresh = {r["doc"] for r in vt.search(q, k=4, exact=True).collect()}
    stale = {
        r["doc"]
        for r in vt.search(q, k=4, exact=False, nprobe=2,
                           n_candidates=8).collect()
    }
    assert new_id in fresh and new_id not in stale
    vt.rebuild(kind="maxsim", n_clusters=2, n_doc_buckets=2)
    rebuilt = {
        r["doc"]
        for r in vt.search(q, k=4, exact=False, nprobe=2,
                           n_candidates=8).collect()
    }
    assert new_id in rebuilt

    with pytest.raises(ValueError, match="unknown multi-vector index"):
        vt.rebuild(kind="ivf")
    with pytest.raises(ValueError, match="search_stale"):
        vt.search_stale([1.0, 0.0, 0.0, 0.0], 2)


def test_search_many_matches_per_query_search(spark, tmp_path):
    vt = _mk(spark, tmp_path)
    vt.add(BAGS)
    vt.rebuild(kind="maxsim", n_clusters=2, n_doc_buckets=2)
    qrows = [
        (0, t, v) for t, v in enumerate(BAGS[0][0])
    ] + [(1, t, v) for t, v in enumerate(BAGS[2][0])]
    queries = spark.createDataFrame(
        qrows, "qid bigint, qtid bigint, qvec array<float>"
    )
    batch = vt.search_many(queries, k=2, exact=True).collect()
    per = {
        0: vt.search(BAGS[0][0], k=2, exact=True).collect(),
        1: vt.search(BAGS[2][0], k=2, exact=True).collect(),
    }
    for r in batch:
        single = per[r["qid"]][r["rk"] - 1]
        assert (r["doc"], r["score"]) == (single["doc"], single["score"])
    # index path agrees (exact rerank over full bags)
    ibatch = vt.search_many(
        queries, k=2, exact=False, nprobe=2, n_candidates=8
    ).collect()
    assert {(r["qid"], r["rk"], r["doc"], r["score"]) for r in ibatch} == {
        (r["qid"], r["rk"], r["doc"], r["score"]) for r in batch
    }


def test_single_vector_verbs_refused(spark, tmp_path):
    vt = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="single-vector"):
        vt.import_snapshot("/nonexistent.json")
    with pytest.raises(ValueError, match="single-vector"):
        vt.export_snapshot(str(tmp_path / "snap.json"))
    with pytest.raises(NotImplementedError):
        vt.update_many(None)


def test_rebuild_returns_usable_handle_after_swap(spark, tmp_path):
    """Review finding (r8): MaxSimIndex.save used to re-point its frames
    at the save path, so the handle rebuild() returned was bound to the
    renamed-away index_tmp dir and crashed on first use. The returned
    handle must search, describe, and upsert against the SWAPPED-IN
    location."""
    import os

    vt = _mk(spark, tmp_path)
    vt.add(BAGS)
    idx = vt.rebuild(kind="maxsim", n_clusters=2, n_doc_buckets=2)
    assert not os.path.exists(vt._index_path + "_tmp")  # swap completed
    q = spark.createDataFrame(
        [(0, BAGS[0][0][0])], "qid bigint, qvec array<float>"
    )
    hits = idx.search(q, k=2, nprobe=2, n_candidates=8).collect()
    assert hits and hits[0]["doc"] == 1
    assert idx.describe()["saved"]
    # upsert through the handle lands in the swapped-in index dir and is
    # immediately searchable
    delta = spark.createDataFrame(
        [(999, [1.0, 0.0, 0.0, 0.0])], "doc long, vec array<float>"
    )
    assert idx.upsert(delta) == 1
    got = {r["doc"] for r in idx.search(q, k=3, nprobe=2,
                                        n_candidates=8).collect()}
    assert 999 in got
    assert os.path.isdir(os.path.join(vt._index_path, "rows"))
