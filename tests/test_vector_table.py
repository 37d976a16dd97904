"""The reference's five end-to-end scenario tests (test.cpp:35-154) ported
to VectorTable, plus the round-2 scalability assertion on batch add.

| Scenario            | Reference      | Here                               |
|---------------------|----------------|------------------------------------|
| Init and Load       | test.cpp:35-51 | test_init_and_load                 |
| Add, Save, and Get  | test.cpp:54-88 | test_add_save_get                  |
| Search              | test.cpp:91-104| test_search                        |
| Delete and Rebuild  | test.cpp:108-127| test_delete_and_rebuild (stale!)  |
| Update and Rebuild  | test.cpp:130-154| test_update_and_rebuild           |
"""

from __future__ import annotations

import json

import pytest

from custom_vector_database_spark.vector_table import (
    DimensionMismatchError,
    VectorTable,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    return VectorTable(spark, str(tmp_path / "tbl"))


def test_init_and_load(spark, tmp_path, tbl):
    tbl.init(dim=2)
    assert tbl.dim() == 2
    # fresh handle on the same path sees the persisted dim (load contract)
    again = VectorTable(spark, str(tmp_path / "tbl"))
    assert again.dim() == 2
    # get on empty table → not found (reference: get(1) on empty db)
    _, found = again.get(1)
    assert not found
    # init refuses to overwrite (vectordb.cpp:24-26)
    with pytest.raises(FileExistsError):
        VectorTable(spark, str(tmp_path / "tbl")).init(dim=3)


def test_add_save_get(spark, tmp_path, tbl):
    tbl.init(dim=2)
    ids = tbl.add([([1.0, 2.0], json.dumps({"name": "first"})),
                   ([3.0, 4.0], json.dumps({"name": "second"}))])
    assert ids == [1, 2]  # ids assigned 1,2 (vectordb.cpp:28,43)
    fresh = VectorTable(spark, str(tmp_path / "tbl"))
    row, found = fresh.get(1)
    assert found
    assert row["vec"] == pytest.approx([1.0, 2.0], abs=1e-5)
    assert json.loads(row["metadata"])["name"] == "first"
    _, found = fresh.get(999)
    assert not found  # missing id → found=false, not an error


def test_search(tbl):
    tbl.init(dim=2)
    tbl.add([([1.0, 1.1], None), ([10.0, 10.1], None)])
    assert tbl.search([1.0, 1.0], 1).collect()[0]["id"] == 1
    assert tbl.search([11.0, 11.0], 1).collect()[0]["id"] == 2
    # k > n returns n rows, no padding (SURVEY §2.3)
    assert tbl.search([0.0, 0.0], 10).count() == 2
    with pytest.raises(DimensionMismatchError):
        tbl.search([1.0, 2.0, 3.0], 1)


def test_delete_and_rebuild(tbl):
    tbl.init(dim=2)
    tbl.add([([1.0, 1.1], None), ([10.0, 10.1], None)])
    tbl.rebuild(num_hash_tables=2)
    assert tbl.delete(1)
    # STALE-INDEX CONTRACT (test.cpp:116-118): the deleted row is still
    # served from the index snapshot until the next rebuild
    assert tbl.search_stale([1.0, 1.0], 1).collect()[0]["id"] == 1
    tbl.rebuild(num_hash_tables=2)
    assert tbl.search_stale([1.0, 1.0], 1).collect()[0]["id"] == 2
    # live exact search never sees the deleted row
    assert tbl.search([1.0, 1.0], 1).collect()[0]["id"] == 2


def test_update_and_rebuild(tbl):
    tbl.init(dim=2)
    tbl.add([([1.0, 1.1], json.dumps({"name": "a"})),
             ([10.0, 10.1], json.dumps({"name": "b"}))])
    tbl.rebuild(num_hash_tables=2)
    assert tbl.update(2, [20.0, 20.0], json.dumps({"name": "b2"}))
    tbl.rebuild(num_hash_tables=2)
    # the old location now misses id 2 (nearest is id 1); new location hits
    assert tbl.search_stale([10.0, 10.1], 1).collect()[0]["id"] == 1
    assert tbl.search_stale([20.0, 20.0], 1).collect()[0]["id"] == 2
    row, _ = tbl.get(2)
    assert json.loads(row["metadata"])["name"] == "b2"
    assert row["vec"] == pytest.approx([20.0, 20.0], abs=1e-5)
    # dimension mismatch on update → hard error; missing id → False
    with pytest.raises(DimensionMismatchError):
        tbl.update(1, [1.0], None)
    assert tbl.update(999, [0.0, 0.0], None) is False


def test_add_batch_parallel_stamping(spark, tbl):
    """VERDICT r1 #5: a large DataFrame batch must be id-stamped without
    collapsing to one partition, and ids must stay contiguous/unique."""
    tbl.init(dim=3)
    batch = spark.range(0, 20000, 1, 8).selectExpr(
        "array(cast(id as float), cast(id+1 as float), cast(id+2 as float)) as vec",
        "cast(null as string) as metadata",
    )
    ids = tbl.add(batch)
    assert ids[0] == 1 and ids[-1] == 20000 and len(ids) == 20000
    # the batch entered stamping with >1 partition (parallel path)
    assert batch.rdd.getNumPartitions() > 1
    stats = tbl.df().selectExpr(
        "min(id) lo", "max(id) hi", "count(*) n", "count(distinct id) d"
    ).collect()[0]
    assert (stats["lo"], stats["hi"], stats["n"], stats["d"]) == (1, 20000, 20000, 20000)


def test_search_metric_plumbing(spark, tmp_path):
    """exact search accepts every operators.knn metric; approximate search
    rejects non-L2 (the MLlib LSH family is euclidean-only)."""
    import pytest as _pytest

    from custom_vector_database_spark.vector_table import VectorTable

    vt = VectorTable(spark, str(tmp_path / "db_metric")).init(dim=2)
    vt.add([([1.0, 0.0], None), ([0.0, 1.0], None)])
    assert vt.search([1.0, 0.1], k=1, metric="dot").collect()[0]["id"] == 1
    assert vt.search([1.0, 0.1], k=1, metric="cosine").collect()[0]["id"] == 1
    vt.rebuild(num_hash_tables=2)  # LSH — euclidean-only
    with _pytest.raises(ValueError):
        vt.search([1.0, 0.1], k=1, exact=False, metric="dot")


def test_search_many_matches_single_searches(spark, tmp_path):
    from pyspark.sql import functions as F

    from custom_vector_database_spark.vector_table import VectorTable

    vt = VectorTable(spark, str(tmp_path / "db_many")).init(dim=3)
    vt.add([([float(i), float(i % 3), 0.0], None) for i in range(30)])
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [25.0, 1.0, 0.0])],
        "qid long, qvec array<double>",
    )
    got = vt.search_many(queries, k=3)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["qid"], []).append(r["id"])
    for qid, qvec in [(0, [1.0, 0.0, 0.0]), (1, [25.0, 1.0, 0.0])]:
        single = [r["id"] for r in vt.search(qvec, k=3).collect()]
        assert by_q[qid] == single
    # broadcast guard trips on an oversized query side
    import pytest as _pytest

    big = spark.range(0, 50).select(
        F.col("id").alias("qid"), F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0)).alias("qvec")
    )
    with _pytest.raises(ValueError):
        vt.search_many(big, k=1, max_query_rows=10)


def test_search_many_rejects_wrong_dim(spark, tmp_path):
    import pytest as _pytest

    from custom_vector_database_spark.vector_table import (
        DimensionMismatchError,
        VectorTable,
    )

    vt = VectorTable(spark, str(tmp_path / "db_dim")).init(dim=3)
    vt.add([([1.0, 0.0, 0.0], None)])
    bad = spark.createDataFrame([(0, [1.0, 0.0])], "qid long, qvec array<double>")
    with _pytest.raises(DimensionMismatchError):
        vt.search_many(bad, k=1)


def test_rebuild_ivf_kind_preserves_reference_contracts(spark, tmp_path):
    """kind='ivf' swaps the LSH model for the cluster-partitioned IVF
    layout behind the SAME VectorTable surface: approximate search
    answers from the rebuild-time snapshot (stale until the next
    rebuild, the reference's contract), search_stale scans that
    snapshot, and the kinds can be swapped back and forth."""
    from custom_vector_database_spark.vector_table import VectorTable

    vt = VectorTable(spark, str(tmp_path / "t")).init(dim=4)
    ids = vt.add(
        [([float(i), 0.0, 0.0, 0.0], None) for i in range(20)]
    )
    vt.rebuild(kind="ivf", n_clusters=4)
    got = vt.search([0.0, 0.0, 0.0, 0.0], k=3, exact=False).collect()
    assert [r["id"] for r in got] == ids[:3]  # nearest by first coord
    # stale contract: a new row is invisible to the index until rebuild
    (new_id,) = vt.add([([0.1, 0.0, 0.0, 0.0], None)])
    stale = {r["id"] for r in vt.search([0.0] * 4, k=3, exact=False).collect()}
    assert new_id not in stale
    stale2 = {r["id"] for r in vt.search_stale([0.0] * 4, k=3).collect()}
    assert new_id not in stale2
    vt.rebuild(kind="ivf", n_clusters=4)
    fresh = {r["id"] for r in vt.search([0.0] * 4, k=3, exact=False).collect()}
    assert new_id in fresh
    # swap back to LSH cleanly over the same path
    vt.rebuild(kind="lsh")
    lsh = {r["id"] for r in vt.search([0.0] * 4, k=3, exact=False).collect()}
    assert new_id in lsh
    import pytest

    with pytest.raises(ValueError, match="unknown index kind"):
        vt.rebuild(kind="hnsw")


# ---------------------------------------------------------------------------
# Round 6: the saved-index metric family through the reference-parity
# facade — rebuild(kind="ivf", metric=...) / search(exact=False) serve
# cosine and dot (MIPS), matching the exact path's answers; and the
# rebuild swap is crash-safe (tmp build + rename, roll-forward/back).
# ---------------------------------------------------------------------------
def _seeded_table(tbl, n=24, dim=4):
    import random

    rng = random.Random(7)
    tbl.init(dim=dim)
    rows = [([rng.uniform(-1, 1) for _ in range(dim)], None) for _ in range(n)]
    tbl.add(rows)
    return [v for v, _ in rows]


@pytest.mark.parametrize("metric", ["l2_sq", "cosine", "dot"])
def test_rebuild_ivf_metric_matches_exact(spark, tmp_path, metric):
    vt = VectorTable(spark, str(tmp_path / "t"))
    vecs = _seeded_table(vt)
    vt.rebuild(kind="ivf", n_clusters=4, metric=metric)
    q = vecs[0]
    exact_ids = [r["id"] for r in vt.search(q, 5, exact=True, metric=metric).collect()]
    # nprobe=8 > n_clusters → the approximate search is exhaustive here,
    # so ids must match the exact path in the same metric exactly
    approx = vt.search(q, 5, exact=False, metric=metric)
    approx_ids = [r["id"] for r in approx.collect()]
    assert approx_ids == exact_ids
    want_col = {"l2_sq": "dist_sq", "cosine": "cos_dist", "dot": "score"}[metric]
    assert want_col in approx.columns
    # stale search reads the same snapshot in the same metric
    stale_ids = [r["id"] for r in vt.search_stale(q, 5).collect()]
    assert stale_ids == exact_ids


def test_metric_mismatch_errors_with_rebuild_hint(spark, tmp_path):
    vt = VectorTable(spark, str(tmp_path / "t"))
    _seeded_table(vt)
    vt.rebuild(kind="ivf", n_clusters=4, metric="cosine")
    with pytest.raises(ValueError, match="rebuild"):
        vt.search([0.0] * 4, 3, exact=False, metric="l2_sq")
    vt.rebuild(kind="lsh")
    with pytest.raises(ValueError, match="l2_sq"):
        vt.search([0.0] * 4, 3, exact=False, metric="cosine")
    with pytest.raises(ValueError, match="lsh"):
        vt.rebuild(kind="lsh", metric="cosine")


def test_rebuild_swap_crash_recovery(spark, tmp_path):
    import os
    import shutil

    vt = VectorTable(spark, str(tmp_path / "t"))
    _seeded_table(vt)
    vt.rebuild(kind="ivf", n_clusters=4)
    q = [0.1, 0.2, 0.3, 0.4]
    want = [r["id"] for r in vt.search(q, 3, exact=False).collect()]

    # crash AFTER the tmp completed but BEFORE the swap: tmp has the kind
    # marker → _load_index must roll FORWARD to it
    idxp = vt._index_path
    shutil.copytree(idxp, idxp + "_tmp")
    shutil.rmtree(idxp)
    assert [r["id"] for r in vt.search(q, 3, exact=False).collect()] == want
    assert os.path.exists(idxp) and not os.path.exists(idxp + "_tmp")

    # crash MID-BUILD: incomplete tmp (no kind marker), old still present
    # → roll BACK to old
    shutil.copytree(idxp, idxp + "_old")
    os.makedirs(idxp + "_tmp")  # incomplete build debris
    shutil.rmtree(idxp)
    assert [r["id"] for r in vt.search(q, 3, exact=False).collect()] == want
    assert os.path.exists(idxp)


def test_rebuild_returns_live_handle(spark, tmp_path):
    """The handle rebuild() returns must point at the swapped-in layout,
    so the incremental verbs (upsert/delete/compact) work on it."""
    from pyspark.sql import functions as F

    vt = VectorTable(spark, str(tmp_path / "t"))
    _seeded_table(vt)
    idx = vt.rebuild(kind="ivf", n_clusters=4)
    assert idx._path == vt._index_path
    assert idx.delete([1]) == 1
    q = [0.1, 0.2, 0.3, 0.4]
    assert all(
        r["id"] != 1 for r in vt.search(q, 24, exact=False).collect()
    )


def test_search_many_approx_matches_exact_when_exhaustive(spark, tmp_path):
    """Batch approximate search through the facade: with nprobe covering
    every cluster the pruned batch path must equal the exact batch path
    per query; an LSH index must refuse with the rebuild hint."""
    from pyspark.sql import functions as F

    vt = VectorTable(spark, str(tmp_path / "t"))
    _seeded_table(vt)
    queries = vt.df().filter(F.col("id") <= 3).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    vt.rebuild(kind="ivf", n_clusters=4)
    exact = vt.search_many(queries, 4)
    approx = vt.search_many(queries, 4, exact=False, nprobe=4)
    keyf = lambda rows: [(r["qid"], r["id"]) for r in rows]
    assert keyf(approx.orderBy("qid", "dist_sq", "id").collect()) == keyf(
        exact.orderBy("qid", "dist_sq", "id").collect()
    )
    vt.rebuild(kind="lsh")
    with pytest.raises(ValueError, match="rebuild"):
        vt.search_many(queries, 4, exact=False)


def test_rebuild_ivfbq_and_search(spark, tmp_path):
    """The facade builds/loads the binary-code layout: approximate
    search answers from the saved codes with exact reranked distances;
    non-l2 metrics refuse with the rebuild hint; a row deleted from the
    table vanishes from approximate results immediately (documented
    divergence from the lsh/ivf stale-copy behavior - BQ codes hold no
    floats to answer from)."""
    from custom_vector_database_spark.vector_table import VectorTable

    t = VectorTable(spark, str(tmp_path / "db")).init(dim=4)
    vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.9, 0.1, 0.0, 0.0],
    ]
    ids = t.add([(v, None) for v in vecs])
    idx = t.rebuild(kind="ivfbq", n_clusters=2)
    assert idx.describe()["kind"] == "ivfbq"
    hits = t.search([1.0, 0.0, 0.0, 0.0], k=2, exact=False).collect()
    assert [r["id"] for r in hits] == [ids[0], ids[3]]
    assert hits[0]["dist_sq"] == 0.0
    with pytest.raises(ValueError, match="l2_sq-only"):
        t.search([1.0, 0.0, 0.0, 0.0], k=2, exact=False, metric="cosine")
    t.delete(ids[3])
    after = {r["id"] for r in t.search([1.0, 0.0, 0.0, 0.0], k=4, exact=False).collect()}
    assert ids[3] not in after and ids[0] in after
    with pytest.raises(ValueError, match="lsh"):
        t.rebuild(kind="hnsw")


def test_search_many_dispatches_to_ivfbq(spark, tmp_path):
    """The facade batch path answers from a saved IVF-BQ layout (review
    finding: it used to refuse with a misleading rebuild hint), and the
    live describe() excludes tombstoned rows."""
    from custom_vector_database_spark.vector_table import VectorTable

    t = VectorTable(spark, str(tmp_path / "db")).init(dim=4)
    vecs = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    ids = t.add([(v, None) for v in vecs])
    idx = t.rebuild(kind="ivfbq", n_clusters=2)
    q = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "qid long, qvec array<float>",
    )
    hits = t.search_many(q, k=1, exact=False).collect()
    got = {r["qid"]: r["id"] for r in hits}
    assert got == {0: ids[0], 1: ids[1]}
    with pytest.raises(ValueError, match="l2_sq-only"):
        t.search_many(q, k=1, exact=False, metric="cosine")
    # live describe: tombstoned rows excluded (review finding)
    assert idx.delete([ids[2]]) == 1
    d = idx.describe()
    assert d["n_rows"] == 2 and d["n_tombstones"] == 1


def test_search_stale_on_ivfbq_refuses_with_route(tbl):
    """The BQ layout stores 1-bit codes only — no snapshot floats exist,
    so search_stale must refuse with the rebuild route, not crash with
    an AttributeError in hashed_df() (ADVICE r6 finding)."""
    tbl.init(dim=64)
    tbl.add([([float(i == j) for i in range(64)], None) for j in range(8)])
    tbl.rebuild(kind="ivfbq", n_clusters=2)
    with pytest.raises(ValueError, match="ivfbq"):
        tbl.search_stale([1.0] + [0.0] * 63, 1)
    # live paths still answer
    assert tbl.search([1.0] + [0.0] * 63, 1).collect()[0]["id"] == 1
