"""MaxSimIndex: the saved multi-vector (token) layout for two-stage
late-interaction retrieval (operators/maxsim.py) — recall vs brute
force, batch==single, plan shape (partition pruning both stages, column
pruning on the quantized candidate pass), and the fail-fast guards.

Reference anchor: rebuild-then-search is the reference's own contract
(vectordb.cpp:82-118 -> 120-156); this is its multi-vector form."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from custom_vector_database_spark.operators.maxsim import MaxSimIndex
from custom_vector_database_spark.operators.ranking import (
    maxsim_scores,
    maxsim_scores_many,
)

SF = "/root/testdata/sf0.001"
DOC_TOKS = 8


def _tokens(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    return emb.select(F.expr(f"vec_id DIV {DOC_TOKS}").alias("doc"), "embedding")


def _query_bag(spark, n=8):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


@pytest.fixture(scope="module")
def saved(spark, tmp_path_factory):
    idx = MaxSimIndex.fit(
        _tokens(spark), doc_col="doc", vec_col="embedding",
        n_clusters=16, n_doc_buckets=8,
    )
    path = str(tmp_path_factory.mktemp("maxsim") / "idx")
    idx.save(path)
    return MaxSimIndex.load(spark, path)


def test_fit_save_load_roundtrip_and_describe(spark, saved):
    d = saved.describe()
    assert d["kind"] == "maxsim" and d["saved"]
    assert d["n_tokens"] == _tokens(spark).count()
    assert d["n_clusters"] == 16 and d["dim"] == 64
    # every token indexed exactly once, in a valid cluster
    rows = saved.rows_df()
    agg = rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cluster").alias("cmin"),
        F.max("cluster").alias("cmax"),
        F.min(F.size("scode")).alias("wmin"),
        F.max(F.size("scode")).alias("wmax"),
    ).first()
    assert agg["n"] == d["n_tokens"]
    assert 0 <= agg["cmin"] and agg["cmax"] < 16
    assert agg["wmin"] == agg["wmax"] == 1  # 64 dims -> one code word
    # gather sidecar holds the same token multiset
    assert saved.docs_df().count() == d["n_tokens"]


def test_search_exact_scores_and_recall(spark, saved):
    """Stage 2 is exact: every returned doc carries its TRUE MaxSim
    score (hash-identical to brute force), and at fixture scale the
    two-stage top-10 matches brute force outright."""
    q = _query_bag(spark)
    got = saved.search(q, k=10, nprobe=4, n_candidates=64).collect()
    exact = (
        maxsim_scores(_tokens(spark), q)
        .orderBy(F.desc("score"), F.col("doc").asc())
        .limit(10)
        .collect()
    )
    exact_scores = {r["doc"]: r["score"] for r in exact}
    assert [r["doc"] for r in got] == [r["doc"] for r in exact]
    for r in got:
        assert r["score"] == exact_scores[r["doc"]]  # true scores, bit-equal
        assert r["n_q"] == 8


def test_quantized_candidates_preserve_recall(spark, saved):
    """The sign-code candidate pass ranks by approximate Hamming-cosine
    but stage 2 is the same exact rerank — top-10 still matches brute
    force at this scale."""
    q = _query_bag(spark)
    got = [r["doc"] for r in
           saved.search(q, k=10, nprobe=4, n_candidates=64,
                        quantized=True).collect()]
    exact = [r["doc"] for r in
             maxsim_scores(_tokens(spark), q)
             .orderBy(F.desc("score"), F.col("doc").asc())
             .limit(10).collect()]
    assert len(set(got) & set(exact)) >= 9


def test_search_many_matches_exact_batch(spark, saved):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qt = emb.filter(F.col("vec_id") < 24).select(
        F.expr(f"vec_id DIV {DOC_TOKS}").alias("qid"),
        F.col("vec_id").alias("qtid"),
        F.col("embedding").alias("qvec"),
    )
    exact = {(r["qid"], r["rk"]): (r["doc"], r["score"])
             for r in maxsim_scores_many(_tokens(spark), qt, k=5).collect()}
    # candidate set == every doc -> the pair-restricted exact stage must
    # reproduce brute force bit-for-bit (machinery exactness)
    n_docs = _tokens(spark).select("doc").distinct().count()
    got_all = {(r["qid"], r["rk"]): (r["doc"], r["score"])
               for r in saved.search_many(qt, k=5, nprobe=4,
                                          n_candidates=n_docs).collect()}
    assert got_all == exact  # positions AND true scores
    # pruned candidates (32 of ~63 docs): strong positional recall, and
    # bit-equal true scores wherever positions agree (pruning quality)
    got = {(r["qid"], r["rk"]): (r["doc"], r["score"])
           for r in saved.search_many(qt, k=5, nprobe=4,
                                      n_candidates=32).collect()}
    agree = sum(1 for key, v in exact.items() if got.get(key) == v)
    assert agree >= int(0.8 * len(exact)), (agree, len(exact))
    for qid in {k_[0] for k_ in exact}:
        assert got[(qid, 1)] == exact[(qid, 1)]  # rank-1 anchor survives


def test_search_many_single_query_equals_search(spark, saved):
    q = _query_bag(spark)
    qt = q.select(F.lit(0).alias("qid"), F.col("qid").alias("qtid"), "qvec")
    batch = saved.search_many(qt, k=5, nprobe=4, n_candidates=64).collect()
    single = saved.search(q, k=5, nprobe=4, n_candidates=64).collect()
    assert [(r["doc"], r["score"]) for r in batch] == [
        (r["doc"], r["score"]) for r in single
    ]


def test_stage1_scan_is_partition_pruned_to_probe_union(spark, saved):
    qrows = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < 8
    ).collect()
    probe = saved.probe_union([list(r["embedding"]) for r in qrows], 2)
    assert len(probe) < len(saved.centroids)  # pruning engaged
    plan = (
        saved._pruned_rows(probe)
        ._jdf.queryExecution().executedPlan().toString()
    )
    m = re.search(r"PartitionFilters: \[.*?cluster#\d+ IN \(([^)]*)\)", plan)
    assert m, plan
    assert {int(x) for x in m.group(1).split(",")} == set(probe)


def test_quantized_candidate_scan_skips_float_vectors(spark, saved):
    """Parquet column pruning is the PLAID byte saving: the quantized
    candidate stage must read (doc, scode, cluster) only — never the
    float vector column."""
    qrows = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < 8
    ).collect()
    probe = saved.probe_union([list(r["embedding"]) for r in qrows], 2)
    qd = [{"qvec": list(r["embedding"])} for r in qrows]
    cand = saved._candidate_docs(qd, 2, 32, quantized=True)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scans and all("embedding" not in ln for ln in scans), plan


def test_gather_scan_prunes_doc_buckets_and_pushes_id_filter(spark, saved):
    cand = spark.createDataFrame([(0,), (5,), (9,)], "doc bigint")
    g = saved._gather(cand, 100)
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*?dbkt#\d+ IN \(", plan), plan
    assert re.search(r"PushedFilters: \[.*?In\(doc", plan), plan
    assert {r["doc"] for r in g.select("doc").distinct().collect()} == {0, 5, 9}


def test_guards_fail_fast(spark, saved):
    q = _query_bag(spark)
    with pytest.raises(ValueError, match="max_query_tokens"):
        saved.search(q, k=5, max_query_tokens=2)
    with pytest.raises(ValueError, match="broadcast"):
        saved.search(q, k=5, max_broadcast_bytes=64)
    with pytest.raises(ValueError, match="collide"):
        saved.search(
            q.select(F.col("qid"), F.col("qvec").alias("embedding")),
            qvec_col="embedding",
        )
    with pytest.raises(ValueError, match="max_gather_docs"):
        saved.search(q, k=5, n_candidates=64, max_gather_docs=3)
    with pytest.raises(ValueError, match="dim"):
        saved.search(
            spark.createDataFrame([(0, [1.0, 2.0])], "qid long, qvec array<float>")
        )
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dup = emb.filter(F.col("vec_id") < 4).select(
        F.lit(0).alias("qid"), F.lit(7).alias("qtid"),
        F.col("embedding").alias("qvec"),
    )
    with pytest.raises(ValueError, match="duplicate"):
        saved.search_many(dup, k=3)


def test_maxsim_scores_guards(spark):
    """The query-bag broadcast in the plain operators is guarded too
    (VERDICT r7: the one broadcast in the repo without a limit)."""
    toks = _tokens(spark)
    q = _query_bag(spark)
    with pytest.raises(ValueError, match="max_query_tokens"):
        maxsim_scores(toks, q, max_query_tokens=2)
    with pytest.raises(ValueError, match="broadcast"):
        maxsim_scores(toks, q, max_broadcast_bytes=64)
    with pytest.raises(ValueError, match="collide"):
        maxsim_scores(toks, q.withColumnRenamed("qvec", "embedding"),
                      qvec_col="embedding")
    qt = q.select("qid", F.col("qid").alias("qtid"), "qvec")
    with pytest.raises(ValueError, match="max_query_tokens"):
        maxsim_scores_many(toks, qt, max_query_tokens=2)


def test_fit_rejects_null_and_ragged_tokens(spark):
    bad = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, None)], "doc long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="NULL"):
        MaxSimIndex.fit(bad, n_clusters=2)
    ragged = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])],
        "doc long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="dim"):
        MaxSimIndex.fit(ragged, n_clusters=2)
    with pytest.raises(ValueError, match="empty"):
        MaxSimIndex.fit(bad.limit(0), n_clusters=2)


def test_upsert_delete_compact_crud(spark, tmp_path):
    """Incremental CRUD on the saved token layout (the sibling-family
    contract): upserted docs searchable WITHOUT a rebuild through both
    layout halves; tombstoned docs vanish from search without touching
    part files; tombstoned-id re-upsert refuses with the compact-first
    error; compact shrinks files in BOTH halves and changes nothing."""
    import os

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = MaxSimIndex.fit(
        _tokens(spark), doc_col="doc", vec_col="embedding",
        n_clusters=8, n_doc_buckets=4,
    )
    p = str(tmp_path / "crud")
    idx.save(p)
    idx = MaxSimIndex.load(spark, p)
    q = _query_bag(spark)

    delta = emb.filter(F.col("vec_id") < 8).select(
        F.lit(1_000_000).cast("long").alias("doc"),
        F.expr(
            "transform(embedding, x -> CAST(CAST(x AS DOUBLE) + 0.001D AS FLOAT))"
        ).alias("embedding"),
    )
    pre_mtimes = {
        os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
        for half in ("rows", "docs")
        for dp, _dn, fs in os.walk(os.path.join(p, half))
        for f in fs
        if f.endswith(".parquet")
    }
    assert idx.upsert(delta) == 8
    # upsert appends only: pre-existing part files byte-untouched
    assert all(
        os.path.exists(f) and os.path.getmtime(f) == mt
        for f, mt in pre_mtimes.items()
    )
    hits = idx.search(q, k=3, nprobe=4, n_candidates=32).collect()
    assert 1_000_000 in {r["doc"] for r in hits}  # visible, no rebuild

    assert idx.delete([0]) == 8  # 8 live token rows tombstoned
    hits2 = idx.search(q, k=3, nprobe=4, n_candidates=32).collect()
    assert 0 not in {r["doc"] for r in hits2}
    assert idx.describe()["n_tombstones"] == 1

    with pytest.raises(ValueError, match="compact"):
        idx.upsert(delta.withColumn("doc", F.lit(0).cast("long")))

    stats = idx.compact()
    assert stats["rows"]["files_after"] <= stats["rows"]["files_before"]
    assert stats["docs"]["files_after"] <= stats["docs"]["files_before"]
    assert idx.describe()["n_tombstones"] == 0
    hits3 = idx.search(q, k=3, nprobe=4, n_candidates=32).collect()
    assert [(r["doc"], r["score"]) for r in hits3] == [
        (r["doc"], r["score"]) for r in hits2
    ]
    # reload heals nothing-to-heal and sees the compacted state
    again = MaxSimIndex.load(spark, p)
    assert {r["doc"] for r in
            again.search(q, k=3, nprobe=4, n_candidates=32).collect()} == {
        r["doc"] for r in hits3
    }


def test_stream_ingest_into_maxsim_layout(spark, tmp_path):
    """stream_vector_ingest is index-agnostic (it calls index.upsert per
    micro-batch): streamed token deltas must land in BOTH halves of the
    saved MaxSim layout and become searchable without a rebuild."""
    from pyspark.sql import types as T

    from custom_vector_database_spark.streaming.stream_ops import (
        stream_vector_ingest,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = MaxSimIndex.fit(
        _tokens(spark), doc_col="doc", vec_col="embedding",
        n_clusters=8, n_doc_buckets=4,
    )
    p = str(tmp_path / "stream")
    idx.save(p)
    idx = MaxSimIndex.load(spark, p)

    delta_dir = str(tmp_path / "deltas")
    for i, shift in enumerate([0.001, 0.002]):
        emb.filter(F.col("vec_id") < 8).select(
            F.lit(2_000_000 + i).cast("long").alias("doc"),
            F.expr(
                f"transform(embedding, x -> CAST(CAST(x AS DOUBLE) + {shift}D AS FLOAT))"
            ).alias("embedding"),
        ).coalesce(1).write.mode("append").parquet(delta_dir)
    schema = T.StructType(
        [
            T.StructField("doc", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    n_batches = stream_vector_ingest(
        spark, delta_dir, idx, schema, max_files_per_trigger=1
    )
    assert n_batches >= 1
    got = {
        r["doc"]
        for r in idx.search(
            _query_bag(spark), k=4, nprobe=4, n_candidates=32
        ).collect()
    }
    assert {2_000_000, 2_000_001} <= got  # both streamed docs searchable


def test_empty_query_bag_returns_empty(spark, saved):
    """Degenerate input: an empty query bag probes nothing, gathers
    nothing, and returns an empty frame with the contract schema — not
    an error (maxsim_scores' empty-input convention)."""
    empty = spark.createDataFrame([], "qid bigint, qvec array<float>")
    out = saved.search(empty, k=5)
    assert out.count() == 0
    assert set(out.columns) == {"doc", "score", "n_q"}
    emptyb = spark.createDataFrame([], "qid bigint, qtid bigint, qvec array<float>")
    outb = saved.search_many(emptyb, k=5)
    assert outb.count() == 0
    assert set(outb.columns) == {"qid", "doc", "score", "n_q", "rk"}


def test_broadcast_guard_accounts_for_nprobe_explosion(spark, saved):
    """Stage 1 broadcasts one row per (token, probed cluster): a bag
    that fits the byte bound at nprobe=1 must still be refused when
    nprobe multiplies the exploded side past it."""
    q = _query_bag(spark)  # 8 tokens x 64 dims ~ 2.2 KiB
    saved.search(q, k=3, nprobe=1, max_broadcast_bytes=4096)  # fits
    with pytest.raises(ValueError, match="probes/token"):
        saved.search(q, k=3, nprobe=8, max_broadcast_bytes=4096)


def test_single_bag_duplicate_token_ids_refused(spark, saved):
    """Review finding (r8): search_many refused duplicate (qid, qtid)
    rows but the single-bag search silently collapsed duplicate token
    ids into one MAX group, understating scores. Both verbs now raise."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dup = emb.filter(F.col("vec_id") < 2).select(
        F.lit(3).alias("qid"), F.col("embedding").alias("qvec")
    )
    with pytest.raises(ValueError, match="duplicate"):
        saved.search(dup, k=3)


def test_quantized_broadcast_priced_at_code_width(spark, saved):
    """Review finding (r8): the quantized stage-1 broadcast ships
    ceil(dim/64)-long sign codes (~32x smaller than floats); the byte
    guard must price THAT, not float width — a bound that refuses the
    float bag must still admit the quantized one."""
    q = _query_bag(spark)  # 8 tokens x 64 dims: floats ~2.2 KiB, codes ~260 B
    bound = 8 * (64 * 4 + 24) - 1  # just under the float estimate
    with pytest.raises(ValueError, match="broadcast"):
        saved.search(q, k=3, nprobe=1, max_broadcast_bytes=bound)
    saved.search(q, k=3, nprobe=1, quantized=True,
                 max_broadcast_bytes=bound)  # codes fit the same bound


def test_save_over_existing_layout_is_two_phase_and_consistent(
    spark, tmp_path
):
    """Review finding (ADVICE r8): save() onto an existing layout used
    two in-place overwrites — a crash between them left the halves
    permanently inconsistent. Now: tmp halves + a commit marker holding
    the NEW meta, so (a) a re-save over an existing path round-trips
    with BOTH halves and meta from the new build, (b) a crash BEFORE the
    marker leaves the old layout+meta fully intact, (c) a crash AFTER
    the marker rolls forward at load with layout and meta together."""
    import json
    import os
    import shutil

    from custom_vector_database_spark.operators.maxsim import (
        _SAVE_COMMIT,
        _recover_save_swap,
    )

    toks = _tokens(spark)
    p = str(tmp_path / "idx")
    MaxSimIndex.fit(
        toks, doc_col="doc", vec_col="embedding", n_clusters=8,
        n_doc_buckets=4,
    ).save(p)
    n_docs_v1 = spark.read.parquet(os.path.join(p, "docs")).select(
        "doc"
    ).distinct().count()

    # (a) re-save a SMALLER build over the same path: both halves and
    # meta must come from the new build, atomically
    idx2 = MaxSimIndex.fit(
        toks.filter(F.col("doc") < 10), doc_col="doc", vec_col="embedding",
        n_clusters=4, n_doc_buckets=2,
    )
    idx2.save(p)
    loaded = MaxSimIndex.load(spark, p)
    assert loaded.n_doc_buckets == 2 and len(loaded.centroids) == 4
    for half in ("rows", "docs"):
        got = spark.read.parquet(os.path.join(p, half)).select(
            "doc"
        ).distinct().count()
        assert got == 10 < n_docs_v1
    assert not os.path.exists(os.path.join(p, _SAVE_COMMIT))
    assert not os.path.isdir(os.path.join(p, "rows_save_tmp"))
    # the handle idx2 itself stays usable post-swap (frames re-pointed)
    assert idx2.search(_query_bag(spark), k=3).count() == 3

    # (b) crash BEFORE the marker: stale tmp halves, no marker — load
    # must serve the OLD layout and delete the garbage tmps
    shutil.copytree(os.path.join(p, "rows"), os.path.join(p, "rows_save_tmp"))
    _recover_save_swap(p)
    assert not os.path.isdir(os.path.join(p, "rows_save_tmp"))
    assert MaxSimIndex.load(spark, p).n_doc_buckets == 2

    # (c) crash AFTER the marker (mid-swap: rows renamed away, tmp not
    # yet installed): load rolls FORWARD and installs the marker's meta
    os.rename(os.path.join(p, "rows"), os.path.join(p, "rows_save_old"))
    shutil.copytree(
        os.path.join(p, "docs"), os.path.join(p, "rows_save_tmp")
    )  # stand-in complete tmp (content irrelevant to the swap mechanics)
    with open(os.path.join(p, "meta.json")) as f:
        new_meta = json.load(f)
    new_meta["n_doc_buckets"] = 99  # distinguishable marker meta
    with open(os.path.join(p, _SAVE_COMMIT), "w") as f:
        json.dump(new_meta, f)
    healed = MaxSimIndex.load(spark, p)
    assert healed.n_doc_buckets == 99  # marker meta installed
    assert os.path.isdir(os.path.join(p, "rows"))
    assert not os.path.isdir(os.path.join(p, "rows_save_old"))
    assert not os.path.exists(os.path.join(p, _SAVE_COMMIT))
