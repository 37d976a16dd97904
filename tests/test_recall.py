"""ANN accuracy contract (SURVEY §4.3): approximate results are judged by
recall against the exact k-NN operator, never by hash equality. The
reference's own HNSW has recall < 1 (ef=k, hnsw.h:117); the bar here is
recall ≥ 0.9 averaged over 20 queries, mirroring typical ANN acceptance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_vector_database_spark.operators import knn as knn_ops
from custom_vector_database_spark.operators.ann import LshIndex, approx_similarity_join

SF = "/root/testdata/sf0.001"
K = 10
N_QUERIES = 20


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def index(emb):
    return LshIndex.fit(emb, id_col="vec_id", vec_col="embedding", num_hash_tables=6)


def test_lsh_recall_vs_exact(spark, emb, index):
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    assert len(queries) == N_QUERIES
    total_recall = 0.0
    for _, qvec in queries:
        exact_ids = {
            r["vec_id"]
            for r in knn_ops.knn(
                emb, qvec, k=K, id_col="vec_id", vec_col="embedding"
            ).collect()
        }
        approx_ids = {r["vec_id"] for r in index.search(qvec, k=K).limit(K).collect()}
        total_recall += len(exact_ids & approx_ids) / K
    avg_recall = total_recall / N_QUERIES
    assert avg_recall >= 0.9, f"LSH recall {avg_recall:.3f} < 0.9"


def test_lsh_search_distances_match_exact_squared_l2(emb, index):
    """The ANN path must report the same metric as the exact path
    (squared L2, reference vectordb.cpp:154)."""
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    exact = {
        r["vec_id"]: r["dist_sq"]
        for r in knn_ops.knn(emb, qvec, k=K, id_col="vec_id", vec_col="embedding").collect()
    }
    for r in index.search(qvec, k=K).collect():
        if r["vec_id"] in exact:
            assert r["dist_sq"] == pytest.approx(exact[r["vec_id"]], abs=1e-4)


def test_ivf_recall_vs_exact(spark, emb):
    """IVF (KMeans + nprobe probing) must also clear the 0.9 recall bar."""
    from custom_vector_database_spark.operators.ivf import IvfIndex

    ivf = IvfIndex.fit(emb, id_col="vec_id", vec_col="embedding", n_clusters=16)
    queries = [
        list(r["embedding"]) for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    total = 0.0
    for qvec in queries:
        exact_ids = {
            r["vec_id"]
            for r in knn_ops.knn(
                emb, qvec, k=K, id_col="vec_id", vec_col="embedding"
            ).collect()
        }
        # nprobe 12/16: this synthetic corpus has weak cluster structure
        # (near-uniform vectors), so true neighbors scatter widely — recall
        # is bought with more probes, exactly the knob IVF exposes.
        approx_ids = {r["vec_id"] for r in ivf.search(qvec, k=K, nprobe=12).collect()}
        total += len(exact_ids & approx_ids) / K
    assert total / len(queries) >= 0.9, f"IVF recall {total/len(queries):.3f} < 0.9"


def test_ivf_save_load_partition_pruning(spark, emb, tmp_path):
    """Persisted IVF index is partitioned by cluster; a probed search scans
    only the probed partitions (PartitionFilters in the plan)."""
    from custom_vector_database_spark.operators.ivf import IvfIndex

    ivf = IvfIndex.fit(emb, id_col="vec_id", vec_col="embedding", n_clusters=8)
    path = str(tmp_path / "ivf")
    ivf.save(path)
    loaded = IvfIndex.load(spark, path)
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    res = loaded.search(qvec, k=5, nprobe=2)
    assert res.count() == 5
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "cluster" in plan  # partition filter on the probed clusters


def test_similarity_join_pairs_are_truly_close(emb, index):
    """Every pair the LSH join returns must satisfy the distance threshold
    (LSH may miss pairs — recall — but must never fabricate them)."""
    thr = 1.2
    pairs = approx_similarity_join(index, index, threshold=thr)
    bad = pairs.filter(F.col("dist") > thr).count()
    assert bad == 0
    assert pairs.filter(F.col("id_a") < F.col("id_b")).count() > 0


@pytest.fixture(scope="module")
def pq(emb):
    from custom_vector_database_spark.operators.pq import PqIndex

    # m=16 one-byte codes per 64-d vector: 16× compression of the ADC scan
    return PqIndex.fit(emb, id_col="vec_id", vec_col="embedding", m=16, k=16)


def test_pq_rerank_recall_vs_exact(spark, emb, pq):
    """ADC candidates + exact rerank must reach the ANN acceptance bar even
    on unclustered random vectors (PQ's worst case). Measured 0.96 at
    rerank=10; asserted with margin. ADC alone is a candidate generator,
    not a ranker — its (lower) recall is asserted only loosely."""
    queries = [
        list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    total_rr = total_adc = 0.0
    for qvec in queries:
        exact_ids = {
            r["vec_id"]
            for r in knn_ops.knn(
                emb, qvec, k=K, id_col="vec_id", vec_col="embedding"
            ).collect()
        }
        adc_ids = {r["vec_id"] for r in pq.search(qvec, k=K).collect()}
        rr_ids = {
            r["vec_id"]
            for r in pq.search(
                qvec, k=K, base_df=emb, vec_col="embedding", rerank=10
            ).collect()
        }
        total_adc += len(adc_ids & exact_ids) / K
        total_rr += len(rr_ids & exact_ids) / K
    assert total_rr / N_QUERIES >= 0.9, f"PQ rerank recall {total_rr / N_QUERIES:.3f}"
    assert total_adc / N_QUERIES >= 0.25, f"ADC recall {total_adc / N_QUERIES:.3f}"


def test_pq_rerank_distances_are_exact(emb, pq):
    """Reranked results carry TRUE squared-L2 distances (the reference's
    API metric) — approximation affects only which candidates are scored."""
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    exact = {
        r["vec_id"]: r["dist_sq"]
        for r in knn_ops.knn(
            emb, qvec, k=50, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    for r in pq.search(qvec, k=K, base_df=emb, vec_col="embedding", rerank=5).collect():
        assert r["dist_sq"] == pytest.approx(exact[r["vec_id"]], abs=1e-4)


def test_pq_save_load_roundtrip(spark, emb, pq, tmp_path):
    from custom_vector_database_spark.operators.pq import PqIndex

    path = str(tmp_path / "pq")
    pq.save(path)
    loaded = PqIndex.load(spark, path)
    assert loaded.m == pq.m and loaded.k == pq.k and loaded.dim == pq.dim
    qvec = list(emb.filter(F.col("vec_id") == 3).first()["embedding"])
    a = [(r["vec_id"], r["dist_sq"]) for r in pq.search(qvec, k=5).collect()]
    b = [(r["vec_id"], r["dist_sq"]) for r in loaded.search(qvec, k=5).collect()]
    assert a == b


def test_pq_rejects_bad_inputs(spark, emb):
    from custom_vector_database_spark.operators.pq import PqIndex

    with pytest.raises(ValueError, match="not divisible"):
        PqIndex.fit(emb, id_col="vec_id", vec_col="embedding", m=7)
    pq = PqIndex.fit(
        emb.limit(50), id_col="vec_id", vec_col="embedding", m=4, k=4
    )
    with pytest.raises(ValueError, match="query dim"):
        pq.search([1.0, 2.0], k=3)


@pytest.fixture(scope="module")
def ivfpq(emb):
    from custom_vector_database_spark.operators.pq import IvfPqIndex

    return IvfPqIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=16, m=16, k=16
    )


def test_ivfpq_recall_and_nprobe_monotonicity(spark, emb, ivfpq):
    """Composed index: IVF pruning bounds recall by the share of true
    neighbors inside probed clusters (random vectors are the worst case —
    no cluster structure), so the bar here is lower than pure PQ's and
    must IMPROVE as nprobe grows. Measured 0.64 @ nprobe=4 / 0.86 @
    nprobe=8 with rerank; asserted with margin."""
    queries = [
        list(r["embedding"]) for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    recalls = {}
    for nprobe in (4, 8):
        total = 0.0
        for qvec in queries:
            exact_ids = {
                r["vec_id"]
                for r in knn_ops.knn(
                    emb, qvec, k=K, id_col="vec_id", vec_col="embedding"
                ).collect()
            }
            got = {
                r["vec_id"]
                for r in ivfpq.search(
                    qvec, k=K, nprobe=nprobe, base_df=emb,
                    vec_col="embedding", rerank=10,
                ).collect()
            }
            total += len(got & exact_ids) / K
        recalls[nprobe] = total / N_QUERIES
    assert recalls[8] >= 0.75, f"IVF-PQ recall {recalls[8]:.3f} @ nprobe=8"
    assert recalls[8] >= recalls[4], f"recall not monotone in nprobe: {recalls}"


def test_ivfpq_save_load_partition_pruned(spark, emb, ivfpq, tmp_path):
    """Saved layout is partitioned by cluster; a probe reads only the
    probed partitions (PartitionFilters, not a full scan)."""
    from custom_vector_database_spark.operators.pq import IvfPqIndex

    path = str(tmp_path / "ivfpq")
    ivfpq.save(path)
    loaded = IvfPqIndex.load(spark, path)
    qvec = list(emb.filter(F.col("vec_id") == 1).first()["embedding"])
    res = loaded.search(qvec, k=5, nprobe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan
    probed = loaded._probe(qvec, 2)
    assert f"cluster#" in plan or all(str(c) in plan for c in probed)
    # same results pre/post persistence
    a = [(r["vec_id"], round(r["dist_sq"], 6)) for r in ivfpq.search(qvec, k=5, nprobe=2).collect()]
    b = [(r["vec_id"], round(r["dist_sq"], 6)) for r in res.collect()]
    assert a == b


def test_sq8_recall_vs_exact(spark, emb):
    """SQ8 int-code preselection + exact rerank: near-lossless — the int8
    grid is fine relative to random-vector distances, so recall@10 with a
    3× rerank should be essentially perfect; bar set at 0.9 with margin."""
    from custom_vector_database_spark.operators.sq import sq8_search

    queries = [
        list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    total = 0.0
    for qvec in queries:
        exact_ids = {
            r["vec_id"]
            for r in knn_ops.knn(
                emb, qvec, k=K, id_col="vec_id", vec_col="embedding"
            ).collect()
        }
        got = {r["vec_id"] for r in sq8_search(emb, qvec, k=K, rerank=3).collect()}
        total += len(exact_ids & got) / K
    assert total / N_QUERIES >= 0.9


def test_ivf_cosine_recall_vs_exact(spark, emb):
    """Cosine IVF (normalize-at-build): recall vs the exact cosine scan.
    Same nprobe rationale as the L2 twin — near-uniform synthetic
    vectors need wide probing."""
    from custom_vector_database_spark.operators.ivf import IvfIndex

    ivf = IvfIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=16,
        metric="cosine",
    )
    queries = [
        list(r["embedding"]) for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    total = 0.0
    for qvec in queries:
        exact_ids = {
            r["vec_id"]
            for r in knn_ops.knn(
                emb, qvec, k=K, id_col="vec_id", vec_col="embedding",
                metric="cosine", dist_col="cos_dist",
            ).collect()
        }
        approx_ids = {r["vec_id"] for r in ivf.search(qvec, k=K, nprobe=12).collect()}
        total += len(exact_ids & approx_ids) / K
    assert total / len(queries) >= 0.9, f"cosine IVF recall {total/len(queries):.3f} < 0.9"


def test_ivf_cosine_distance_matches_exact(spark, emb):
    """The cosine index must report the same metric as the exact cosine
    path (cos_dist = 1 - cosine similarity), not raw unit-space L2²."""
    from custom_vector_database_spark.operators.ivf import IvfIndex

    ivf = IvfIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=4, metric="cosine"
    )
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    exact = {
        r["vec_id"]: r["cos_dist"]
        for r in knn_ops.knn(
            emb, qvec, k=K, id_col="vec_id", vec_col="embedding",
            metric="cosine", dist_col="cos_dist",
        ).collect()
    }
    for r in ivf.search(qvec, k=K, nprobe=4).collect():
        if r["vec_id"] in exact:
            # float32 storage of the normalized vectors costs ~1e-6
            assert r["cos_dist"] == pytest.approx(exact[r["vec_id"]], abs=1e-4)


def test_ivf_search_many_matches_per_query_search(spark, emb, tmp_path):
    """Batch search must return, for every query, exactly what the
    single-query search over the same index and nprobe returns — the
    batch path is a plan generalization, not a different algorithm."""
    from custom_vector_database_spark.operators.ivf import IvfIndex

    ivf = IvfIndex.fit(emb, id_col="vec_id", vec_col="embedding", n_clusters=8)
    path = str(tmp_path / "ivf_many")
    ivf.save(path)
    loaded = IvfIndex.load(spark, path)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    batch = loaded.search_many(queries, k=5, nprobe=3)
    got = {}
    for r in batch.collect():
        got.setdefault(r["qid"], []).append((r["vec_id"], r["dist_sq"]))
    assert set(got) == set(range(5))
    for r in emb.filter(F.col("vec_id") < 5).collect():
        single = [
            (s["vec_id"], s["dist_sq"])
            for s in loaded.search(list(r["embedding"]), k=5, nprobe=3).collect()
        ]
        assert got[r["vec_id"]] == single, r["vec_id"]


def test_ivf_search_many_validates_query_bound(spark, emb):
    from custom_vector_database_spark.operators.ivf import IvfIndex

    ivf = IvfIndex.fit(emb, id_col="vec_id", vec_col="embedding", n_clusters=4)
    queries = emb.limit(10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    with pytest.raises(ValueError, match="max_query_rows"):
        ivf.search_many(queries, k=3, max_query_rows=5)
    # the byte guard catches what the row guard can't: the exploded
    # broadcast side (n_q × nprobe rows of vectors/LUTs)
    with pytest.raises(ValueError, match="max_broadcast_bytes"):
        ivf.search_many(queries, k=3, max_broadcast_bytes=1024)


def test_ivfpq_search_many_validates_broadcast_bytes(spark, emb, ivfpq):
    queries = emb.limit(10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    with pytest.raises(ValueError, match="LUTs"):
        ivfpq.search_many(queries, k=3, max_broadcast_bytes=1024)


def test_ivf_upsert_appends_only_the_delta(spark, emb, tmp_path):
    """Upsert must (1) leave every pre-existing part file untouched,
    (2) add exactly the delta rows, (3) make them searchable without a
    rebuild, (4) refuse to run on an unsaved index."""
    import os

    from custom_vector_database_spark.operators.ivf import IvfIndex

    unsaved = IvfIndex.fit(emb, id_col="vec_id", vec_col="embedding", n_clusters=4)
    delta = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="saved index"):
        unsaved.upsert(delta)

    path = str(tmp_path / "ivf_up")
    unsaved.save(path)
    idx = IvfIndex.load(spark, path)
    rows_dir = os.path.join(path, "rows")
    before = {}
    for root, _dirs, files in os.walk(rows_dir):
        for f in files:
            # data files only: the _SUCCESS marker (and its .crc) is
            # legitimately rewritten by the append job's commit
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            before[p] = os.path.getmtime(p)
    n_before = idx.clustered_df().count()
    assert idx.upsert(delta) == 3
    assert idx.clustered_df().count() == n_before + 3
    # pre-existing files untouched (append-only ingestion)
    for p, mt in before.items():
        assert os.path.exists(p) and os.path.getmtime(p) == mt, p
    # the clones are immediately searchable, no rebuild
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    hits = {r["vec_id"] for r in idx.search(qvec, k=2, nprobe=4).collect()}
    assert hits == {0, 10_000}
    # and a RELOAD of the saved layout sees them too (the append is
    # durable, not just the in-memory view)
    hits2 = {
        r["vec_id"]
        for r in IvfIndex.load(spark, path).search(qvec, k=2, nprobe=4).collect()
    }
    assert hits2 == {0, 10_000}


def test_ivf_cosine_upsert_normalizes_delta(spark, emb, tmp_path):
    """A cosine index must normalize upserted rows in the same way the
    build normalized the base — a raw-magnitude clone at 10x scale lands
    at cos_dist ~ 0 from its original."""
    from custom_vector_database_spark.operators.ivf import IvfIndex

    ivf = IvfIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=4, metric="cosine"
    )
    path = str(tmp_path / "ivf_cos_up")
    ivf.save(path)
    idx = IvfIndex.load(spark, path)
    delta = emb.filter(F.col("vec_id") == 0).select(
        F.lit(10_000).cast("long").alias("vec_id"),
        F.expr("transform(embedding, x -> CAST(x * 10.0 AS FLOAT))").alias("embedding"),
    )
    assert idx.upsert(delta) == 1
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    hits = idx.search(qvec, k=2, nprobe=4).collect()
    assert {r["vec_id"] for r in hits} == {0, 10_000}
    for r in hits:
        assert abs(r["cos_dist"]) < 1e-4  # same direction => cos_dist ~ 0


def test_ivf_dot_recall_vs_exact(spark, emb):
    """MIPS via the augmented-dimension reduction: recall of the pruned
    search against the exact inner-product top-k."""
    from custom_vector_database_spark.functions.vector import dot_product
    from custom_vector_database_spark.operators.ivf import IvfIndex

    ivf = IvfIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=16, metric="dot"
    )
    total = 0.0
    qrows = emb.filter(F.col("vec_id") < N_QUERIES).collect()
    for r in qrows:
        qdf = emb.filter(F.col("vec_id") == r["vec_id"]).select(
            F.col("embedding").alias("qv")
        )
        exact_ids = {
            x["vec_id"]
            for x in emb.join(F.broadcast(qdf))
            .select("vec_id", F.round(dot_product("embedding", "qv"), 6).alias("s"))
            .orderBy(F.desc("s"), "vec_id")
            .limit(K)
            .collect()
        }
        got = {
            x["vec_id"]
            for x in ivf.search(list(r["embedding"]), k=K, nprobe=12).collect()
        }
        total += len(exact_ids & got) / K
    assert total / len(qrows) >= 0.9, f"MIPS recall {total/len(qrows):.3f} < 0.9"


def test_ivf_dot_scores_match_exact_inner_products(spark, emb):
    """The score the dot index reports must equal the true inner product
    (recovered from the augmented distance), not an augmented-space
    artifact — and ordering must be largest-first."""
    from custom_vector_database_spark.functions.vector import dot_product
    from custom_vector_database_spark.operators.ivf import IvfIndex

    ivf = IvfIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=4, metric="dot"
    )
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    exact = {
        r["vec_id"]: r["s"]
        for r in emb.join(F.broadcast(qdf))
        .select("vec_id", F.round(dot_product("embedding", "qv"), 6).alias("s"))
        .collect()
    }
    hits = ivf.search(qvec, k=K, nprobe=4).collect()
    scores = [r["score"] for r in hits]
    assert scores == sorted(scores, reverse=True)
    for r in hits:
        # float32 augmentation storage costs ~1e-5 on the recovered score
        assert r["score"] == pytest.approx(exact[r["vec_id"]], abs=1e-3)


def test_ivfpq_search_many_matches_per_query_adc(spark, emb, ivfpq, tmp_path):
    """Batch ADC must return, for every query, exactly what the
    single-query ADC search over the same saved index and nprobe returns
    — the broadcast-side LUTs are the same math as the driver-side
    literal LUTs, per query."""
    path = str(tmp_path / "ivfpq_many")
    ivfpq.save(path)
    from custom_vector_database_spark.operators.pq import IvfPqIndex

    loaded = IvfPqIndex.load(spark, path)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    batch = loaded.search_many(queries, k=5, nprobe=3)
    got = {}
    for r in batch.collect():
        got.setdefault(r["qid"], []).append((r["vec_id"], round(r["dist_sq"], 6)))
    assert set(got) == set(range(5))
    for r in emb.filter(F.col("vec_id") < 5).collect():
        single = [
            (s["vec_id"], round(s["dist_sq"], 6))
            for s in loaded.search(list(r["embedding"]), k=5, nprobe=3).collect()
        ]
        assert got[r["vec_id"]] == single, r["vec_id"]


def test_ivfpq_search_many_rerank_recall(spark, emb, ivfpq):
    """Reranked batch retrieval recall@10 vs exact — the end-to-end
    quality bar for the compressed batch path."""
    from custom_vector_database_spark.operators import knn as knn_ops

    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    batch = ivfpq.search_many(
        queries, k=10, nprobe=8, base_df=emb, base_vec="embedding", rerank=4
    )
    exact = knn_ops.knn_join(emb, queries, k=10, data_id="vec_id", data_vec="embedding")
    got = {(r["qid"], r["vec_id"]) for r in batch.collect()}
    want = {(r["qid"], r["vec_id"]) for r in exact.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.6, recall
    # reranked distances are exact: spot-check one query against knn
    q0 = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact0 = {
        r["vec_id"]: r["dist_sq"]
        for r in knn_ops.knn(
            emb, q0, k=10, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    for r in batch.collect():
        if r["qid"] == 0 and r["vec_id"] in exact0:
            assert abs(r["dist_sq"] - exact0[r["vec_id"]]) < 1e-9


def test_ivfpq_search_many_validates_query_bound(spark, emb, ivfpq):
    queries = emb.limit(10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    with pytest.raises(ValueError, match="max_query_rows"):
        ivfpq.search_many(queries, k=3, max_query_rows=5)
    with pytest.raises(ValueError, match="base_df"):
        ivfpq.search_many(queries, k=3, rerank=2)


def test_ivfpq_upsert_appends_only_the_delta(spark, emb, ivfpq, tmp_path):
    """IVF-PQ upsert must (1) leave pre-existing code part files
    byte-untouched, (2) append exactly the delta, (3) make the new rows
    retrievable without a rebuild, surviving a reload."""
    import os

    from custom_vector_database_spark.operators.pq import IvfPqIndex

    path = str(tmp_path / "ivfpq_upsert")
    ivfpq.save(path)
    idx = IvfPqIndex.load(spark, path)
    codes_dir = os.path.join(path, "codes")
    pre = {
        os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(codes_dir)
        for f in fs
        if f.endswith(".parquet")
    }
    delta = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 700_000).alias("vec_id"), "embedding"
    )
    n_before = idx.encoded_df().count()
    assert idx.upsert(delta, vec_col="embedding") == 10
    assert idx.encoded_df().count() == n_before + 10
    for p, mtime in pre.items():
        assert os.path.getmtime(p) == mtime, p
    # the exact clone of vec 3 must land in the same cluster with the same
    # codes, so an ADC search on vec 3's vector retrieves both at rank 1-2
    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    hits = [r["vec_id"] for r in idx.search(q, k=2, nprobe=8).collect()]
    assert set(hits) == {3, 700_003}
    # durability: a fresh load sees the upserted rows
    reloaded = IvfPqIndex.load(spark, path)
    assert reloaded.encoded_df().count() == n_before + 10
    # un-saved index refuses upsert
    fresh = IvfPqIndex.fit(
        emb.limit(64), id_col="vec_id", vec_col="embedding", n_clusters=2, m=8, k=4
    )
    with pytest.raises(ValueError, match="saved"):
        fresh.upsert(delta, vec_col="embedding")


def test_ivf_compact_reduces_files_preserves_answers(spark, emb, tmp_path):
    """Compaction is pure layout: file count drops to <= n_clusters ×
    files_per_cluster, row count and search answers are unchanged, and an
    unsaved index refuses to compact."""
    import os

    from custom_vector_database_spark.operators.ivf import IvfIndex

    path = str(tmp_path / "ivf_compact")
    IvfIndex.fit(emb, id_col="vec_id", vec_col="embedding", n_clusters=8).save(path)
    idx = IvfIndex.load(spark, path)
    for i in range(3):  # fragment with three spread-out upserts
        idx.upsert(
            emb.filter(F.col("vec_id") % 3 == i)
            .filter(F.col("vec_id") < 30)
            .select((F.col("vec_id") + 900_000).alias("vec_id"), "embedding")
            .repartition(4)
        )
    n_rows = idx.clustered_df().count()
    q = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    pre = [(r["vec_id"], r["dist_sq"]) for r in idx.search(q, k=8, nprobe=4).collect()]
    stats = idx.compact(files_per_cluster=1)
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] <= 8
    assert stats["n_rows"] == n_rows
    assert idx.clustered_df().count() == n_rows
    post = [(r["vec_id"], r["dist_sq"]) for r in idx.search(q, k=8, nprobe=4).collect()]
    assert post == pre
    # reload sees the compacted layout with identical content
    reloaded = IvfIndex.load(spark, path)
    assert reloaded.clustered_df().count() == n_rows
    with pytest.raises(ValueError, match="files_per_"):
        idx.compact(files_per_cluster=0)
    fresh = IvfIndex.fit(emb.limit(64), id_col="vec_id", vec_col="embedding", n_clusters=2)
    with pytest.raises(ValueError, match="saved"):
        fresh.compact()


def test_ivf_filtered_search_many_matches_filtered_exact(spark, emb, tmp_path):
    """Per-query attribute filtering: every returned row must share the
    query's label, and the result must equal the exact filtered top-k."""
    from custom_vector_database_spark.operators import knn as knn_ops
    from custom_vector_database_spark.operators.ivf import IvfIndex

    idx = IvfIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=8,
        carry_cols=["label"],
    )
    path = str(tmp_path / "ivf_lbl")
    idx.save(path)
    loaded = IvfIndex.load(spark, path)
    assert loaded.carry_cols == ["label"]
    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
    )
    got = loaded.search_many(
        queries, k=4, nprobe=8, filter_map={"label": "qlabel"}
    )
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    rows = got.collect()
    assert {r["qid"] for r in rows} == set(range(6))
    for r in rows:  # constraint honored
        assert labels[r["vec_id"]] == labels[r["qid"]]
    # nprobe = all clusters -> the filtered batch result IS the exact one
    exact = knn_ops.knn_join(
        emb.withColumnRenamed("label", "_lbl"),
        queries,
        k=4,
        data_id="vec_id",
        data_vec="embedding",
        predicate=(F.col("_lbl") == F.col("qlabel")),
    )
    assert {(r["qid"], r["vec_id"]) for r in rows} == {
        (r["qid"], r["vec_id"]) for r in exact.collect()
    }


def test_ivf_carry_cols_validation_and_upsert(spark, emb, tmp_path):
    from custom_vector_database_spark.operators.ivf import IvfIndex

    with pytest.raises(ValueError, match="collide"):
        IvfIndex.fit(
            emb, id_col="vec_id", vec_col="embedding", n_clusters=4,
            carry_cols=["vec_id"],
        )
    idx = IvfIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=4,
        carry_cols=["label"],
    )
    path = str(tmp_path / "ivf_carry")
    idx.save(path)
    idx = IvfIndex.load(spark, path)
    # upsert keeps carrying the attribute
    delta = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 800_000).alias("vec_id"), "embedding", "label"
    )
    idx.upsert(delta)
    carried = idx.clustered_df().filter(F.col("vec_id") >= 800_000)
    assert carried.count() == 5 and carried.filter(F.col("label").isNull()).count() == 0
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
    )
    with pytest.raises(ValueError, match="not in the saved layout"):
        idx.search_many(queries, k=2, filter_map={"missing": "qlabel"})
    with pytest.raises(ValueError, match="collides with a layout"):
        idx.search_many(queries, k=2, filter_map={"label": "label"})


def test_ivfpq_compact_reduces_files_preserves_answers(spark, emb, ivfpq, tmp_path):
    """Code-layout compaction on the compressed index: file count drops,
    rows preserved, ADC answers identical pre/post."""
    from custom_vector_database_spark.operators.pq import IvfPqIndex

    path = str(tmp_path / "ivfpq_c")
    ivfpq.save(path)
    idx = IvfPqIndex.load(spark, path)
    for i in range(3):
        idx.upsert(
            emb.filter((F.col("vec_id") % 3 == i) & (F.col("vec_id") < 30))
            .select((F.col("vec_id") + 910_000).alias("vec_id"), "embedding")
            .repartition(4),
            vec_col="embedding",
        )
    n_rows = idx.encoded_df().count()
    q = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    pre = [(r["vec_id"], round(r["dist_sq"], 6)) for r in idx.search(q, k=8, nprobe=4).collect()]
    stats = idx.compact(files_per_cluster=1)
    assert stats["files_after"] < stats["files_before"]
    assert stats["n_rows"] == n_rows
    assert idx.encoded_df().count() == n_rows
    post = [(r["vec_id"], round(r["dist_sq"], 6)) for r in idx.search(q, k=8, nprobe=4).collect()]
    assert post == pre


def test_ivf_load_heals_interrupted_compact_swap(spark, emb, tmp_path):
    """A crash between compact's two renames must be healed by plain
    load() — roll back when the rewrite never completed, roll forward
    when it did — with no hand-renaming of directories."""
    import os
    import shutil

    from custom_vector_database_spark.operators.ivf import IvfIndex

    path = str(tmp_path / "ivf_heal")
    IvfIndex.fit(emb, id_col="vec_id", vec_col="embedding", n_clusters=4).save(path)
    rows = os.path.join(path, "rows")
    n = IvfIndex.load(spark, path).clustered_df().count()

    # crash AFTER rename(rows -> old), BEFORE the new layout landed
    os.rename(rows, rows + "_compact_old")
    healed = IvfIndex.load(spark, path)  # rolls back
    assert healed.clustered_df().count() == n

    # crash after a COMPLETE rewrite (tmp has _SUCCESS) but before swap-in
    healed.compact(files_per_cluster=1)
    os.rename(rows, rows + "_compact_tmp")  # complete dir w/ _SUCCESS
    shutil.rmtree(rows + "_compact_old", ignore_errors=True)
    os.makedirs(rows + "_compact_old")  # the half-swap leftover
    healed2 = IvfIndex.load(spark, path)  # rolls forward
    assert healed2.clustered_df().count() == n


def test_ivfpq_cosine_recall_and_distances(spark, emb, tmp_path):
    """Cosine IVF-PQ: reranked recall vs exact cosine k-NN clears the ANN
    bar; reranked distances are TRUE cosine distances; batch path agrees
    with the single-query path; upserted clones normalize."""
    from custom_vector_database_spark.operators.pq import IvfPqIndex

    idx = IvfPqIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=16, m=16, k=16,
        metric="cosine",
    )
    queries = [
        list(r["embedding"]) for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    total = 0.0
    for qvec in queries:
        exact = knn_ops.knn(
            emb, qvec, k=K, id_col="vec_id", vec_col="embedding", metric="cosine",
            dist_col="cos_dist",
        )
        exact_ids = {r["vec_id"] for r in exact.collect()}
        got = idx.search(
            qvec, k=K, nprobe=12, base_df=emb, vec_col="embedding", rerank=10
        )
        got_rows = got.collect()
        total += len({r["vec_id"] for r in got_rows} & exact_ids) / K
        assert got.columns == ["vec_id", "cos_dist"]
    assert total / len(queries) >= 0.9, f"cosine IVF-PQ recall {total/len(queries):.3f}"
    # reranked distances are exact cosine distances
    q0 = queries[0]
    exact0 = {
        r["vec_id"]: r["cos_dist"]
        for r in knn_ops.knn(
            emb, q0, k=50, id_col="vec_id", vec_col="embedding", metric="cosine",
            dist_col="cos_dist",
        ).collect()
    }
    for r in idx.search(q0, k=K, nprobe=12, base_df=emb, vec_col="embedding", rerank=5).collect():
        assert r["cos_dist"] == pytest.approx(exact0[r["vec_id"]], abs=1e-4)
    # batch == per-query on the saved index
    path = str(tmp_path / "ivfpq_cos")
    idx.save(path)
    loaded = IvfPqIndex.load(spark, path)
    assert loaded.metric == "cosine"
    qdf = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    batch = loaded.search_many(qdf, k=5, nprobe=3)
    got = {}
    for r in batch.collect():
        got.setdefault(r["qid"], []).append((r["vec_id"], round(r["cos_dist"], 6)))
    for r in emb.filter(F.col("vec_id") < 4).collect():
        single = [
            (s["vec_id"], round(s["cos_dist"], 6))
            for s in loaded.search(list(r["embedding"]), k=5, nprobe=3).collect()
        ]
        assert got[r["vec_id"]] == single, r["vec_id"]


def test_ivf_guards_null_vectors_and_bad_dims(spark, emb, tmp_path):
    """ANSI-mode size(NULL) is NULL, so the dim guard must catch NULL
    vectors explicitly; wrong-dim single-query search must error, not
    return NULL-distance garbage; query column names colliding with the
    layout must raise clearly."""
    from pyspark.sql import Row

    from custom_vector_database_spark.operators.ivf import IvfIndex

    idx = IvfIndex.fit(emb, id_col="vec_id", vec_col="embedding", n_clusters=4)
    path = str(tmp_path / "ivf_guard")
    idx.save(path)
    idx = IvfIndex.load(spark, path)
    null_delta = spark.createDataFrame(
        [Row(vec_id=999_001, embedding=None)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="NULL or do not have dim"):
        idx.upsert(null_delta)
    with pytest.raises(ValueError, match="query dim"):
        idx.search([1.0, 2.0], k=3)
    qcollide = emb.limit(2).select(
        F.col("vec_id").alias("qid"), F.col("embedding")
    )
    with pytest.raises(ValueError, match="collides with a layout"):
        idx.search_many(qcollide, k=2, query_vec="embedding")


def test_ivfpq_dot_recall_and_scores(spark, emb, tmp_path):
    """MIPS IVF-PQ: reranked recall vs exact inner-product top-k clears
    the bar; reranked scores are TRUE inner products; batch path agrees
    with single-query on the saved layout."""
    from custom_vector_database_spark.functions.vector import dot_product
    from custom_vector_database_spark.operators.pq import IvfPqIndex

    # 64-d + augmented coordinate = 65 -> m must divide 65: m=13
    idx = IvfPqIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=16, m=13, k=16,
        metric="dot",
    )
    assert idx.dim == 65 and idx.max_norm is not None
    queries = [
        list(r["embedding"]) for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    total = 0.0
    for qvec in queries:
        exact_ids = {
            r["vec_id"]
            for r in knn_ops.knn(
                emb, qvec, k=K, id_col="vec_id", vec_col="embedding",
                metric="dot", dist_col="_nd", round_to=None,
            ).collect()
        }
        got = idx.search(
            qvec, k=K, nprobe=12, base_df=emb, vec_col="embedding", rerank=10
        )
        assert got.columns == ["vec_id", "score"]
        total += len({r["vec_id"] for r in got.collect()} & exact_ids) / K
    assert total / len(queries) >= 0.9, f"dot IVF-PQ recall {total/len(queries):.3f}"
    # reranked scores are true inner products, largest first
    q0 = queries[0]
    qdf0 = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    true0 = {
        r["vec_id"]: r["dp"]
        for r in emb.join(F.broadcast(qdf0))
        .select("vec_id", F.round(dot_product("embedding", "q"), 6).alias("dp"))
        .collect()
    }
    rows = idx.search(q0, k=K, nprobe=12, base_df=emb, vec_col="embedding", rerank=5).collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["score"] == pytest.approx(true0[r["vec_id"]], abs=1e-4)
    # batch == single-query on the saved layout (+ upsert keeps the metric)
    path = str(tmp_path / "ivfpq_dot")
    idx.save(path)
    loaded = IvfPqIndex.load(spark, path)
    assert loaded.metric == "dot" and loaded.max_norm == idx.max_norm
    qdf = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    batch = loaded.search_many(qdf, k=5, nprobe=3)
    got = {}
    for r in batch.collect():
        got.setdefault(r["qid"], []).append((r["vec_id"], round(r["score"], 5)))
    for r in emb.filter(F.col("vec_id") < 4).collect():
        single = [
            (s["vec_id"], round(s["score"], 5))
            for s in loaded.search(list(r["embedding"]), k=5, nprobe=3).collect()
        ]
        assert got[r["vec_id"]] == single, r["vec_id"]
    delta = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 920_000).alias("vec_id"), "embedding"
    )
    assert loaded.upsert(delta, vec_col="embedding") == 3
    hits = {r["vec_id"] for r in loaded.search(
        list(emb.filter(F.col("vec_id") == 1).first()["embedding"]),
        k=60, nprobe=16,
    ).collect()}
    assert 920_001 in hits  # the upserted clone is retrievable


def test_ivfpq_filtered_search_many(spark, emb, tmp_path):
    """Carried attributes + per-query filtering on the COMPRESSED index:
    the constraint is honored, survives save/load/upsert, and at full
    nprobe with rerank the result equals the exact filtered top-k."""
    from custom_vector_database_spark.operators.pq import IvfPqIndex

    idx = IvfPqIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=8, m=8, k=16,
        carry_cols=["label"],
    )
    path = str(tmp_path / "ivfpq_lbl")
    idx.save(path)
    loaded = IvfPqIndex.load(spark, path)
    assert loaded.carry_cols == ["label"]
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
    )
    got = loaded.search_many(
        queries, k=4, nprobe=8, filter_map={"label": "qlabel"},
        base_df=emb.withColumnRenamed("label", "_lbl"), base_vec="embedding",
        rerank=4,
    )
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    rows = got.collect()
    assert {r["qid"] for r in rows} == set(range(5))
    for r in rows:
        assert labels[r["vec_id"]] == labels[r["qid"]]
    exact = knn_ops.knn_join(
        emb.withColumnRenamed("label", "_lbl"),
        queries,
        k=4,
        data_id="vec_id",
        data_vec="embedding",
        predicate=(F.col("_lbl") == F.col("qlabel")),
    )
    # full-probe + rerank: high recall vs the exact filtered answer (ADC
    # quantization can still drop a true neighbor from the candidate set,
    # so set equality would be data-dependent)
    want = {(r["qid"], r["vec_id"]) for r in exact.collect()}
    got_pairs = {(r["qid"], r["vec_id"]) for r in rows}
    assert len(got_pairs & want) / len(want) >= 0.8, (got_pairs, want)
    # upsert keeps carrying; validation errors are clear
    delta = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 930_000).alias("vec_id"), "embedding", "label"
    )
    assert loaded.upsert(delta, vec_col="embedding") == 3
    carried = loaded.encoded_df().filter(F.col("vec_id") >= 930_000)
    assert carried.count() == 3 and carried.filter(F.col("label").isNull()).count() == 0
    with pytest.raises(ValueError, match="not in the saved layout"):
        loaded.search_many(queries, k=2, filter_map={"missing": "qlabel"})
    with pytest.raises(ValueError, match="carry_cols collide"):
        IvfPqIndex.fit(
            emb, id_col="vec_id", vec_col="embedding", n_clusters=4, m=8,
            carry_cols=["codes"],
        )


def test_index_describe_reports_layout_health(spark, emb, ivfpq, tmp_path):
    from custom_vector_database_spark.operators.ivf import IvfIndex

    idx = IvfIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=8,
        carry_cols=["label"],
    )
    d = idx.describe()
    assert d["kind"] == "ivf" and d["metric"] == "l2_sq"
    assert d["n_rows"] == emb.count() and d["n_clusters"] == 8
    assert d["carry_cols"] == ["label"] and not d["saved"]
    assert d["cluster_skew"] >= 1.0
    path = str(tmp_path / "d")
    idx.save(path)
    d2 = IvfIndex.load(spark, path).describe()
    assert d2["saved"] and d2["n_files"] >= d2["nonempty_clusters"]

    dp = ivfpq.describe()
    assert dp["kind"] == "ivfpq" and dp["m"] == 16
    assert dp["compression_x"] == pytest.approx(4.0 * 64 / 16)
    assert dp["n_rows"] == emb.count()


def test_bq_pack_spark_matches_python(spark, emb):
    """The Catalyst shiftleft-or fold and the driver-side packer must
    produce the identical word layout — including a ragged final slice
    (dim not a multiple of 64) and the signed wrap of a set high bit."""
    from custom_vector_database_spark.operators.bq import bq_pack, bq_pack_python

    # dim 64 = exact word; dim 70 = ragged 6-bit final slice (built by
    # wrapping the embedding around, so every row genuinely has 70
    # elements and the short-slice packing is actually exercised)
    for dim, vcol in (
        (64, F.col("embedding")),
        (70, F.concat(F.col("embedding"), F.slice(F.col("embedding"), 1, 6))),
    ):
        rows = (
            emb.limit(8)
            .select("vec_id", vcol.alias("v"), bq_pack(vcol, dim).alias("w"))
            .collect()
        )
        for r in rows:
            assert len(r["v"]) == dim, r["vec_id"]
            assert list(r["w"]) == bq_pack_python(list(r["v"])), r["vec_id"]
    # signed wrap: a vector whose first element is positive sets bit 63
    one = [1.0] + [0.0] * 63
    assert bq_pack_python(one) == [-(1 << 63)]
    got = (
        spark.range(1)
        .select(bq_pack(F.array(*[F.lit(float(x)) for x in one]), 64).alias("w"))
        .first()["w"]
    )
    assert list(got) == [-(1 << 63)]


def test_bq_recall_vs_exact(spark, emb):
    """1-bit codes are the coarsest quantizer in the family; with a 5×
    rerank over near-uniform synthetic vectors the sign-agreement proxy
    still recovers most true neighbors. Bar deliberately lower than
    SQ8's (0.9): BQ trades recall for 32× scan compression."""
    from custom_vector_database_spark.operators.bq import bq_search

    queries = [
        list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    total = 0.0
    for qvec in queries:
        exact_ids = {
            r["vec_id"]
            for r in knn_ops.knn(
                emb, qvec, k=K, id_col="vec_id", vec_col="embedding"
            ).collect()
        }
        got = {r["vec_id"] for r in bq_search(emb, qvec, k=K, rerank=5).collect()}
        total += len(exact_ids & got) / K
    assert total / N_QUERIES >= 0.4


def test_bq_search_many_matches_per_query_search(spark, emb):
    """Batch == single-query on the deterministic BQ path, and the
    empty-query and oversized-query guards behave."""
    from custom_vector_database_spark.operators.bq import bq_search, bq_search_many

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    batch = bq_search_many(emb, queries, k=5, rerank=3).collect()
    by_qid = {}
    for r in batch:
        by_qid.setdefault(r["qid"], []).append((r["vec_id"], r["dist_sq"]))
    for q in queries.collect():
        single = [
            (r["vec_id"], r["dist_sq"])
            for r in bq_search(emb, list(q["qvec"]), k=5, rerank=3).collect()
        ]
        assert sorted(by_qid[q["qid"]]) == sorted(single), q["qid"]
    empty = queries.limit(0)
    assert bq_search_many(emb, empty, k=5).count() == 0
    with pytest.raises(ValueError, match="max_query_rows"):
        bq_search_many(emb, queries, k=5, max_query_rows=2)
    # query columns named like the data side would make the rerank
    # rejoin ambiguous - the guard fails fast with the remedy
    collide = emb.filter(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="collides"):
        bq_search_many(emb, collide, k=5, query_id="vec_id", query_vec="qvec")
    with pytest.raises(ValueError, match="collides"):
        bq_search_many(emb, collide, k=5, query_id="qid", query_vec="embedding")


def test_bq_pack_nan_matches_engine_comparison_semantics(spark):
    """SQL comparison semantics order NaN above every number, so the
    engines set the sign bit for NaN; bq_pack_python must agree (IEEE
    `nan > 0` is false in Python, the divergence this pins)."""
    from custom_vector_database_spark.operators.bq import bq_pack, bq_pack_python

    v = [float("nan"), -1.0, 0.0, 1.0]
    got = (
        spark.range(1)
        .select(bq_pack(F.array(*[F.lit(x) for x in v]), 4).alias("w"))
        .first()["w"]
    )
    assert list(got) == bq_pack_python(v)
    # fold order: nan(set), -1(clear), 0(clear), 1(set) -> 0b1001
    assert bq_pack_python(v) == [0b1001]


def test_ivfbq_recall_and_crud_lifecycle(spark, emb, tmp_path):
    """IVF-BQ: pruned code scan + exact rerank clears a recall bar set
    for the compounded coarseness (IVF pruning × 1-bit codes); the full
    incremental CRUD surface (upsert fresh-code append, tombstone
    delete, refuse-until-compact id reuse, compaction) behaves like the
    sibling layouts."""
    from custom_vector_database_spark.operators.ivfbq import IvfBqIndex

    idx = IvfBqIndex.fit(emb, id_col="vec_id", vec_col="embedding", n_clusters=8)
    path = str(tmp_path / "ivfbq")
    idx.save(path)
    loaded = IvfBqIndex.load(spark, path)

    queries = [
        list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    total = 0.0
    for qvec in queries:
        exact_ids = {
            r["vec_id"]
            for r in knn_ops.knn(
                emb, qvec, k=K, id_col="vec_id", vec_col="embedding"
            ).collect()
        }
        got = {
            r["vec_id"]
            for r in loaded.search(qvec, k=K, base_df=emb, nprobe=6, rerank=10).collect()
        }
        total += len(exact_ids & got) / K
    assert total / N_QUERIES >= 0.5, f"IVF-BQ recall {total / N_QUERIES:.3f}"

    # probe pruning reaches the physical scan
    plan = (
        loaded.search(queries[0], k=5, base_df=emb, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "cluster" in plan

    # CRUD: delete -> excluded; reuse refuses; compact frees the id
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    assert loaded.delete([0]) == 1
    assert 0 not in {
        r["vec_id"]
        for r in loaded.search(qvec, k=5, base_df=emb, nprobe=8).collect()
    }
    delta = emb.filter(F.col("vec_id") == 0).select("vec_id", "embedding")
    with pytest.raises(ValueError, match="compact"):
        loaded.upsert(delta)
    loaded.compact()
    assert loaded.upsert(delta) == 1
    assert loaded.encoded_df().filter(F.col("vec_id") == 0).count() == 1
    assert 0 in {
        r["vec_id"]
        for r in loaded.search(qvec, k=5, base_df=emb, nprobe=8).collect()
    }
    d = loaded.describe()
    assert d["kind"] == "ivfbq" and d["compression_x"] == 32.0
    assert d["n_rows"] == emb.count() and d["n_tombstones"] == 0


def test_ivfbq_search_many_matches_per_query_search(spark, emb, tmp_path):
    """Batch == single-query on the saved binary layout (deterministic
    after the shared probe stage), plus the collision and row guards."""
    from custom_vector_database_spark.operators.ivfbq import IvfBqIndex

    idx = IvfBqIndex.fit(emb, id_col="vec_id", vec_col="embedding", n_clusters=8)
    path = str(tmp_path / "ivfbq_many")
    idx.save(path)
    loaded = IvfBqIndex.load(spark, path)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    batch = loaded.search_many(
        queries, k=5, base_df=emb, nprobe=4, rerank=4
    ).collect()
    by_qid = {}
    for r in batch:
        by_qid.setdefault(r["qid"], []).append((r["vec_id"], r["dist_sq"]))
    for q in queries.collect():
        single = [
            (r["vec_id"], r["dist_sq"])
            for r in loaded.search(
                list(q["qvec"]), k=5, base_df=emb, nprobe=4, rerank=4
            ).collect()
        ]
        assert sorted(by_qid[q["qid"]]) == sorted(single), q["qid"]
    with pytest.raises(ValueError, match="collides"):
        loaded.search_many(
            queries.withColumnRenamed("qid", "cluster"), k=5, base_df=emb,
            query_id="cluster",
        )
    with pytest.raises(ValueError, match="max_query_rows"):
        loaded.search_many(queries, k=5, base_df=emb, max_query_rows=2)


def test_maxsim_self_retrieval_anchor(spark):
    """The query bag IS doc 0's token group, so doc 0 must rank first
    with score == n_q (every query token maxes at cosine 1 against
    itself, modulo zero-norm drop-outs)."""
    from custom_vector_database_spark.queries_registry import QUERIES

    rows = QUERIES["maxsim_late_interaction"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows[0]["doc_id"] == 0
    assert rows[0]["score"] == float(rows[0]["n_q"])
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_maxsim_pruned_recall_tight(spark):
    """The loose oracle boolean is recall@10 >= 0.5; the TIGHT contract
    at fixture params (nprobe=1 per query token over 16 cosine cells,
    8-token docs) is near-total candidate coverage — assert >= 0.9."""
    from custom_vector_database_spark.queries_registry import QUERIES

    rows = QUERIES["maxsim_pruned"](spark, "/root/testdata/sf0.01").collect()
    assert all(r["pruned_ok"] for r in rows)
    assert rows[0]["doc_id"] == 0  # self-retrieval anchor survives pruning
