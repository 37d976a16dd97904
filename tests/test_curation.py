"""Semantic tests for operators/curation.py: mixture resampling quotas,
sequence-packing boundaries, boilerplate n-gram flagging, and centroid
outlier ranking. (Oracle parity for the registered queries is covered by
the parametrized sweep in test_oracle_parity.py.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_vector_database_spark.operators import curation as cu


# ---------------------------------------------------------------------------
# mixture_resample
# ---------------------------------------------------------------------------
def _mix_df(spark):
    rows = (
        [(i, "web") for i in range(40)]
        + [(100 + i, "code") for i in range(10)]
        + [(200 + i, "books") for i in range(30)]
        + [(300 + i, "junk") for i in range(7)]
    )
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_quota_exact(spark):
    df = _mix_df(spark)
    # weights 2:1:1 over (web, code, books); junk has no weight -> dropped.
    # Binding stratum: code (10 rows / weight 1) -> N = min(40*4/2, 10*4/1,
    # 30*4/1) = 40; takes = (2*40/4, 1*40/4, 1*40/4) = (20, 10, 10).
    sel = cu.mixture_resample(
        df, "source", "doc_id", {"web": 2, "code": 1, "books": 1}
    )
    got = {
        r["source"]: r["n"]
        for r in sel.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {"web": 20, "code": 10, "books": 10}


def test_mixture_deterministic_and_append_stable(spark):
    df = _mix_df(spark)
    w = {"web": 2, "code": 1, "books": 1}
    a = sorted(r["doc_id"] for r in cu.mixture_resample(df, "source", "doc_id", w).collect())
    b = sorted(r["doc_id"] for r in cu.mixture_resample(df, "source", "doc_id", w).collect())
    assert a == b
    # repartitioning must not change the selection (md5-rank, not RNG)
    c = sorted(
        r["doc_id"]
        for r in cu.mixture_resample(df.repartition(7), "source", "doc_id", w).collect()
    )
    assert a == c


def test_mixture_rejects_bad_weights(spark):
    df = _mix_df(spark)
    with pytest.raises(ValueError):
        cu.mixture_resample(df, "source", "doc_id", {})
    with pytest.raises(ValueError):
        cu.mixture_resample(df, "source", "doc_id", {"web": 0})


def test_mixture_non_string_stratum(spark):
    # integer domain ids as strata: the weight table's stratum field type
    # must follow the input column, not hardcode string
    rows = [(i, 1) for i in range(40)] + [(100 + i, 2) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, domain int")
    sel = cu.mixture_resample(df, "domain", "doc_id", {1: 2, 2: 1})
    got = {
        r["domain"]: r["n"]
        for r in sel.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # binding stratum: domain 2 (10 rows / weight 1) -> N = min(40*3/2,
    # 10*3/1) = 30; takes = (2*30/3, 1*30/3) = (20, 10)
    assert got == {1: 20, 2: 10}


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------
def test_pack_sequences_boundaries(spark):
    # 5-token docs, budget 8: before = 0,5,10,15 -> seq = 0,0,1,1
    rows = [(i, "s", "a b c d e") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, text string")
    packed = cu.pack_sequences(df, "shard", "doc_id", budget=8).orderBy("doc_id")
    got = [(r["n_tokens"], r["seq_id"]) for r in packed.collect()]
    assert got == [(5, 0), (5, 0), (5, 1), (5, 1)]


def test_pack_sequences_per_shard_independent(spark):
    rows = [(1, "x", "a b c"), (2, "y", "a b c"), (3, "x", "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, shard string, text string")
    packed = cu.pack_sequences(df, "shard", "doc_id", budget=4)
    got = {r["doc_id"]: r["seq_id"] for r in packed.collect()}
    # each shard's cumsum starts at 0: doc 2 (shard y) is seq 0 despite id order
    assert got == {1: 0, 2: 0, 3: 0}
    rows2 = [(1, "x", "a b c d"), (2, "x", "a b c d"), (3, "y", "a b")]
    df2 = spark.createDataFrame(rows2, "doc_id long, shard string, text string")
    got2 = {
        r["doc_id"]: r["seq_id"]
        for r in cu.pack_sequences(df2, "shard", "doc_id", budget=4).collect()
    }
    assert got2 == {1: 0, 2: 1, 3: 0}


def test_pack_sequences_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, "s", "a")], "doc_id long, shard string, text string")
    with pytest.raises(ValueError):
        cu.pack_sequences(df, "shard", "doc_id", budget=0)


# ---------------------------------------------------------------------------
# boilerplate_ngrams
# ---------------------------------------------------------------------------
def test_boilerplate_flagging(spark):
    boiler = "all rights reserved by corp"
    rows = [
        (1, f"alpha beta gamma delta epsilon {boiler}"),
        (2, f"one two three four five six {boiler}"),
        (3, f"{boiler} unrelated tail words here now"),
        (4, "totally distinct text with no shared grams at all"),
        (5, "tiny doc"),  # < 5 tokens -> zero shingles
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cu.boilerplate_ngrams(df, n=5, min_docs=3).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    # the shared 5-gram appears in 3 docs -> boilerplate in each of them
    for d in (1, 2, 3):
        assert out[d]["n_boiler"] >= 1, d
        assert out[d]["boiler_frac"] > 0
    assert out[4]["n_boiler"] == 0 and out[4]["boiler_frac"] == 0.0
    assert out[5]["n_shingles"] == 0 and out[5]["boiler_frac"] == 0.0


def test_boilerplate_min_docs_threshold(spark):
    shared = "shared phrase of five words"
    rows = [(1, f"{shared} aaa bbb"), (2, f"{shared} ccc ddd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # only 2 docs share it; min_docs=3 -> nothing flagged
    out = cu.boilerplate_ngrams(df, n=5, min_docs=3).collect()
    assert all(r["n_boiler"] == 0 for r in out)
    out2 = cu.boilerplate_ngrams(df, n=5, min_docs=2).collect()
    assert all(r["n_boiler"] >= 1 for r in out2)


# ---------------------------------------------------------------------------
# centroid_outliers
# ---------------------------------------------------------------------------
def test_centroid_outlier_planted(spark):
    # label 0: tight cluster at (1,1) plus one planted point at (9,9)
    rows = [(i, [1.0 + 0.01 * i, 1.0], 0) for i in range(9)] + [(99, [9.0, 9.0], 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = cu.centroid_outliers(df, k=3).orderBy("rk").collect()
    assert len(out) == 3
    assert out[0]["vec_id"] == 99 and out[0]["rk"] == 1
    assert out[0]["dist2"] > out[1]["dist2"]


def test_centroid_outliers_per_label_k(spark):
    rows = [(i, [float(i % 3), 0.0], i % 2) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = cu.centroid_outliers(df, k=4).collect()
    per = {}
    for r in out:
        per.setdefault(r["label"], []).append(r["rk"])
    assert set(per) == {0, 1}
    for label, rks in per.items():
        assert sorted(rks) == [1, 2, 3, 4], (label, rks)


def test_label_centroids_shape(spark):
    rows = [(1, [2.0, 4.0], 7), (2, [4.0, 8.0], 7)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    c = cu.label_centroids(df).collect()
    assert len(c) == 1 and c[0]["n"] == 2
    assert c[0]["centroid"] == pytest.approx([3.0, 6.0], abs=1e-5)


# ---------------------------------------------------------------------------
# length_buckets
# ---------------------------------------------------------------------------
def test_length_buckets_orders_by_length(spark):
    rows = [
        (1, "s", "a"),                    # 1 token
        (2, "s", "a b c d e f g h"),      # 8 tokens
        (3, "s", "a b"),                  # 2
        (4, "s", "a b c d"),              # 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, shard string, text string")
    out = {
        r["doc_id"]: r["bucket"]
        for r in cu.length_buckets(df, "shard", n_buckets=2).collect()
    }
    # shortest half -> bucket 1, longest half -> bucket 2
    assert out[1] == 1 and out[3] == 1 and out[4] == 2 and out[2] == 2


# ---------------------------------------------------------------------------
# unigram_logprob
# ---------------------------------------------------------------------------
def test_unigram_logprob_rare_tokens_score_lower(spark):
    import math

    rows = [
        (1, "common common common common"),
        (2, "common common common rare"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cu.unigram_logprob(df).collect()}
    # doc 2 contains the rare token -> lower (more negative) average
    assert out[2]["avg_logprob"] < out[1]["avg_logprob"]
    # doc 1 is all 'common' (7 of 8 tokens): lp = floor(1e6*ln(7/8)) per token
    lp = math.floor(1e6 * math.log(7 / 8))
    assert out[1]["lp_micro_sum"] == 4 * lp
    assert out[1]["n_tokens"] == 4


def test_unigram_logprob_empty_doc(spark):
    df = spark.createDataFrame([(1, "hello world"), (2, "")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in cu.unigram_logprob(df).collect()}
    assert out[2]["n_tokens"] == 0 and out[2]["avg_logprob"] == 0.0


# ---------------------------------------------------------------------------
# matryoshka_search (operator-level; oracle parity covered by the sweep)
# ---------------------------------------------------------------------------
def test_matryoshka_matches_exact_on_separable_data(spark):
    from custom_vector_database_spark.operators.knn import knn, matryoshka_search

    # prefix dims already separate the clusters -> stage 1 keeps the true
    # neighbors and the rerank must equal the exact search
    rows = [(i, [float(i), float(i), 100.0 * (i % 2), 0.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    q = [3.2, 3.2, 0.0, 0.0]
    exact = [r["id"] for r in knn(df, q, 5).collect()]
    mat = matryoshka_search(df, q, 5, prefix_dims=2, candidates=15).collect()
    assert [r["id"] for r in mat] == exact
    # full distance must never be smaller than its prefix distance
    assert all(r["dist_sq"] >= r["dist_prefix"] for r in mat)


def test_matryoshka_validates_args(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, vec array<float>")
    with pytest.raises(ValueError):
        from custom_vector_database_spark.operators.knn import matryoshka_search
        matryoshka_search(df, [1.0, 2.0], k=10, candidates=5)


# ---------------------------------------------------------------------------
# PCA
# ---------------------------------------------------------------------------
def test_pca_projection_matches_numpy(spark):
    import numpy as np
    from custom_vector_database_spark.operators import pca as P

    rng = np.random.RandomState(7)
    x = rng.randn(200, 6) @ np.diag([5.0, 3.0, 1.0, 0.3, 0.2, 0.1])
    rows = [(i, [float(v) for v in x[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    m = P.pca_fit(df, k=2, fit_sample=1000)
    assert m.orthonormality_error() < 1e-9
    assert m.evr > 0.7  # two dominant axes carry most variance
    got = (
        df.select("vec_id", P.project_expr(m, "embedding", round_to=None).alias("p"))
        .orderBy("vec_id")
        .collect()
    )
    xf32 = np.asarray([[np.float32(v) for v in row] for row in x], dtype=np.float64)
    ref = (xf32 - np.asarray(m.mean)) @ np.asarray(m.components).T
    diff = np.abs(np.asarray([r["p"] for r in got]) - ref).max()
    assert diff < 1e-9, diff


def test_pca_residual_fraction_bounds(spark):
    import numpy as np
    from custom_vector_database_spark.operators import pca as P

    rng = np.random.RandomState(3)
    x = rng.randn(100, 4)
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    m_all = P.pca_fit(df, k=4, fit_sample=1000)
    # full-rank projection keeps all energy
    assert P.residual_fraction(df, m_all, "embedding") < 1e-9
    m1 = P.pca_fit(df, k=1, fit_sample=1000)
    rf = P.residual_fraction(df, m1, "embedding")
    assert 0.0 < rf < 1.0
    assert rf == pytest.approx(1.0 - m1.evr, abs=1e-9)  # fit on full table


def test_pca_rejects_k_above_dim(spark):
    from custom_vector_database_spark.operators import pca as P

    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        P.pca_fit(df, k=3, fit_sample=10)


def test_mixture_empty_weighted_stratum_selects_nothing(spark):
    df = _mix_df(spark)
    # 'video' has weight but zero rows: exact proportions unsatisfiable -> N=0
    sel = cu.mixture_resample(df, "source", "doc_id", {"web": 1, "video": 1})
    assert sel.count() == 0


# ---------------------------------------------------------------------------
# hashed_tf (feature hashing) + empty-input hardening for curation ops
# ---------------------------------------------------------------------------
def test_hashed_tf_counts_and_range(spark):
    from custom_vector_database_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, "spark spark join"), (2, "")], "doc_id long, text string"
    )
    rows = tx.hashed_tf(df, num_buckets=8).collect()
    assert all(0 <= r["bucket"] < 8 for r in rows)
    # doc 1 has 3 tokens over <= 2 buckets; repeated token lands in ONE bucket
    d1 = [r for r in rows if r["doc_id"] == 1]
    assert sum(r["tf"] for r in d1) == 3 and len(d1) <= 2
    # empty doc contributes no rows (sparse representation)
    assert not [r for r in rows if r["doc_id"] == 2]


def test_curation_ops_on_empty_input(spark):
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert cu.boilerplate_ngrams(empty_docs).count() == 0
    assert cu.unigram_logprob(empty_docs).count() == 0
    empty_sharded = spark.createDataFrame([], "doc_id long, shard string, text string")
    assert cu.pack_sequences(empty_sharded, "shard", "doc_id", budget=8).count() == 0
    assert cu.length_buckets(empty_sharded, "shard").count() == 0
    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    assert cu.centroid_outliers(empty_emb).count() == 0
    empty_mix = spark.createDataFrame([], "doc_id long, source string")
    assert cu.mixture_resample(empty_mix, "source", "doc_id", {"web": 1}).count() == 0


def test_pca_candidate_recall_on_clustered_data(spark):
    """On data with genuine low-dim structure (clusters along 2 dominant
    axes), reduce-then-refine must recover the exact top-k — the
    counterpart to the isotropic worst case measured in the registered
    pca_search query."""
    import numpy as np
    from custom_vector_database_spark.operators import pca as P
    from custom_vector_database_spark.operators.knn import knn

    rng = np.random.RandomState(11)
    centers = rng.randn(5, 8) * 20.0
    x = np.vstack([c + 0.1 * rng.randn(40, 8) for c in centers])
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<float>",
    )
    m = P.pca_fit(df, k=2, fit_sample=1000)
    q = [float(v) for v in x[0]]
    qp = np.asarray(m.components) @ (np.asarray(q) - np.asarray(m.mean))
    proj = df.select(
        "vec_id", "embedding", P.project_expr(m, "embedding", round_to=None).alias("p")
    )
    from custom_vector_database_spark.functions.vector import l2_squared

    d_low = l2_squared(F.col("p"), F.array(*[F.lit(float(v)) for v in qp]))
    cand = (
        proj.select("vec_id", d_low.alias("d_low"))
        .orderBy(F.col("d_low"), "vec_id").limit(50).collect()
    )
    cids = {r["vec_id"] for r in cand}
    exact = {r["vec_id"] for r in knn(df, q, 10, id_col="vec_id", vec_col="embedding").collect()}
    assert exact <= cids  # recall@10 == 1.0 through the candidate stage


def test_pca_projection_contracts_distances(spark):
    """Orthonormal-projection contraction: projected distance can never
    exceed the true distance — the invariant pca_search certifies."""
    import numpy as np
    from custom_vector_database_spark.operators import pca as P

    rng = np.random.RandomState(5)
    x = rng.randn(150, 6)
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(150)],
        "vec_id long, embedding array<float>",
    )
    m = P.pca_fit(df, k=3, fit_sample=1000)
    q = [float(v) for v in x[3]]
    qp = np.asarray(m.components) @ (np.asarray(q) - np.asarray(m.mean))
    proj = df.select(
        "vec_id", "embedding", P.project_expr(m, "embedding", round_to=None).alias("p")
    )
    from custom_vector_database_spark.functions.vector import l2_squared

    d_low = l2_squared(F.col("p"), F.array(*[F.lit(float(v)) for v in qp]))
    qarr = F.array(*[F.lit(float(v)) for v in q]).cast("array<double>")
    viol = proj.select(
        d_low.alias("lo"), l2_squared(F.col("embedding"), qarr).alias("hi")
    ).filter(F.col("lo") > F.col("hi") + 1e-9).count()
    assert viol == 0


def test_feature_hash_rejects_bad_buckets(spark):
    from custom_vector_database_spark.operators import text as tx

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        tx.hashed_tf(df, num_buckets=0)


# ---------------------------------------------------------------------------
# MMR diverse selection
# ---------------------------------------------------------------------------
def test_mmr_prefers_diversity_over_redundancy(spark):
    from custom_vector_database_spark.operators.knn import mmr_select

    # query at the origin; ids 1-3 a tight clump to the right, id 10
    # slightly farther but orthogonal. Pure relevance top-3 = the clump;
    # under MMR the clump's mutual similarity is its own penalty
    # (score(d) = λ·rel − (1−λ)·max-sim-to-selected, sim = −L2²:
    # score(clump sibling) ≈ λ·(−1.1) − (1−λ)·(−0.0025) ≈ −0.55 while
    # score(diverse) ≈ λ·(−1.21) − (1−λ)·(−2.21) ≈ +0.5), so the
    # orthogonal point must be selected second.
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.05, 0.0]),
        (3, [0.95, 0.0]),
        (10, [0.0, 1.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sel = mmr_select(
        df, [0.0, 0.0], k=3, candidates=4, lam=0.5,
        id_col="vec_id", vec_col="embedding",
    )
    order = [vid for _, vid, _ in sel]
    assert order[0] == 3          # nearest to the origin query
    assert order[1] == 10, order  # diversity beats the redundant clump
    assert len(sel) == 3 and [r for r, _, _ in sel] == [1, 2, 3]


def test_mmr_validates_args(spark):
    from custom_vector_database_spark.operators.knn import mmr_select

    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        mmr_select(df, [1.0, 0.0], k=5, candidates=3)


def test_mmr_skips_null_and_mismatched_vectors(spark):
    # NULL embeddings and dim-mismatched rows yield a NULL relevance —
    # they must be dropped from candidacy, not crash the driver-side
    # greedy loop with a TypeError on None arithmetic
    from custom_vector_database_spark.operators.knn import mmr_select

    rows = [
        (1, [1.0, 0.0]),
        (2, None),
        (3, [0.5]),          # wrong dim -> NULL fold
        (4, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sel = mmr_select(df, [0.0, 0.0], k=2, candidates=4,
                     id_col="vec_id", vec_col="embedding")
    assert [vid for _, vid, _ in sel] == [1, 4] or \
           [vid for _, vid, _ in sel] == [4, 1]
    assert all(rel is not None for _, _, rel in sel)


def test_cap_per_group_is_deterministic_and_caps(spark):
    """Over-cap groups keep exactly cap rows; under-cap groups are
    untouched; the kept set is a pure function of the ids (repartition-
    and rerun-invariant), and cap<=0 refuses."""
    from custom_vector_database_spark.operators.curation import cap_per_group

    rows = [(i, "big" if i < 20 else "small") for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = cap_per_group(df, "source", cap=5).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_src["big"]) == 5 and by_src["small"] == set(range(20, 25))
    again = {
        r["doc_id"]
        for r in cap_per_group(df.repartition(7), "source", cap=5).collect()
        if r["source"] == "big"
    }
    assert again == by_src["big"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        cap_per_group(df, "source", cap=0)


def test_bigram_logprob_semantics(spark):
    """Hand-computed add-one bigram likelihood on a 3-doc corpus: the
    repeated 'a b' transition scores above the once-seen ones; a doc
    with <2 tokens contributes (and receives) zero bigrams."""
    import math

    from custom_vector_database_spark.operators.curation import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "x")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    # corpus bigrams: (a b)x2, (b c)x1; left counts: a->2, b->1; V=4 (a,b,c,x)
    lp_ab = math.floor(math.log((2 + 1) / (2 + 4)) * 1e6)
    lp_bc = math.floor(math.log((1 + 1) / (1 + 4)) * 1e6)
    assert rows[1]["n_bigrams"] == 2 and rows[1]["lp_micro_sum"] == lp_ab + lp_bc
    assert rows[2]["n_bigrams"] == 1 and rows[2]["lp_micro_sum"] == lp_ab
    assert rows[3]["n_bigrams"] == 0 and rows[3]["lp_micro_sum"] == 0
    assert rows[2]["avg_logprob"] > rows[1]["avg_logprob"]


# ---------------------------------------------------------------------------
# dsir_logweights / dsir_resample
# ---------------------------------------------------------------------------
def test_dsir_identical_corpora_gives_zero_weights(spark):
    """target == raw -> p̂ == q̂ exactly, so every bucket's log-ratio
    (and hence every document's logw_micro) is EXACTLY zero — the
    selection degenerates to the pure Gumbel draw."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i}") for i in range(8)],
        "doc_id long, text string",
    )
    w = cu.dsir_logweights(docs, docs.select("text"), num_buckets=16)
    assert [r["logw_micro"] for r in w.collect()] == [0] * 8


def test_dsir_prefers_target_like_docs(spark):
    target = spark.createDataFrame(
        [(f"alpha bravo charlie delta echo {i}",) for i in range(20)],
        "text string",
    )
    raw = spark.createDataFrame(
        [(0, "alpha bravo charlie delta echo")]
        + [(i, "zulu yankee xray whiskey victor") for i in range(1, 6)],
        "doc_id long, text string",
    )
    w = {
        r["doc_id"]: r["logw_micro"]
        for r in cu.dsir_logweights(raw, target, num_buckets=64).collect()
    }
    # the target-like doc outranks every pool-typical doc on raw weight
    assert all(w[0] > w[i] for i in range(1, 6))
    # and survives resampling at n=1 (its weight gap dominates the Gumbel)
    sel = cu.dsir_resample(raw, target, n=1, num_buckets=64).collect()
    assert [r["doc_id"] for r in sel] == [0]


def test_dsir_resample_deterministic_and_bounded(spark):
    docs = spark.createDataFrame(
        [(i, f"token{i} filler words here") for i in range(10)],
        "doc_id long, text string",
    )
    target = docs.select("text")
    a = cu.dsir_resample(docs, target, n=4).collect()
    b = cu.dsir_resample(docs, target, n=4).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 4
    # n >= pool returns the whole pool
    assert cu.dsir_resample(docs, target, n=100).count() == 10
    # a different salt draws a different Gumbel ordering key
    c = cu.dsir_resample(docs, target, n=4, salt="other").collect()
    assert [r["key_micro"] for r in c] != [r["key_micro"] for r in a]
    with pytest.raises(ValueError, match="n must be positive"):
        cu.dsir_resample(docs, target, n=0)
    with pytest.raises(ValueError, match="num_buckets"):
        cu.dsir_logweights(docs, target, num_buckets=0)


def test_dsir_empty_text_doc_kept_with_zero_weight(spark):
    raw = spark.createDataFrame(
        [(1, ""), (2, "alpha beta")], "doc_id long, text string"
    )
    target = spark.createDataFrame([("alpha beta",)], "text string")
    w = {
        r["doc_id"]: (r["n_grams"], r["logw_micro"])
        for r in cu.dsir_logweights(raw, target).collect()
    }
    assert w[1] == (0, 0)  # no grams -> neutral weight, still selectable
    assert w[2][0] == 3  # 2 unigrams + 1 bigram


def test_pipeline_v3_decon_stage_semantics(spark):
    """corpus_curation_pipeline_v3 (round 10): the decontamination stage's
    policy comparison must be coherent — span-cut keeps every deduped doc
    but strictly fewer tokens when leaks exist; doc-drop keeps fewer docs
    and at most span-cut's tokens; stage yields are monotone down the
    chain; and the salted split does real work (strict subset of the
    quality survivors — the UNSALTED split was measured vacuous because
    cap_per_group's draw and the split shared md5(doc_id))."""
    from custom_vector_database_spark.queries.curation_queries import (
        q_corpus_curation_pipeline_v3,
    )

    rows = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in q_corpus_curation_pipeline_v3(
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert set(rows) == {
        "0_raw", "1_capped", "2_dedup", "3_decon_spancut",
        "3b_decon_docdrop", "4_quality", "5_train", "6_packed",
    }
    # span-cut keeps ALL deduped docs, cuts tokens (the planted leak)
    assert rows["3_decon_spancut"][0] == rows["2_dedup"][0]
    assert rows["3_decon_spancut"][1] < rows["2_dedup"][1]
    # doc-drop: fewer docs, fewer tokens than span-cut — the yield the
    # surgical policy exists to save
    assert rows["3b_decon_docdrop"][0] < rows["3_decon_spancut"][0]
    assert rows["3b_decon_docdrop"][1] < rows["3_decon_spancut"][1]
    # monotone chain from the span-cut frontier
    assert rows["4_quality"][0] <= rows["3_decon_spancut"][0]
    # the SALTED split is non-vacuous: a strict subset survives
    assert 0 < rows["5_train"][0] < rows["4_quality"][0]
    # packing conserves the train tokens exactly
    assert rows["6_packed"][1] == rows["5_train"][1]
