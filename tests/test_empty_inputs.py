"""Empty-input behavior across the pipeline operators: every operator must
either return a sane empty/identity result or raise a clear error — never
crash deep inside Catalyst. (The reference's own edge contract: searching
an empty table returns no results, vectordb.cpp:120-156.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def empty_kv(spark):
    return spark.createDataFrame([], "k long, v string")


def test_bloom_empty_build_prunes_everything(spark, empty_kv):
    from custom_vector_database_spark.operators import bloom as bl

    probe = spark.range(100).select(F.col("id").alias("k"))
    bf = bl.bloom_build(empty_kv, "k")
    assert bf.words.count() == 0
    # nothing is in the set, so every probe row must drop — and that IS
    # correct semantics for a prefilter of an empty build side
    assert bl.bloom_prune(probe, "k", bf).count() == 0


def test_merge_upsert_empty_source_is_identity(spark):
    from custom_vector_database_spark.operators.merge import merge_upsert

    target = spark.range(10).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    empty = spark.createDataFrame([], "k long, v string")
    for fast in (False, True):
        got = merge_upsert(target, empty, "k", broadcast_source=fast)
        assert got.count() == 10
        assert {r["v"] for r in got.collect()} == {"x"}


def test_merge_upsert_empty_target_is_source(spark):
    from custom_vector_database_spark.operators.merge import merge_upsert

    empty = spark.createDataFrame([], "k long, v string")
    source = spark.range(5).select(F.col("id").alias("k"), F.lit("s").alias("v"))
    for fast in (False, True):
        assert merge_upsert(empty, source, "k", broadcast_source=fast).count() == 5


def test_snapshot_diff_empty_sides(spark, empty_kv):
    from custom_vector_database_spark.operators.cdc import snapshot_diff

    data = spark.range(3).select(F.col("id").alias("k"), F.lit("a").alias("v"))
    # everything inserted / everything deleted / both empty
    assert {
        r["change_type"] for r in snapshot_diff(empty_kv, data, "k").collect()
    } == {"INSERT"}
    assert {
        r["change_type"] for r in snapshot_diff(data, empty_kv, "k").collect()
    } == {"DELETE"}
    assert snapshot_diff(empty_kv, empty_kv, "k").count() == 0


def test_bm25_empty_corpus_returns_empty(spark):
    from custom_vector_database_spark.operators.ranking import bm25

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert bm25(docs, ["spark"]).count() == 0


def test_sq8_search_empty_table_returns_empty(spark):
    from custom_vector_database_spark.operators.sq import sq8_search

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert sq8_search(emb, [1.0, 0.0], k=3).count() == 0


def test_merge_agg_delta_empty_delta_is_identity(spark):
    from custom_vector_database_spark.operators.cdc import merge_agg_delta

    stored = spark.createDataFrame([(1, 10, 3)], "g long, total long, n long")
    empty = spark.createDataFrame([], "g long, total long, n long")
    got = merge_agg_delta(stored, empty, ["g"], {"total": "sum", "n": "count"})
    assert [(r["g"], r["total"], r["n"]) for r in got.collect()] == [(1, 10, 3)]


def test_bq_search_empty_table_returns_empty(spark):
    from custom_vector_database_spark.operators.bq import bq_search

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert bq_search(emb, [1.0, 0.0], k=3).count() == 0


def test_duplicate_spans_no_duplicates_returns_empty(spark):
    from custom_vector_database_spark.operators.text import duplicate_spans

    docs = spark.createDataFrame(
        [(1, "every doc unique words entirely"), (2, "short"), (3, "")],
        "doc_id long, text string",
    )
    assert duplicate_spans(docs, n=4, min_docs=2).count() == 0
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert duplicate_spans(empty, n=4).count() == 0


def test_semantic_prune_empty_and_singleton_clusters(spark):
    from custom_vector_database_spark.operators.dedup import semantic_prune

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    assert semantic_prune(empty, cluster_col="label").count() == 0
    solo = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    # identical vectors but each alone in its cluster: nothing prunes
    assert semantic_prune(solo, cluster_col="label", max_cos_dist=0.5).count() == 2


def test_cap_per_group_empty_is_empty(spark):
    from custom_vector_database_spark.operators.curation import cap_per_group

    empty = spark.createDataFrame([], "doc_id long, source string")
    assert cap_per_group(empty, "source", cap=3).count() == 0


def test_bq_search_skips_null_and_mismatched_vectors(spark):
    """A NULL embedding (NULL code words -> NULL hamming) and a
    short/ragged embedding (NULL rerank distance) rank strictly AFTER
    every real match — the knn asc_nulls_last contract — so they never
    displace a valid neighbor from the top-k."""
    from custom_vector_database_spark.operators.bq import bq_search

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, None),
        (3, [1.0, 0.0]),  # ragged
        (4, [0.9, 0.1, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [r["vec_id"] for r in bq_search(df, [1.0, 0.0, 0.0, 0.0], k=2).collect()]
    assert got == [1, 4]
    wide = [
        r["vec_id"] for r in bq_search(df, [1.0, 0.0, 0.0, 0.0], k=4).collect()
    ]
    assert wide[:2] == [1, 4]  # degenerate rows trail, never lead


def test_maxsim_scores_empty_sides(spark):
    from custom_vector_database_spark.operators.ranking import maxsim_scores

    toks = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "doc long, embedding array<double>"
    )
    qe = spark.createDataFrame([], "qid long, qvec array<double>")
    # empty query bag -> no (doc, q) pairs -> empty scores
    assert maxsim_scores(toks, qe).count() == 0
    te = spark.createDataFrame([], "doc long, embedding array<double>")
    q = spark.createDataFrame([(0, [1.0, 0.0])], "qid long, qvec array<double>")
    assert maxsim_scores(te, q).count() == 0
    # zero-norm document token: NULL cosine drops out, n_q counts matches
    z = spark.createDataFrame(
        [(5, [0.0, 0.0])], "doc long, embedding array<double>"
    )
    rows = maxsim_scores(z, q).collect()
    assert len(rows) == 1 and rows[0]["n_q"] == 0
