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
