"""Round-15 ADVICE regression tests (see ADVICE.md, r14 judge round):

1. (medium) An EMPTY graph-upsert delta must no-op (return 0), not
   TypeError: the merged guard agg folds zero groups to NULL n/mx, and
   streaming foreachBatch sinks can legitimately hand this path an
   empty micro-batch.
2. (medium) The semdedup fused pre-agg must not buffer batch_rows ×
   n_bands values driver-side: the band-bucket set now folds each row
   to one long bitmask (bit_or — an 8-byte agg buffer) and must equal
   the distributed-distinct set it replaced.
3. (low) A NULL id in a CDC ingest batch must refuse with a dedicated
   NULL-id error, not the misleading 'duplicate id' one (count_distinct
   ignores NULLs).
4. (low) LshIndex.fit snapshots eagerly at the API boundary: source
   rows appended between fit() and the first search must NOT leak into
   the index.

Plus round-15's own shared primitive:

5. in_literals must match Column.isin exactly (strings incl. quotes
   and backslashes, ints, numpy ints, empty list) — it replaces isin at
   the big-list call sites, where per-literal py4j construction cost
   seconds per call.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- item 1


def test_empty_graph_upsert_noops(spark, tmp_path):
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )

    base = spark.range(40).select(
        F.col("id"),
        F.array(
            (F.col("id") % 5).cast("double"),
            (F.col("id") % 3).cast("double"),
        ).alias("vec"),
    )
    idx = KnnGraphIndex.fit(
        base, degree=3, iterations=1, target_rows_per_cluster=20
    )
    idx.save(str(tmp_path / "g"))
    before = idx.nodes.count()
    empty = spark.createDataFrame([], "id bigint, vec array<double>")
    assert idx.upsert(empty) == 0
    assert idx.nodes.count() == before


# ---------------------------------------------------------------- item 2


def test_semdedup_band_bucket_bitmask_matches_distinct(spark, tmp_path):
    """Drive one semdedup apply batch and assert the candidate prune
    still reads exactly the batch's band buckets (end to end: the batch
    appends/drops exactly as the distributed-distinct form did)."""
    import os

    from custom_vector_database_spark.streaming.stream_ops import (
        _ensure_sb_sidecar,
        corpus_semdedup_apply_batch,
    )

    corpus_dir = str(tmp_path / "c")
    # real embeddings: max natural |cos| ≈ 0.55 in this data, so the
    # negated fresh vectors are guaranteed appends and verbatim copies
    # guaranteed drops (the _fragmented_sb_corpus fixture convention)
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id") < 24)
        .select(F.col("vec_id").alias("doc_id"), "embedding")
    )
    docs.write.parquet(corpus_dir)
    _ensure_sb_sidecar(spark, corpus_dir, "doc_id", "embedding", 4, 16, 16)
    fresh = docs.orderBy("doc_id").limit(4).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.expr("transform(embedding, x -> -x)").alias("embedding"),
    )
    copies = docs.orderBy("doc_id").limit(3).select(
        (F.col("doc_id") + 2000).alias("doc_id"), "embedding"
    )
    n = corpus_semdedup_apply_batch(
        spark, fresh.unionByName(copies), 1, corpus_dir
    )
    assert n == 4  # negated kept, verbatim dropped
    assert (
        spark.read.parquet(corpus_dir).count() == 24 + 4
    )
    assert os.path.isdir(os.path.join(corpus_dir, "_sb_vecs"))


def test_semdedup_wide_bucket_fallback(spark, tmp_path):
    """n_buckets > 62 exceeds the bitmask and must take the distributed
    distinct fallback — decisions identical."""
    from custom_vector_database_spark.streaming.stream_ops import (
        _ensure_sb_sidecar,
        corpus_semdedup_apply_batch,
    )

    corpus_dir = str(tmp_path / "c")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id") < 12)
        .select(F.col("vec_id").alias("doc_id"), "embedding")
    )
    docs.write.parquet(corpus_dir)
    _ensure_sb_sidecar(spark, corpus_dir, "doc_id", "embedding", 4, 16, 128)
    fresh = docs.orderBy("doc_id").limit(2).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.expr("transform(embedding, x -> -x)").alias("embedding"),
    )
    copies = docs.orderBy("doc_id").limit(2).select(
        (F.col("doc_id") + 2000).alias("doc_id"), "embedding"
    )
    n = corpus_semdedup_apply_batch(
        spark, fresh.unionByName(copies), 1, corpus_dir, n_buckets=128
    )
    assert n == 2


# ---------------------------------------------------------------- item 3


def test_cdc_null_id_gets_dedicated_error(spark, tmp_path):
    from custom_vector_database_spark.streaming.stream_ops import (
        _ensure_cdc_sidecar,
        corpus_cdc_apply_batch,
    )
    from custom_vector_database_spark.operators.multimodal import CDC_MASK

    corpus_dir = str(tmp_path / "c")
    media = spark.range(4).select(
        F.col("id").alias("media_id"),
        F.encode(F.concat(F.lit("payload body "), F.col("id").cast("string")),
                 "UTF-8").cast("binary").alias("payload"),
    )
    media.write.parquet(corpus_dir)
    _ensure_cdc_sidecar(spark, corpus_dir, "media_id", "payload", 16,
                        CDC_MASK)
    bad = spark.createDataFrame(
        [(None, bytearray(b"some new payload bytes"))],
        "media_id long, payload binary",
    )
    with pytest.raises(ValueError, match="NULL 'media_id'"):
        corpus_cdc_apply_batch(spark, bad, 1, corpus_dir)


# ---------------------------------------------------------------- item 4


def test_lsh_fit_snapshots_at_build_time(spark, tmp_path):
    from custom_vector_database_spark.operators.ann import LshIndex

    src = str(tmp_path / "rows")
    base = spark.range(32).select(
        F.col("id"),
        F.array(
            (F.col("id") % 5).cast("float"), (F.col("id") % 3).cast("float")
        ).alias("vec"),
    )
    base.write.parquet(src)
    df = spark.read.parquet(src)
    idx = LshIndex.fit(df, id_col="id", vec_col="vec", num_hash_tables=2)
    # rows appended AFTER fit() must not surface in the built index
    spark.range(1000, 1002).select(
        F.col("id"),
        F.array(F.lit(0.0).cast("float"), F.lit(0.0).cast("float"))
        .alias("vec"),
    ).write.mode("append").parquet(src)
    assert idx._hashed.count() == 32


# ---------------------------------------------------------------- item 5


def test_in_literals_matches_isin(spark):
    from custom_vector_database_spark.operators.layout import in_literals

    df = spark.createDataFrame(
        [("a",), ("it's",), ("b\\c",), ("d",), (None,)], "s string"
    )
    vals = ["a", "it's", "b\\c", "missing"]
    got = sorted(
        r["s"] for r in df.filter(in_literals("s", vals)).collect()
    )
    want = sorted(
        r["s"] for r in df.filter(F.col("s").isin(vals)).collect()
    )
    assert got == want == ["a", "b\\c", "it's"]

    ints = spark.range(10)
    import numpy as np

    keep = [np.int64(2), 5, 7]
    got = sorted(r["id"] for r in ints.filter(in_literals("id", keep)).collect())
    assert got == [2, 5, 7]
    assert ints.filter(in_literals("id", [])).count() == 0
