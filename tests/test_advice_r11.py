"""Round-11 ADVICE regressions (all four r10 advisor findings):

1. ``approx_similarity_join`` decides whether to drop-and-re-hash the
   right side by stable MLlib model uid, not Python object identity —
   two handles loaded from the SAME saved index must keep the right
   side's materialized hashed table.
2. ``stream_vector_ingest`` with a declared ``model_id`` against a
   pin-unaware duck-typed sink (upsert(batch) with no model_id kwarg)
   refuses with a descriptive ValueError BEFORE the stream starts,
   instead of an opaque StreamingQueryException mid-stream.
3. ``maintenance_plan`` returns the documented fixed-shape rows only —
   the private ``_corpus_dir`` routing key never leaks into the plan;
   ``run_maintenance(execute=True)`` still routes compact actions to
   the right corpus dir via its internal map.
4. The ``_fragmented_sb_corpus`` fixture seeds every apply batch from a
   DETERMINISTIC 5-row slice (orderBy before limit), so which vectors
   each batch transforms cannot drift with the physical plan.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _emb(spark, n=30):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") < n)
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    )


def test_simjoin_same_saved_index_keeps_materialized_hashes(spark, tmp_path):
    """ADVICE r10 #1: two loads of the SAME saved LSH index share a model
    uid, so the join must NOT drop the right side's hashed column."""
    from custom_vector_database_spark.operators.ann import (
        LshIndex,
        approx_similarity_join,
    )

    idx = LshIndex.fit(_emb(spark), id_col="id", vec_col="vec")
    path = str(tmp_path / "lsh")
    idx.save(path)
    a = LshIndex.load(spark, path)
    b = LshIndex.load(spark, path)
    assert a.model is not b.model  # distinct handles...
    assert a.model.uid == b.model.uid  # ...same saved family

    hash_col = a.model.getOutputCol()
    # the drop-and-re-hash branch removes hash_col from the b-side frame;
    # same-uid handles must keep it (no recompute of the right side)
    b_df = b.hashed_df()
    assert hash_col in b_df.columns
    same_artifact = approx_similarity_join(a, b, threshold=1e9)
    fresh = LshIndex.fit(_emb(spark), id_col="id", vec_col="vec")
    assert fresh.model.uid != a.model.uid  # independent fits never collide
    cross_family = approx_similarity_join(a, fresh, threshold=1e9)
    # correctness is unchanged either way: identical pair sets at a
    # threshold wide enough to accept every candidate bucket pair
    assert sorted(map(tuple, same_artifact.select("id_a", "id_b").collect())) \
        == sorted(map(tuple, cross_family.select("id_a", "id_b").collect()))


def test_stream_ingest_declared_pin_refuses_pin_unaware_sink(spark, tmp_path):
    """ADVICE r10 #2: declared model_id + a sink whose upsert takes no
    model_id kwarg -> descriptive ValueError up front, no stream."""
    import pyspark.sql.types as T

    from custom_vector_database_spark.streaming.stream_ops import (
        stream_vector_ingest,
    )

    class PinUnawareSink:
        def __init__(self):
            self.batches = 0

        def upsert(self, batch):
            self.batches += 1

    delta = str(tmp_path / "delta")
    os.makedirs(delta)
    _emb(spark, 5).write.mode("append").parquet(delta)
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("vec", T.ArrayType(T.FloatType())),
    ])
    sink = PinUnawareSink()
    with pytest.raises(ValueError, match="model_id.*pin"):
        stream_vector_ingest(
            spark, delta, sink, schema, model_id="text-embed-v2"
        )
    assert sink.batches == 0  # refused before anything streamed

    # undeclared pin against the same sink keeps working (duck-typing
    # contract unchanged)
    n = stream_vector_ingest(spark, delta, sink, schema)
    assert n >= 1 and sink.batches == n

    # **kwargs sinks count as pin-aware (they can receive the kwarg)
    class KwargsSink:
        def __init__(self):
            self.pins = []

        def upsert(self, batch, **kw):
            self.pins.append(kw.get("model_id"))

    delta2 = str(tmp_path / "delta2")
    os.makedirs(delta2)
    _emb(spark, 5).write.mode("append").parquet(delta2)
    ks = KwargsSink()
    n2 = stream_vector_ingest(
        spark, delta2, ks, schema, model_id="text-embed-v2"
    )
    assert n2 >= 1 and set(ks.pins) == {"text-embed-v2"}


def test_maintenance_plan_rows_have_fixed_shape(spark, tmp_path):
    """ADVICE r10 #3: no private keys in the returned plan rows, and
    execute mode still compacts the right corpus via the internal map."""
    from custom_vector_database_spark.operators.maintenance import (
        maintenance_plan,
        run_maintenance,
    )
    from custom_vector_database_spark.queries.pipeline_queries import (
        _fragmented_sb_corpus,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus = _fragmented_sb_corpus(
        spark, emb, str(tmp_path / "frag"), n_batches=2, n_buckets=4
    )
    plan = maintenance_plan(
        spark, corpora=[("frag", corpus)], max_files_per_bucket=1.0
    )
    documented = {
        "target", "kind", "action", "metric_name", "metric",
        "threshold", "blocked", "executable", "reason",
    }
    assert plan, "fixture must produce at least one plan row"
    for row in plan:
        assert set(row) == documented, f"undocumented key in {sorted(row)}"
    compact_rows = [a for a in plan if a["action"] == "compact"]
    assert compact_rows and compact_rows[0]["executable"]

    plan2, executed = run_maintenance(
        spark, corpora=[("frag", corpus)], max_files_per_bucket=1.0,
        execute=True,
    )
    assert [e["target"] for e in executed] == ["frag:signband"]
    # post-compact the fragmentation signal is healthy again
    plan3 = maintenance_plan(
        spark, corpora=[("frag", corpus)], max_files_per_bucket=1.0
    )
    assert all(a["action"] != "compact" for a in plan3)


def test_fragmented_fixture_batches_are_order_independent(spark, tmp_path):
    """ADVICE r10 #4: the fixture's apply batches derive from
    orderBy(doc_id).limit(5) — assert the batch ids it lands are exactly
    the 5 SMALLEST doc ids shifted by 10_000*b, not plan-dependent."""
    from custom_vector_database_spark.queries.pipeline_queries import (
        _fragmented_sb_corpus,
    )
    from custom_vector_database_spark.streaming.stream_ops import (
        _SB_VECS,
        _read_sb_vecs,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus = _fragmented_sb_corpus(
        spark, emb, str(tmp_path / "frag"), n_batches=2, n_buckets=4
    )
    vecs = _read_sb_vecs(spark, os.path.join(corpus, _SB_VECS))
    got = {
        r[0] for r in vecs.filter(F.col("id") >= 10_000)
        .select("id").collect()
    }
    base = sorted(
        r[0] for r in emb.filter(F.col("vec_id") < 20)
        .select("vec_id").collect()
    )[:5]
    want = {d + 10_000 * b for b in (1, 2) for d in base}
    assert got == want
