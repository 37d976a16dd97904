"""Embedding-model version pin (round 10): every embedding-keyed
artifact meta — the saved IVF / PQ / IVF-PQ / IVF-BQ / MaxSim / LSH
layouts and the sign-band dedup sidecar — carries a caller-supplied
``model_id``, and every probe/upsert/ingest entry point refuses vectors
declared from a DIFFERENT model. Mixing two models' vectors silently
corrupts every distance/cosine verdict (same dim, incompatible space) —
the silent-wrongness class the reference's write-time dim check
(vectordb.cpp:39-41, 65-67) guards one level down. The pin is opt-in:
legacy metas (no model_id) load as unpinned and undeclared callers
pass, so nothing pre-pin breaks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

PIN = "emb-model-v1"
OTHER = "emb-model-v2"


def _vecs(spark, n=64):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") < n)
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    )


def test_check_model_id_matrix():
    """The shared refusal: only DECLARED-and-different refuses."""
    from custom_vector_database_spark.operators.layout import check_model_id

    check_model_id(None, None, "x")
    check_model_id(PIN, None, "x")  # undeclared caller passes
    check_model_id(None, PIN, "x")  # unpinned artifact passes
    check_model_id(PIN, PIN, "x")
    with pytest.raises(ValueError, match="incompatible spaces"):
        check_model_id(PIN, OTHER, "x")


def test_ivf_model_pin_roundtrip_and_refusals(spark, tmp_path):
    from custom_vector_database_spark.operators.ivf import IvfIndex

    df = _vecs(spark)
    idx = IvfIndex.fit(df, n_clusters=4, model_id=PIN)
    path = str(tmp_path / "ivf")
    idx.save(path)
    loaded = IvfIndex.load(spark, path)
    assert loaded.model_id == PIN  # pin survives save/load
    q = [float(x) for x in df.first()["vec"]]
    delta = df.limit(2).withColumn("id", F.col("id") + 10_000)

    # matching and undeclared callers pass on every entry point
    assert loaded.search(q, 3, model_id=PIN).count() == 3
    assert loaded.search(q, 3).count() == 3
    assert loaded.upsert(delta, model_id=PIN) == 2
    # a declared-different model refuses on every entry point
    with pytest.raises(ValueError, match=OTHER):
        loaded.search(q, 3, model_id=OTHER)
    with pytest.raises(ValueError, match="incompatible spaces"):
        loaded.upsert(delta, model_id=OTHER)
    with pytest.raises(ValueError, match="incompatible spaces"):
        loaded.search_many(
            df.limit(2).select(
                F.col("id").alias("qid"), F.col("vec").alias("qvec")
            ),
            3,
            model_id=OTHER,
        )


def test_ivf_legacy_meta_loads_unpinned(spark, tmp_path):
    """A meta written before the pin (no model_id key) loads as
    unpinned and accepts ANY declared caller — no pre-pin layout
    breaks."""
    import json

    from custom_vector_database_spark.operators.ivf import IvfIndex

    df = _vecs(spark)
    path = str(tmp_path / "ivf")
    IvfIndex.fit(df, n_clusters=4).save(path)
    meta_p = os.path.join(path, "meta.json")
    with open(meta_p) as f:
        meta = json.load(f)
    meta.pop("model_id", None)  # simulate the legacy file
    with open(meta_p, "w") as f:
        json.dump(meta, f)
    loaded = IvfIndex.load(spark, path)
    assert loaded.model_id is None
    q = [float(x) for x in df.first()["vec"]]
    assert loaded.search(q, 3, model_id=OTHER).count() == 3  # no refusal


def test_pq_and_ivfpq_model_pin(spark, tmp_path):
    from custom_vector_database_spark.operators.pq import IvfPqIndex, PqIndex

    df = _vecs(spark)
    q = [float(x) for x in df.first()["vec"]]

    pq = PqIndex.fit(df, m=8, k=4, model_id=PIN)
    p1 = str(tmp_path / "pq")
    pq.save(p1)
    lp = PqIndex.load(spark, p1)
    assert lp.model_id == PIN
    assert lp.search(q, 3, model_id=PIN).count() == 3
    with pytest.raises(ValueError, match="incompatible spaces"):
        lp.search(q, 3, model_id=OTHER)

    ivfpq = IvfPqIndex.fit(df, n_clusters=4, m=8, k=4, model_id=PIN)
    p2 = str(tmp_path / "ivfpq")
    ivfpq.save(p2)
    li = IvfPqIndex.load(spark, p2)
    assert li.model_id == PIN
    assert li.search(q, 3, model_id=PIN).count() == 3
    delta = df.limit(2).withColumn("id", F.col("id") + 10_000)
    with pytest.raises(ValueError, match="incompatible spaces"):
        li.upsert(delta, model_id=OTHER)
    with pytest.raises(ValueError, match="incompatible spaces"):
        li.search_many(
            df.limit(2).select(
                F.col("id").alias("qid"), F.col("vec").alias("qvec")
            ),
            3,
            model_id=OTHER,
        )


def test_ivfbq_lsh_maxsim_model_pin(spark, tmp_path):
    from custom_vector_database_spark.operators.ann import LshIndex
    from custom_vector_database_spark.operators.ivfbq import IvfBqIndex
    from custom_vector_database_spark.operators.maxsim import MaxSimIndex

    df = _vecs(spark)
    q = [float(x) for x in df.first()["vec"]]

    bq = IvfBqIndex.fit(df, n_clusters=4, model_id=PIN)
    p1 = str(tmp_path / "ivfbq")
    bq.save(p1)
    lb = IvfBqIndex.load(spark, p1)
    assert lb.model_id == PIN
    assert lb.search(q, 3, df, model_id=PIN).count() == 3
    with pytest.raises(ValueError, match="incompatible spaces"):
        lb.search(q, 3, df, model_id=OTHER)
    with pytest.raises(ValueError, match="incompatible spaces"):
        lb.upsert(df.limit(1).withColumn("id", F.col("id") + 10_000),
                  model_id=OTHER)

    lsh = LshIndex.fit(df, model_id=PIN)
    p2 = str(tmp_path / "lsh")
    lsh.save(p2)
    ll = LshIndex.load(spark, p2)
    assert ll.model_id == PIN
    assert ll.search(q, 3, model_id=PIN).count() <= 3
    with pytest.raises(ValueError, match="incompatible spaces"):
        ll.search(q, 3, model_id=OTHER)

    tokens = df.limit(32).select(
        (F.col("id") % 8).alias("doc"), F.col("vec").alias("embedding")
    )
    ms = MaxSimIndex.fit(tokens, n_clusters=4, model_id=PIN)
    p3 = str(tmp_path / "maxsim")
    ms.save(p3)
    lm = MaxSimIndex.load(spark, p3)
    assert lm.model_id == PIN
    qbag = df.limit(2).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    assert lm.search(qbag, k=2, model_id=PIN).count() == 2
    with pytest.raises(ValueError, match="incompatible spaces"):
        lm.search(qbag, k=2, model_id=OTHER)
    with pytest.raises(ValueError, match="incompatible spaces"):
        lm.upsert(tokens.limit(1), model_id=OTHER)
    with pytest.raises(ValueError, match="incompatible spaces"):
        lm.search_many(
            qbag.select("qid", F.lit(0).alias("qtid"), "qvec"),
            k=2, model_id=OTHER,
        )


def test_staleness_report_model_pin(spark):
    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.pq import (
        quantization_error_report,
    )

    df = _vecs(spark)
    idx = IvfIndex.fit(df, n_clusters=4, model_id=PIN)
    ok = quantization_error_report(idx, df, df.limit(4), model_id=PIN)
    assert ok.count() == 1
    with pytest.raises(ValueError, match="incompatible spaces"):
        quantization_error_report(idx, df, df.limit(4), model_id=OTHER)


def test_sb_sidecar_model_pin_bootstrap_probe_compact(spark, tmp_path):
    """The streaming artifact: the pin lands in BOTH frames' meta at
    bootstrap, refuses a declared-different batch at ensure AND apply,
    passes matching/undeclared callers, and compact/rebucket carry it
    verbatim (the shape-pin convention)."""
    import json

    from custom_vector_database_spark.streaming.stream_ops import (
        _SB_BANDS,
        _SB_VECS,
        _ensure_sb_sidecar,
        compact_sb_sidecar,
        corpus_semdedup_apply_batch,
    )

    docs = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("doc_id"), "embedding")
    )
    corpus = str(tmp_path / "corpus")
    docs.write.parquet(corpus)
    _ensure_sb_sidecar(
        spark, corpus, "doc_id", "embedding", 4, 16, 16, model_id=PIN
    )
    for frame in (_SB_VECS, _SB_BANDS):
        with open(os.path.join(corpus, frame, "_sidecar_meta.json")) as f:
            assert json.load(f)["model_id"] == PIN

    batch = (
        docs.limit(1)
        .withColumn("doc_id", F.col("doc_id") + 10_000)
        .withColumn("embedding", F.expr("transform(embedding, x -> -x)"))
    )
    with pytest.raises(ValueError, match="incompatible spaces"):
        _ensure_sb_sidecar(
            spark, corpus, "doc_id", "embedding", 4, 16, 16, model_id=OTHER
        )
    with pytest.raises(ValueError, match="incompatible spaces"):
        corpus_semdedup_apply_batch(spark, batch, 1, corpus, model_id=OTHER)
    # matching and undeclared callers pass
    assert corpus_semdedup_apply_batch(
        spark, batch, 1, corpus, model_id=PIN
    ) == 1
    assert corpus_semdedup_apply_batch(
        spark,
        batch.withColumn("doc_id", F.col("doc_id") + 1).withColumn(
            "embedding",
            F.expr(
                "transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.001"
                " AS FLOAT))"
            ),
        ),
        2,
        corpus,
    ) == 0  # near-dup of the batch-1 doc still drops, unpinned caller

    # resolve the write-ahead claims the direct apply calls left behind
    # (the stream runner does this after each applied batch; compact
    # refuses over outstanding claims by design)
    import glob

    for c in glob.glob(os.path.join(corpus, "_sb_claims", "claim_*")):
        os.remove(c)

    # compact (same modulus) and rebucket (new modulus) both carry the pin
    compact_sb_sidecar(spark, corpus)
    with open(os.path.join(corpus, _SB_VECS, "_sidecar_meta.json")) as f:
        assert json.load(f)["model_id"] == PIN
    compact_sb_sidecar(spark, corpus, new_n_buckets=32)
    for frame in (_SB_VECS, _SB_BANDS):
        with open(os.path.join(corpus, frame, "_sidecar_meta.json")) as f:
            m = json.load(f)
            assert m["model_id"] == PIN and m["n_buckets"] == 32
    with pytest.raises(ValueError, match="incompatible spaces"):
        corpus_semdedup_apply_batch(
            spark, batch.withColumn("doc_id", F.col("doc_id") + 5), 3,
            corpus, model_id=OTHER,
        )


def test_stream_vector_ingest_carries_model_pin(spark, tmp_path):
    """The pin rides the streaming upsert path: a declared-different
    model refuses on the first micro-batch (nothing lands), a matching
    declaration streams normally."""
    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.streaming.stream_ops import (
        stream_vector_ingest,
    )

    df = _vecs(spark)
    path = str(tmp_path / "ivf")
    IvfIndex.fit(df, n_clusters=4, model_id=PIN).save(path)
    idx = IvfIndex.load(spark, path)
    n0 = idx.clustered_df().count()
    delta = df.limit(4).withColumn("id", F.col("id") + 10_000)

    bad_dir = str(tmp_path / "bad_delta")
    delta.coalesce(1).write.parquet(bad_dir)
    # foreachBatch wraps the ValueError in a StreamingQueryException —
    # match on the message, not the (wrapped) type
    with pytest.raises(Exception, match="incompatible spaces"):
        stream_vector_ingest(
            spark, bad_dir, idx, delta.schema, model_id=OTHER
        )
    assert idx.clustered_df().count() == n0  # nothing landed

    ok_dir = str(tmp_path / "ok_delta")
    delta.coalesce(1).write.parquet(ok_dir)
    n = stream_vector_ingest(spark, ok_dir, idx, delta.schema, model_id=PIN)
    assert n >= 1
    assert idx.clustered_df().count() == n0 + 4


def test_similarity_join_checks_both_pins(spark):
    """r10 second-review finding: the table-vs-table join was the one
    search surface outside the pin contract — two declared-different
    indexes now refuse; unpinned-either-side passes."""
    from custom_vector_database_spark.operators.ann import (
        LshIndex,
        approx_similarity_join,
    )

    df = _vecs(spark, 32)
    a = LshIndex.fit(df, model_id=PIN)
    b = LshIndex.fit(df, model_id=OTHER)
    u = LshIndex.fit(df)  # unpinned
    with pytest.raises(ValueError, match="incompatible spaces"):
        approx_similarity_join(a, b, threshold=1.2)
    # "either side unpinned passes" — BOTH directions (the opt-in rule
    # must survive an argument-order refactor)
    assert approx_similarity_join(a, u, threshold=1.2).count() >= 0
    assert approx_similarity_join(u, b, threshold=1.2).count() >= 0
    # same pin joins; two separately-FIT indexes re-hash the right side
    # under the left's family, so the cross-index join finds the same
    # self-pairs as the single-index join (one hash family governs)
    a2 = LshIndex.fit(df, model_id=PIN)
    same = approx_similarity_join(a, a, 1.2).count()
    cross = approx_similarity_join(a, a2, 1.2).count()
    assert cross == same


def test_vector_table_rebuild_carries_model_pin(spark, tmp_path):
    """The facade's rebuild pins the built layout: the swapped-in index
    carries model_id through save/load, so later direct upserts against
    the facade's index path refuse a declared-different model."""
    import json

    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.vector_table import VectorTable

    t = VectorTable(spark, str(tmp_path / "tbl")).init(dim=4)
    t.add([([float(i == j) for i in range(4)], None) for j in range(4)])
    idx = t.rebuild(kind="ivf", n_clusters=2, model_id=PIN)
    assert idx.model_id == PIN
    loaded = IvfIndex.load(spark, t._index_path)
    assert loaded.model_id == PIN
    delta = spark.createDataFrame(
        [(100, [0.5, 0.5, 0.0, 0.0])], "id long, vec array<float>"
    )
    with pytest.raises(ValueError, match="incompatible spaces"):
        loaded.upsert(delta, model_id=OTHER)
    assert loaded.upsert(delta, model_id=PIN) == 1
    # undeclared (the reference-parity default) keeps working
    t2 = VectorTable(spark, str(tmp_path / "tbl2")).init(dim=4)
    t2.add([([1.0, 0.0, 0.0, 0.0], None)])
    assert t2.rebuild(kind="ivf", n_clusters=1).model_id is None


def test_multivector_table_rebuild_carries_model_pin(spark, tmp_path):
    from custom_vector_database_spark.multivector_table import (
        MultiVectorTable,
    )
    from custom_vector_database_spark.operators.maxsim import MaxSimIndex

    t = MultiVectorTable(spark, str(tmp_path / "mv")).init(dim=4)
    t.add([([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]], None)])
    idx = t.rebuild(n_clusters=1, model_id=PIN)
    assert idx.model_id == PIN
    assert MaxSimIndex.load(spark, t._index_path).model_id == PIN
