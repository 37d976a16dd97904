"""Round-10 ADVICE regressions (all three r9 advisor findings):

1. A batch reusing the id of a bootstrap-EXCLUDED corpus row (zero-norm /
   NULL-component vector — rows the sign-band sidecar cannot represent as
   band rows) must refuse like any other id reuse: bootstrap now records
   excluded ids as vec=NULL rows in the vecs frame, so the clash probe
   sees the FULL corpus id space (stream_ops.py _ensure_sb_sidecar).
2. ``sidecar_report`` heals a pending two-frame rebucket commit marker
   before reading — post-marker pre-heal the frames sit on different
   moduli and the stale first-frame meta would price files_per_bucket
   against the wrong n_buckets, in exactly the state an operator
   consults the report to decide whether to compact.
3. A one-sided shape pin (exactly one of the two pinned keys present —
   a hand-restored or truncated meta) is CORRUPT meta, not a legacy
   pre-pin sidecar: _check_mh_shape/_check_sb_shape refuse with the
   informative corrupt-meta ValueError instead of int(None)'s bare
   TypeError.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _emb_corpus(spark, n=10):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") < n)
        .select(F.col("vec_id").alias("doc_id"), "embedding")
    )


def test_bootstrap_excluded_id_reuse_refuses(spark, tmp_path):
    """ADVICE r9 #1: the id-reuse clash check must also cover corpus rows
    bootstrap EXCLUDED from the sidecar (undecidable vectors)."""
    from custom_vector_database_spark.streaming.stream_ops import (
        _SB_VECS,
        _ensure_sb_sidecar,
        _read_sb_vecs,
        compact_sb_sidecar,
        corpus_semdedup_apply_batch,
    )

    docs = _emb_corpus(spark, 10)
    zero = spark.createDataFrame(
        [(100, [0.0] * 64)], "doc_id long, embedding array<float>"
    )
    corpus = str(tmp_path / "corpus")
    docs.unionByName(zero).write.parquet(corpus)
    _ensure_sb_sidecar(spark, corpus, "doc_id", "embedding", 4, 16, 16)

    vecs = _read_sb_vecs(spark, os.path.join(corpus, _SB_VECS))
    # the excluded id is represented: vec=NULL row, and NO band rows
    # (it can never surface as a cosine candidate)
    assert vecs.filter(F.col("id") == 100).count() == 1
    assert (
        vecs.filter(F.col("id") == 100).first()["vec"] is None
    )
    assert vecs.count() == 11

    # reusing the EXCLUDED row's id refuses exactly like a sidecar id
    reuse = docs.limit(1).select(
        F.lit(100).cast("long").alias("doc_id"),
        F.expr("transform(embedding, x -> -x)").alias("embedding"),
    )
    with pytest.raises(ValueError, match="reuses"):
        corpus_semdedup_apply_batch(spark, reuse, 1, corpus)
    # ... and reusing a REPRESENTED id still refuses (unchanged contract)
    with pytest.raises(ValueError, match="reuses"):
        corpus_semdedup_apply_batch(
            spark,
            docs.limit(1).withColumn(
                "embedding", F.expr("transform(embedding, x -> -x)")
            ),
            1,
            corpus,
        )

    # the NULL-vec row is inert for dedup decisions: a near-dup of a
    # real doc still drops, a fresh vector still lands
    scaled = docs.limit(1).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.expr(
            "transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.001"
            " AS FLOAT))"
        ).alias("embedding"),
    )
    assert corpus_semdedup_apply_batch(spark, scaled, 1, corpus) == 0
    fresh = docs.limit(1).select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.expr("transform(embedding, x -> -x)").alias("embedding"),
    )
    assert corpus_semdedup_apply_batch(spark, fresh, 2, corpus) == 1
    for c in ("claim_1", "claim_2"):
        p = os.path.join(corpus, "_sb_claims", c)
        if os.path.exists(p):
            os.remove(p)

    # the excluded-id row survives compact AND rebucket (row-set
    # invariance includes it), so the refusal persists
    compact_sb_sidecar(spark, corpus)
    with pytest.raises(ValueError, match="reuses"):
        corpus_semdedup_apply_batch(spark, reuse, 3, corpus)
    compact_sb_sidecar(spark, corpus, new_n_buckets=32)
    with pytest.raises(ValueError, match="reuses"):
        corpus_semdedup_apply_batch(spark, reuse, 4, corpus)


def test_sidecar_report_heals_pending_rebucket(spark, tmp_path):
    """ADVICE r9 #2: sidecar_report consulted in the post-marker
    pre-heal window must roll the rebucket FORWARD and price
    files_per_bucket under the NEW modulus, not the stale meta's."""
    import custom_vector_database_spark.streaming.stream_ops as so

    docs = _emb_corpus(spark, 10)
    corpus = str(tmp_path / "corpus")
    docs.write.parquet(corpus)
    so._ensure_sb_sidecar(spark, corpus, "doc_id", "embedding", 4, 16, 16)
    vecs_dir = os.path.join(corpus, so._SB_VECS)
    bands_dir = os.path.join(corpus, so._SB_BANDS)
    marker = os.path.join(corpus, so._SB_REBUCKET_MARKER)

    # run the REAL rebucket but crash its swap: both tmps complete
    # under the new modulus, marker present, nothing renamed
    real_heal = so._heal_two_frame_rebucket

    def crashing_heal(corpus_dir, marker_name, frame_dirs):
        if os.path.exists(marker):
            raise RuntimeError("simulated crash mid-rebucket")
        return real_heal(corpus_dir, marker_name, frame_dirs)

    so._heal_two_frame_rebucket = crashing_heal
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            so.compact_sb_sidecar(spark, corpus, new_n_buckets=64)
    finally:
        so._heal_two_frame_rebucket = real_heal
    assert os.path.exists(marker)
    # worsen it: bands swapped, vecs not — frames on DIFFERENT moduli,
    # the precise state the advisor flagged
    os.rename(bands_dir, bands_dir + "_old")
    os.rename(bands_dir + "_tmp", bands_dir)

    rep = so.sidecar_report(spark, corpus)
    assert not os.path.exists(marker)  # healed before reading
    assert rep["signband"]["meta"]["n_buckets"] == 64  # new modulus
    assert rep["signband"]["frames"]["_sb_vecs"]["n_rows"] == 10
    assert rep["signband"]["frames"]["_sb_bands"]["n_rows"] == 40
    for d in (vecs_dir, bands_dir):
        assert not os.path.isdir(d + "_tmp")
        assert not os.path.isdir(d + "_old")
        with open(os.path.join(d, "_sidecar_meta.json")) as f:
            assert json.load(f)["n_buckets"] == 64


@pytest.mark.parametrize("family", ["minhash", "signband"])
def test_one_sided_shape_pin_is_corrupt_meta(spark, tmp_path, family):
    """ADVICE r9 #3: exactly one pinned shape key present = corrupt
    meta — informative ValueError with the rebuild remedy, never a
    bare int(None) TypeError."""
    from custom_vector_database_spark.streaming.stream_ops import (
        _MH_SIGS,
        _SB_VECS,
        _ensure_mh_sidecar,
        _ensure_sb_sidecar,
        corpus_neardup_apply_batch,
        corpus_semdedup_apply_batch,
    )

    corpus = str(tmp_path / "corpus")
    if family == "minhash":
        docs = spark.read.parquet(f"{SF}/documents.parquet").limit(5)
        docs.write.parquet(corpus)
        _ensure_mh_sidecar(spark, corpus, "text", 16, 4, 16)
        meta_p = os.path.join(corpus, _MH_SIGS, "_sidecar_meta.json")
        drop_key = "n_bands"
        batch = docs.limit(1).withColumn(
            "doc_id", F.col("doc_id") + 10_000
        )
        probe = lambda: corpus_neardup_apply_batch(  # noqa: E731
            spark, batch, 1, corpus
        )
    else:
        docs = _emb_corpus(spark, 5)
        docs.write.parquet(corpus)
        _ensure_sb_sidecar(spark, corpus, "doc_id", "embedding", 4, 16, 16)
        meta_p = os.path.join(corpus, _SB_VECS, "_sidecar_meta.json")
        drop_key = "band_bits"
        batch = docs.limit(1).select(
            (F.col("doc_id") + 10_000).alias("doc_id"),
            F.expr("transform(embedding, x -> -x)").alias("embedding"),
        )
        probe = lambda: corpus_semdedup_apply_batch(  # noqa: E731
            spark, batch, 1, corpus
        )

    with open(meta_p) as f:
        meta = json.load(f)
    del meta[drop_key]  # hand-restored/truncated meta: one-sided pin
    with open(meta_p, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="corrupt sidecar meta"):
        probe()


# ---------------------------------------------------------------------------
# Round-10 first-review-pass regressions (6 findings, all fixed).
# ---------------------------------------------------------------------------


def test_mh_crash_replay_reconciles_with_corpus(spark, tmp_path):
    """Review finding 1: a stray _fp_expr in corpus_neardup_apply_batch's
    recovery branch NameError'd EVERY minhash crash replay that had
    corpus data. Pin the full replay: claim present + corpus live ->
    recovery reconciles instead of raising, appends nothing twice."""
    import os

    from custom_vector_database_spark.streaming.stream_ops import (
        _MH_CLAIMS,
        _ensure_mh_sidecar,
        corpus_neardup_apply_batch,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(10)
    corpus = str(tmp_path / "corpus")
    docs.write.parquet(corpus)
    _ensure_mh_sidecar(spark, corpus, "text", 16, 4, 16)
    # reversed text: per-doc-distinct garbage shingles, guaranteed fresh
    # under BOTH the exact and the signature-agreement decision
    fresh = docs.limit(2).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.reverse(F.col("text")).alias("text"),
    )
    n1 = corpus_neardup_apply_batch(spark, fresh, 7, corpus)
    assert n1 == 2
    # simulate the crash-after-append: the claim survives (the stream
    # runner would have removed it), so a replay takes the recovery path
    assert os.path.exists(os.path.join(corpus, _MH_CLAIMS, "claim_7"))
    n2 = corpus_neardup_apply_batch(spark, fresh, 7, corpus)
    assert n2 == 0  # reconciled: both docs already landed, nothing re-appends
    assert spark.read.parquet(corpus).count() == 12


def test_sb_bands_rebuild_excludes_null_vec_markers(spark, tmp_path):
    """Review finding 2: the bands-frame heal derived band rows from the
    vec=NULL excluded-id markers (sign_band_keys(NULL) is an ARRAY of
    NULLs, so posexplode emits rows). After losing the bands frame, the
    rebuilt frame must hold exactly the decidable rows' bands and the
    excluded-id refusal must still fire."""
    import os
    import shutil

    from custom_vector_database_spark.streaming.stream_ops import (
        _SB_BANDS,
        _ensure_sb_sidecar,
        _read_sb_bands,
        corpus_semdedup_apply_batch,
    )

    docs = _emb_corpus(spark, 10)
    zero = spark.createDataFrame(
        [(100, [0.0] * 64)], "doc_id long, embedding array<float>"
    )
    corpus = str(tmp_path / "corpus")
    docs.unionByName(zero).write.parquet(corpus)
    _ensure_sb_sidecar(spark, corpus, "doc_id", "embedding", 4, 16, 16)
    shutil.rmtree(os.path.join(corpus, _SB_BANDS))  # crash lost the frame
    _ensure_sb_sidecar(spark, corpus, "doc_id", "embedding", 4, 16, 16)
    bands = _read_sb_bands(spark, os.path.join(corpus, _SB_BANDS))
    assert bands.count() == 40  # 10 decidable docs x 4 bands, no markers
    assert bands.filter(F.col("key").isNull()).count() == 0
    assert bands.filter(F.col("id") == 100).count() == 0
    reuse = docs.limit(1).select(
        F.lit(100).cast("long").alias("doc_id"),
        F.expr("transform(embedding, x -> -x)").alias("embedding"),
    )
    with pytest.raises(ValueError, match="reuses"):
        corpus_semdedup_apply_batch(spark, reuse, 1, corpus)


def test_heal_pending_family_surfaces_in_report_and_plan(spark, tmp_path):
    """Review finding 5: a half-present family (crashed swap) must show
    up — sidecar_report reports it even when the FIRST frame is the
    missing one (meta from the surviving frame), and maintenance_plan
    emits a 'heal' action ranked with the blockers instead of a healthy
    'none' row."""
    import os
    import shutil

    from custom_vector_database_spark.operators.maintenance import (
        maintenance_plan,
    )
    from custom_vector_database_spark.streaming.stream_ops import (
        _SB_VECS,
        _ensure_sb_sidecar,
        sidecar_report,
    )

    docs = _emb_corpus(spark, 10)
    corpus = str(tmp_path / "corpus")
    docs.write.parquet(corpus)
    _ensure_sb_sidecar(spark, corpus, "doc_id", "embedding", 4, 16, 16)
    # the FIRST frame (vecs — the meta-authoritative one) goes missing
    shutil.rmtree(os.path.join(corpus, _SB_VECS))
    rep = sidecar_report(spark, corpus)
    assert "signband" in rep  # not silently omitted
    assert rep["signband"]["frames"]["_sb_vecs"] is None  # heal-pending
    assert rep["signband"]["meta"]["n_buckets"] == 16  # surviving frame's
    plan = maintenance_plan(
        spark, corpora=[("c", corpus)], max_files_per_bucket=1000.0
    )
    assert [a["action"] for a in plan] == ["heal"]
    assert plan[0]["target"] == "c:signband"
    assert not plan[0]["executable"]
