"""The CDC near-dup payload ingest family (round 11,
streaming/stream_ops.py + operators/multimodal.payload_cdc_chunks):
codec-free content-defined chunking catches re-containered media that
byte-identical md5 (fp_kind='payload_md5') misses.

The expected drop verdicts in these tests are recomputed by an
INDEPENDENT pure-Python reference chunker over the raw bytes — pinning
the Spark expression's hex/ascii arithmetic against plain byte math,
not against itself.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"

W, B, MOD, MASK = 8, 101, 1048573, 16
_P = [pow(B, j, MOD) for j in range(W)]

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])


def ref_chunks(data: bytes, mask: int = MASK) -> list[str]:
    """Reference CDC chunker over raw bytes (independent of the SQL)."""
    H = data.hex().upper()
    vals = [ord(H[2 * i]) * 131 + ord(H[2 * i + 1]) for i in range(len(data))]
    bnds = [
        i for i in range(W - 1, len(data))
        if (sum(vals[i - j] * _P[j] for j in range(W)) % MOD) % mask == 0
    ]
    if not bnds or bnds[-1] != len(data) - 1:
        bnds.append(len(data) - 1)
    out, prev = [], -1
    for b in bnds:
        out.append(
            hashlib.md5(H[2 * (prev + 1):2 * (b + 1)].encode()).hexdigest()
        )
        prev = b
    return out


def ref_verdicts(corpus: dict[int, bytes], delta: dict[int, bytes],
                 pct: int = 50) -> set[int]:
    """Expected DROPPED delta ids under the family's decision rule."""
    cch = {i: set(ref_chunks(p)) for i, p in corpus.items()}
    dch = {i: set(ref_chunks(p)) for i, p in delta.items()}
    dropped = set()
    for b, chb in dch.items():
        n = len(chb)
        cand = [chs for a, chs in dch.items() if a < b] + list(cch.values())
        if any(len(chb & chs) * 100 >= pct * n for chs in cand):
            dropped.add(b)
    return dropped


def _texts(spark, lo, hi) -> dict[int, str]:
    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .select("doc_id", "text")
        .collect()
    )
    return {r["doc_id"]: r["text"] for r in rows}


def _df(spark, payloads: dict[int, bytes]):
    return spark.createDataFrame(
        sorted(payloads.items()), MEDIA_SCHEMA
    )


def test_spark_chunker_matches_reference(spark):
    from custom_vector_database_spark.operators.multimodal import (
        payload_cdc_chunks,
    )

    texts = _texts(spark, 0, 30)
    payloads = {i: t.encode() for i, t in texts.items()}
    got = {
        r["media_id"]: list(r["chunks"])
        for r in _df(spark, payloads).select(
            "media_id", payload_cdc_chunks("payload").alias("chunks")
        ).collect()
    }
    for i, p in payloads.items():
        assert got[i] == ref_chunks(p), f"doc {i}"


def test_cdc_ingest_drops_recontainered_and_copies(spark, tmp_path):
    """End-to-end stream: byte-copies and re-containered payloads drop,
    genuinely fresh payloads keep — verdicts pinned by the Python
    reference, not by the engine under test."""
    from custom_vector_database_spark.streaming.stream_ops import (
        _CDC_CHUNKS,
        stream_corpus_cdc_ingest,
    )

    texts = _texts(spark, 0, 10)
    corpus_p = {i: t.encode() for i, t in texts.items()}
    delta_p = {}
    for i, t in texts.items():
        if i < 3:  # re-containered: header+footer around the same bytes
            delta_p[10_000 + i] = b"RIFFHDR00001" + t.encode() + b"TRAILER0"
        if 3 <= i < 6:  # verbatim byte-copies under fresh ids
            delta_p[20_000 + i] = t.encode()
        if i >= 6:  # reversed text: content-fresh payloads
            delta_p[30_000 + i] = t[::-1].encode()

    corpus = str(tmp_path / "corpus")
    delta = str(tmp_path / "delta")
    _df(spark, corpus_p).withColumnRenamed("media_id", "media_id").write.parquet(corpus)
    _df(spark, delta_p).repartition(1).write.parquet(delta)

    n_batches = stream_corpus_cdc_ingest(
        spark, delta, corpus, doc_schema=MEDIA_SCHEMA,
        id_col="media_id", payload_col="payload",
    )
    assert n_batches == 1
    dropped = ref_verdicts(corpus_p, delta_p)
    assert any(20_000 <= d < 30_000 for d in dropped)  # copies drop
    assert any(10_000 <= d < 20_000 for d in dropped)  # retags drop
    expected = set(corpus_p) | (set(delta_p) - dropped)
    got = {
        r["media_id"]
        for r in spark.read.parquet(corpus).select("media_id").collect()
    }
    assert got == expected
    meta = json.load(
        open(os.path.join(corpus, _CDC_CHUNKS, "_sidecar_meta.json"))
    )
    assert meta["cdc_mask"] == MASK and meta["cdc_window"] == W


def test_cdc_intra_batch_one_hop(spark, tmp_path):
    """Within a batch the smaller id survives; the verdict is one-hop
    (b drops against ANY smaller near-dup sibling, not a chain)."""
    from custom_vector_database_spark.streaming.stream_ops import (
        _ensure_cdc_sidecar,
        corpus_cdc_apply_batch,
    )

    texts = _texts(spark, 0, 4)
    corpus_p = {i: t.encode() for i, t in texts.items()}
    corpus = str(tmp_path / "corpus")
    _df(spark, corpus_p).write.parquet(corpus)
    _ensure_cdc_sidecar(spark, corpus, "media_id", "payload", 16, MASK)

    t = texts[0][::-1].encode()  # fresh content
    batch_p = {
        100: t,
        101: b"HDRX" + t,          # near-dup of 100 -> dropped
        102: texts[1][::-1].encode(),  # fresh
    }
    dropped = ref_verdicts(corpus_p, batch_p)
    assert 101 in dropped and 100 not in dropped
    n = corpus_cdc_apply_batch(
        spark, _df(spark, batch_p), 0, corpus,
        id_col="media_id", payload_col="payload",
    )
    got = {
        r["media_id"]
        for r in spark.read.parquet(corpus).select("media_id").collect()
    }
    assert got == set(corpus_p) | (set(batch_p) - dropped)
    assert n == len(set(batch_p) - dropped)


def test_cdc_refusals(spark, tmp_path):
    from custom_vector_database_spark.streaming.stream_ops import (
        _CDC_CHUNKS,
        _ensure_cdc_sidecar,
        corpus_cdc_apply_batch,
    )

    texts = _texts(spark, 0, 4)
    corpus = str(tmp_path / "corpus")
    _df(spark, {i: t.encode() for i, t in texts.items()}).write.parquet(
        corpus
    )
    _ensure_cdc_sidecar(spark, corpus, "media_id", "payload", 16, MASK)

    # NULL payload refuses
    nullb = spark.createDataFrame([(900, None)], MEDIA_SCHEMA)
    with pytest.raises(ValueError, match="NULL or empty"):
        corpus_cdc_apply_batch(spark, nullb, 1, corpus,
                               id_col="media_id", payload_col="payload")
    # EMPTY payload refuses
    emptyb = spark.createDataFrame([(901, b"")], MEDIA_SCHEMA)
    with pytest.raises(ValueError, match="NULL or empty"):
        corpus_cdc_apply_batch(spark, emptyb, 1, corpus,
                               id_col="media_id", payload_col="payload")
    # duplicate id within a batch refuses
    dup = spark.createDataFrame(
        [(902, b"abcdefghijkl"), (902, b"zzzzzzzzzzzz")], MEDIA_SCHEMA
    )
    with pytest.raises(ValueError, match="duplicate"):
        corpus_cdc_apply_batch(spark, dup, 1, corpus,
                               id_col="media_id", payload_col="payload")
    # chunking-shape pin: a different mask refuses with the remedy
    fresh = spark.createDataFrame([(903, b"fresh payload bytes")],
                                  MEDIA_SCHEMA)
    with pytest.raises(ValueError, match="pins chunking shape"):
        corpus_cdc_apply_batch(spark, fresh, 1, corpus,
                               id_col="media_id", payload_col="payload",
                               mask=32)
    # corrupt meta (missing pins) refuses
    meta_p = os.path.join(corpus, _CDC_CHUNKS, "_sidecar_meta.json")
    meta = json.load(open(meta_p))
    meta.pop("cdc_mask")
    with open(meta_p, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="corrupt CDC sidecar meta"):
        corpus_cdc_apply_batch(spark, fresh, 1, corpus,
                               id_col="media_id", payload_col="payload")


def test_cdc_crash_replay_reconciles(spark, tmp_path):
    """A replayed batch (claim marker present) recomputes identical
    verdicts, re-appends only what is missing, and never duplicates —
    across all three crash points: after claim, after partial sidecar
    append, after full sidecar append (corpus append lost)."""
    from custom_vector_database_spark.streaming.stream_ops import (
        _CDC_CHUNKS,
        _CDC_CLAIMS,
        _ensure_cdc_sidecar,
        _read_cdc_sidecar,
        corpus_cdc_apply_batch,
    )

    texts = _texts(spark, 0, 6)
    corpus_p = {i: t.encode() for i, t in texts.items()}
    corpus = str(tmp_path / "corpus")
    _df(spark, corpus_p).write.parquet(corpus)
    _ensure_cdc_sidecar(spark, corpus, "media_id", "payload", 16, MASK)

    batch_p = {
        200: texts[0][::-1].encode(),       # fresh
        201: texts[0].encode(),             # byte-copy -> dropped
        202: texts[1][::-1].encode(),       # fresh
    }
    dropped = ref_verdicts(corpus_p, batch_p)
    batch = _df(spark, batch_p)

    # crash point 1: claim written, nothing else (plant claim, replay)
    os.makedirs(os.path.join(corpus, _CDC_CLAIMS), exist_ok=True)
    claim = os.path.join(corpus, _CDC_CLAIMS, "claim_5")
    with open(claim, "a"):
        pass
    n = corpus_cdc_apply_batch(spark, batch, 5, corpus,
                               id_col="media_id", payload_col="payload")
    assert n == len(set(batch_p) - dropped)
    final = spark.read.parquet(corpus)
    assert final.count() == len(corpus_p) + n
    assert final.select("media_id").distinct().count() == final.count()

    # crash point 3: everything appended, marker lost -> full replay
    # must re-append NOTHING (claim still present simulates the crash
    # window between the appends and the applied-batch record)
    n2 = corpus_cdc_apply_batch(spark, batch, 5, corpus,
                                id_col="media_id", payload_col="payload")
    assert n2 == 0
    final2 = spark.read.parquet(corpus)
    assert final2.count() == final.count()
    side = _read_cdc_sidecar(spark, os.path.join(corpus, _CDC_CHUNKS))
    assert (
        side.groupBy("id", "fp").count().filter(F.col("count") > 1).count()
        == 0
    )  # no duplicated sidecar rows either
    os.remove(claim)


def test_cdc_steady_state_never_reads_corpus(spark, tmp_path):
    """Garbage the corpus part files: a steady-state batch still applies
    (the probe answers from the bucket-pruned sidecar alone)."""
    from custom_vector_database_spark.streaming.stream_ops import (
        _ensure_cdc_sidecar,
        corpus_cdc_apply_batch,
    )

    texts = _texts(spark, 0, 8)
    corpus_p = {i: t.encode() for i, t in texts.items()}
    corpus = str(tmp_path / "corpus")
    _df(spark, corpus_p).write.parquet(corpus)
    _ensure_cdc_sidecar(spark, corpus, "media_id", "payload", 16, MASK)

    part_files = glob.glob(corpus + "/part-*.parquet")
    assert part_files
    saved = str(tmp_path / "saved")
    shutil.copytree(corpus, saved)
    for p in part_files:
        with open(p, "wb") as f:
            f.write(b"NOT A PARQUET FILE")
    batch_p = {
        300: texts[0][::-1].encode(),  # fresh
        301: texts[0].encode(),        # byte-copy of corpus -> dropped
    }
    dropped = ref_verdicts(corpus_p, batch_p)
    assert 301 in dropped
    n = corpus_cdc_apply_batch(spark, _df(spark, batch_p), 9, corpus,
                               id_col="media_id", payload_col="payload")
    assert n == len(set(batch_p) - dropped)
    for p in part_files:
        shutil.copyfile(saved + "/" + p.rsplit("/", 1)[1], p)


def test_cdc_compact_and_rebucket(spark, tmp_path):
    """Compaction rewrites to one file per bucket, carries the shape
    pins verbatim, refuses over claims; rebucketing changes the modulus
    atomically and probes still drop known duplicates."""
    from custom_vector_database_spark.streaming.stream_ops import (
        _CDC_CHUNKS,
        _CDC_CLAIMS,
        _ensure_cdc_sidecar,
        compact_cdc_sidecar,
        corpus_cdc_apply_batch,
    )

    texts = _texts(spark, 0, 6)
    corpus_p = {i: t.encode() for i, t in texts.items()}
    corpus = str(tmp_path / "corpus")
    _df(spark, corpus_p).write.parquet(corpus)
    _ensure_cdc_sidecar(spark, corpus, "media_id", "payload", 8, MASK)
    for b, i in enumerate(range(3)):
        corpus_cdc_apply_batch(
            spark, _df(spark, {400 + i: texts[i][::-1].encode() + bytes([65 + i]) * 4}),
            b, corpus, id_col="media_id", payload_col="payload",
        )
    claims = glob.glob(os.path.join(corpus, _CDC_CLAIMS, "claim_*"))
    assert claims
    with pytest.raises(ValueError, match="unresolved ingest claim"):
        compact_cdc_sidecar(spark, corpus)
    for c in claims:
        os.remove(c)
    stats = compact_cdc_sidecar(spark, corpus)
    assert stats["files_after"] < stats["files_before"]
    meta = json.load(
        open(os.path.join(corpus, _CDC_CHUNKS, "_sidecar_meta.json"))
    )
    assert meta["cdc_mask"] == MASK and meta["cdc_window"] == W

    # rebucket: new modulus pinned, duplicate still drops post-swap
    stats = compact_cdc_sidecar(spark, corpus, new_n_buckets=4)
    assert stats["n_buckets"] == 4
    n = corpus_cdc_apply_batch(
        spark, _df(spark, {500: texts[0].encode()}), 50, corpus,
        id_col="media_id", payload_col="payload",
    )
    assert n == 0  # byte-copy of corpus doc 0 still dropped


def test_cdc_in_sidecar_report_and_maintenance(spark, tmp_path):
    from custom_vector_database_spark.operators.maintenance import (
        run_maintenance,
    )
    from custom_vector_database_spark.streaming.stream_ops import (
        _ensure_cdc_sidecar,
        corpus_cdc_apply_batch,
        sidecar_report,
    )

    texts = _texts(spark, 0, 6)
    corpus = str(tmp_path / "corpus")
    _df(spark, {i: t.encode() for i, t in texts.items()}).write.parquet(
        corpus
    )
    _ensure_cdc_sidecar(spark, corpus, "media_id", "payload", 2, MASK)
    for b in range(3):
        corpus_cdc_apply_batch(
            spark,
            _df(spark, {600 + b: texts[b][::-1].encode() + bytes([70 + b]) * 4}),
            b, corpus, id_col="media_id", payload_col="payload",
        )
    rep = sidecar_report(spark, corpus)
    assert "payload_cdc" in rep
    fam = rep["payload_cdc"]
    assert fam["meta"]["cdc_mask"] == MASK
    assert fam["frames"]["_cdc_chunks"]["n_rows"] > 0
    assert len(fam["outstanding_claims"]) == 3  # direct applies claim

    # maintenance: claims block compaction (resolve_claims first), then
    # a fragmented family compacts through the autopilot
    plan, executed = run_maintenance(
        spark, corpora=[("m", corpus)], max_files_per_bucket=1.0,
        execute=True,
    )
    assert any(
        a["target"] == "m:payload_cdc" and a["action"] == "resolve_claims"
        for a in plan
    )
    assert not executed
    for c in glob.glob(os.path.join(corpus, "_cdc_claims", "claim_*")):
        os.remove(c)
    plan, executed = run_maintenance(
        spark, corpora=[("m", corpus)], max_files_per_bucket=1.0,
        execute=True,
    )
    assert [e["target"] for e in executed] == ["m:payload_cdc"]
