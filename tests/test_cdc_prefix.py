"""Round-13 CDC prefix filtering (PPJoin-style, Xiao et al. WWW 2008):
frequency-aware candidate pruning for the CDC ingest family's corpus
probe. The r12 sf100 probe measured an 86M-row join fan-out for a
200-payload batch (hottest chunk fp in 1.07M corpus payloads); the fix
ranks each arriving payload's chunks by document frequency (a sketch
maintained beside the sidecar) and joins only the (1−t)|b|+1 RAREST —
pigeonhole-complete, so drop verdicts are BIT-IDENTICAL to the naive
join (pinned here against the independent Python reference chunker from
tests/test_cdc_ingest.py), and sketch staleness or absence can only
cost pruning, never a verdict."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.test_cdc_ingest import (
    MEDIA_SCHEMA,
    _df,
    _texts,
    ref_chunks,
    ref_verdicts,
)

# shared "license header" every corpus payload starts with — varied
# text (a repeating byte pattern would roll into ONE giant chunk and
# defeat the fixture), identical across docs, so its ~21 chunks all
# have df = |corpus|: the hot-chunk pathology in miniature
_BOILER = " ".join(
    f"license header clause {i} all rights reserved worldwide"
    for i in range(12)
)


def _mk_corpus(spark, tmp_path, payloads):
    corpus = str(tmp_path / "corpus")
    _df(spark, payloads).write.parquet(corpus)
    return corpus


def _hot_fixture(spark):
    """Real document texts behind a SHARED boilerplate block (hot
    chunks, df = 40) plus per-doc unique bodies. Verified in plain
    Python: the byte-copy and the re-containered payload drop, the
    boiler-only and fresh payloads keep."""
    texts = _texts(spark, 0, 40)
    corpus_p = {i: (_BOILER + " " + t).encode() for i, t in texts.items()}
    delta_p = {
        # byte-copy of corpus doc 3 → must DROP
        10_003: corpus_p[3],
        # re-containered corpus doc 5 → must DROP
        10_005: b"HDR0" + corpus_p[5] + b"TRL0",
        # carries the hot boilerplate but a long fresh body → must KEEP
        10_007: (
            _BOILER + " " + (texts[20][::-1] + " " + texts[21][::-1]) * 2
        ).encode(),
        # completely fresh → must KEEP
        10_009: (texts[25][::-1] + " " + texts[26][::-1]).encode(),
    }
    return corpus_p, delta_p


def test_hot_chunk_verdicts_match_reference(spark, tmp_path):
    """The case the prefix filter exists for: hot chunks shared by the
    whole corpus must not change a single verdict."""
    from custom_vector_database_spark.streaming.stream_ops import (
        _ensure_cdc_sidecar,
        corpus_cdc_apply_batch,
    )

    corpus_p, delta_p = _hot_fixture(spark)
    corpus = _mk_corpus(spark, tmp_path, corpus_p)
    _ensure_cdc_sidecar(spark, corpus, "media_id", "payload", 16, 16)
    n = corpus_cdc_apply_batch(
        spark, _df(spark, delta_p), 1, corpus,
        id_col="media_id", payload_col="payload",
    )
    dropped = ref_verdicts(corpus_p, delta_p)
    assert 10_003 in dropped and 10_005 in dropped
    assert 10_007 not in dropped and 10_009 not in dropped
    assert n == len(delta_p) - len(dropped)
    got = {
        r["media_id"]
        for r in spark.read.parquet(corpus).select("media_id").collect()
    }
    assert got == set(corpus_p) | (set(delta_p) - dropped)


def test_df_sketch_lifecycle(spark, tmp_path):
    """Bootstrap writes the hot-only fold; an apply appends its delta;
    compact folds everything back to batch_id=-1 hot-only rows."""
    from custom_vector_database_spark.streaming.stream_ops import (
        _CDC_CHUNKS,
        _CDC_DF_SUBDIR,
        CDC_HOT_DF_MIN,
        _ensure_cdc_sidecar,
        _read_cdc_df,
        compact_cdc_sidecar,
        corpus_cdc_apply_batch,
    )

    corpus_p, delta_p = _hot_fixture(spark)
    corpus = _mk_corpus(spark, tmp_path, corpus_p)
    _ensure_cdc_sidecar(spark, corpus, "media_id", "payload", 16, 16)
    sidecar = os.path.join(corpus, _CDC_CHUNKS)
    assert os.path.isdir(os.path.join(sidecar, _CDC_DF_SUBDIR))

    boot = _read_cdc_df(spark, sidecar).collect()
    assert boot, "bootstrap must fold the hot boilerplate chunks"
    assert all(r["batch_id"] == -1 and r["n"] >= CDC_HOT_DF_MIN for r in boot)
    # the hot boilerplate chunks really are the fold's content
    hot_fps = {r["fp"] for r in boot}
    boiler_fps = set(ref_chunks(_BOILER.encode()))
    assert hot_fps & boiler_fps

    corpus_cdc_apply_batch(
        spark, _df(spark, delta_p), 7, corpus,
        id_col="media_id", payload_col="payload",
    )
    after = _read_cdc_df(spark, sidecar)
    deltas = after.filter(F.col("batch_id") == 7).collect()
    assert deltas, "an apply with survivors must append its df delta"
    assert all(r["n"] >= 1 for r in deltas)

    # resolve the apply's claim the way a drained stream would — compact
    # rightly refuses over outstanding claims
    for c in os.listdir(os.path.join(corpus, "_cdc_claims")):
        os.remove(os.path.join(corpus, "_cdc_claims", c))
    stats = compact_cdc_sidecar(spark, corpus)
    assert stats["n_rows"] > 0
    folded = _read_cdc_df(spark, sidecar).collect()
    assert folded and all(
        r["batch_id"] == -1 and r["n"] >= CDC_HOT_DF_MIN for r in folded
    )


def test_missing_sketch_falls_back_correct(spark, tmp_path):
    """A pre-r13 sidecar (no _df dir) must still produce exact verdicts
    — every chunk ranks df=0 and the prefix is merely unpruned."""
    from custom_vector_database_spark.streaming.stream_ops import (
        _CDC_CHUNKS,
        _CDC_DF_SUBDIR,
        _ensure_cdc_sidecar,
        corpus_cdc_apply_batch,
    )

    corpus_p, delta_p = _hot_fixture(spark)
    corpus = _mk_corpus(spark, tmp_path, corpus_p)
    _ensure_cdc_sidecar(spark, corpus, "media_id", "payload", 16, 16)
    shutil.rmtree(os.path.join(corpus, _CDC_CHUNKS, _CDC_DF_SUBDIR))
    n = corpus_cdc_apply_batch(
        spark, _df(spark, delta_p), 1, corpus,
        id_col="media_id", payload_col="payload",
    )
    dropped = ref_verdicts(corpus_p, delta_p)
    assert n == len(delta_p) - len(dropped)


@pytest.mark.parametrize("pct", [0, 30, 100])
def test_threshold_edges_unchanged(spark, tmp_path, pct):
    """pct=100 shrinks the prefix to the single rarest chunk; pct=0
    keeps every chunk. Verdicts at both edges must match the reference
    rule exactly (pigeonhole correctness of the prefix size)."""
    from custom_vector_database_spark.streaming.stream_ops import (
        _ensure_cdc_sidecar,
        corpus_cdc_apply_batch,
    )

    corpus_p, delta_p = _hot_fixture(spark)
    corpus = _mk_corpus(spark, tmp_path, corpus_p)
    _ensure_cdc_sidecar(spark, corpus, "media_id", "payload", 16, 16)
    n = corpus_cdc_apply_batch(
        spark, _df(spark, delta_p), 1, corpus,
        id_col="media_id", payload_col="payload", overlap_pct=pct,
    )
    dropped = ref_verdicts(corpus_p, delta_p, pct=pct)
    assert n == len(delta_p) - len(dropped)
