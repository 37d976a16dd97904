"""Multimodal (image/audio/video) column plumbing for training-data
pipelines — builder brief.

Design: media payloads are opaque BINARY columns plus a typed metadata
struct; all heavy per-item work (decode, resize, feature extraction, frame
sampling) runs as Arrow-batched ``mapInPandas`` stages so each executor
processes whole record batches without per-row Python overhead. At 100 TB
the pattern is: partition by size-balanced ranges, mapInPandas with a
bounded batch size (spark.sql.execution.arrow.maxRecordsPerBatch), and
emit fixed-width features so downstream stages are columnar again.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT available in this
container, so the decode kernels are deterministic STUBS, clearly marked:
``decode_stub=True`` output derives from the payload bytes alone (length,
checksum-seeded pseudo-pixels). The Spark-side plumbing — schemas, batch
iteration, partitioning, UDF signatures — is real and tested
(tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "make_media_df",
    "extract_media_meta",
    "image_features",
    "resize_images",
    "sample_video_frames",
]

# Canonical media row: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType(), False), False),
    ]
)

_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ms", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
    ]
)


def make_media_df(spark, rows: list[tuple[int, str, bytes, tuple]]) -> DataFrame:
    """Helper: build a media DataFrame from (id, kind, payload, meta) rows."""
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_media_meta(df: DataFrame) -> DataFrame:
    """Cheap columnar metadata pass — pure Catalyst, no Python: payload
    length and declared meta, for filtering/partition planning before any
    expensive decode stage."""
    return df.select(
        "media_id",
        "kind",
        F.length("payload").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


def image_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over image payloads via mapInPandas.
    The stub 'embedding' is FEATURE_DIM floats derived from the payload's
    sha256 digest (computed once, shared with the hex fingerprint column) —
    replace the kernel with a real decode + model forward pass where the
    codec/model libraries exist.

    Real plumbing, stubbed kernel: with ``decode_stub=False`` this raises
    NotImplementedError (no image codec in this environment)."""
    if not decode_stub:
        raise NotImplementedError(
            "real image decode requires PIL/libjpeg — not available here; "
            "use decode_stub=True for the deterministic fake kernel"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            digests = payloads.map(lambda b: hashlib.sha256(b).digest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": digests.map(bytes.hex),
                    "features": digests.map(
                        lambda d: [d[i] / 255.0 for i in range(FEATURE_DIM)]
                    ),
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(batches, _FEATURES_SCHEMA)


def resize_images(
    df: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """Resize pass over image payloads: same MEDIA_SCHEMA out, payload
    replaced by the resized encoding and ``meta.width/height`` updated —
    so resize stages compose with any other media operator (the output is
    again a valid media table).

    Real plumbing, stubbed kernel: the stub 'resize' deterministically
    re-samples the payload bytes to a size proportional to the target
    pixel count (so size-dependent downstream behavior is exercised);
    ``decode_stub=False`` raises — no image codec in this container."""
    if width <= 0 or height <= 0:
        raise ValueError("target width/height must be positive")
    if not decode_stub:
        raise NotImplementedError(
            "real resize requires PIL/libjpeg — not available here; "
            "use decode_stub=True for the deterministic fake kernel"
        )

    def _stub_resize(payload: bytes, w0, h0) -> bytes:
        # target byte budget ∝ target pixels, bounded by the source length;
        # sample evenly across the source so the bytes stay payload-derived.
        # Nullable ints arrive from Arrow as NaN floats — treat as unknown.
        if not payload:
            return b""
        w0 = 0 if w0 is None or w0 != w0 else int(w0)
        h0 = 0 if h0 is None or h0 != h0 else int(h0)
        src_px = w0 * h0 or len(payload)
        budget = max(1, min(len(payload), (len(payload) * width * height) // max(src_px, 1)))
        step = len(payload) / budget
        return bytes(payload[int(i * step)] for i in range(budget))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["payload"] = [
                _stub_resize(p, w0, h0)
                for p, w0, h0 in zip(pdf["payload"], pdf["width"], pdf["height"])
            ]
            out["width"] = width
            out["height"] = height
            yield out

    flat = df.filter(F.col("kind") == "image").select(
        "media_id",
        "kind",
        "payload",
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )
    flat_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), False),
            T.StructField("mime", T.StringType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.IntegerType(), True),
        ]
    )
    resized = flat.mapInPandas(batches, flat_schema)
    return resized.select(
        "media_id",
        "kind",
        "payload",
        F.struct("mime", "width", "height", "duration_ms").alias("meta"),
    )


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled frame
    (media_id, frame_idx, frame_ms, frame_payload). The stub kernel slices
    the payload deterministically instead of invoking a real demuxer."""
    if not decode_stub:
        raise NotImplementedError(
            "real frame sampling requires ffmpeg — not available here; "
            "use decode_stub=True for the deterministic fake kernel"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "frame_ms": [],
                "frame_payload": [],
            }
            for _, row in pdf.iterrows():
                duration = row["duration_ms"]
                # nullable ints arrive from Arrow as NaN floats
                duration = 0 if duration is None or duration != duration else int(duration)
                payload = row["payload"]
                n_frames = max(duration // every_ms, 1)
                for i in range(int(n_frames)):
                    lo = (i * len(payload)) // int(n_frames)
                    hi = ((i + 1) * len(payload)) // int(n_frames)
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(i * every_ms)
                    out["frame_payload"].append(payload[lo:hi])
            yield pd.DataFrame(out)

    src = df.filter(F.col("kind") == "video").select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    )
    return src.mapInPandas(batches, _FRAMES_SCHEMA)
