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


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) over payload BYTES — the codec-free
# NEAR-dup fingerprint for media (round 11). ``payload_md5`` catches
# byte-identical files only; a re-encoded container (same content
# stream, different header/footer bytes) slips past it — the most common
# duplicate class in scraped multimodal corpora. CDC splits the payload
# at positions where a rolling hash of the trailing 8-byte window hits a
# boundary condition, so chunk boundaries move WITH the content: bytes
# inserted at the front (a retagged header) shift every downstream
# boundary by the same amount and the downstream chunks still hash
# identically — two containers of one payload then share almost all
# chunk fingerprints, and a chunk-overlap threshold catches them with no
# codec in sight.
#
# The boundary rule is position-LOCAL (a position qualifies from the 8
# bytes ending there alone, no min/max-size carry-over), which keeps the
# whole chunker one Catalyst projection — and lets a DuckDB oracle
# recompute every boundary, chunk hash, and overlap verdict exactly
# (both engines run the identical integer polynomial over the UPPERCASE
# hex encoding; DuckDB's hex() is lowercase, hence the upper()).
# Arithmetic is exact BIGINT: byte values enter as
# ascii(hi)*131+ascii(lo) <= 9240, powers are pre-reduced mod 1048573,
# so the 8-term dot is < 7.8e10 — far inside BIGINT.
# ---------------------------------------------------------------------------
CDC_WINDOW = 8          # rolling-hash window, bytes
CDC_BASE = 101          # polynomial base (Rabin-Karp style)
CDC_MOD = 1048573       # prime modulus for the window hash
CDC_MASK = 16           # boundary iff hash % CDC_MASK == 0 (~16 B chunks)
_CDC_POWERS = [pow(CDC_BASE, j, CDC_MOD) for j in range(CDC_WINDOW)]
_PLIT = ",".join(str(p) for p in _CDC_POWERS)


def payload_cdc_chunks(payload_sql: str, mask: int = CDC_MASK):
    """Column: array<string> of md5 chunk fingerprints of a BINARY
    payload under content-defined chunking. ``payload_sql`` is the SQL
    text of the payload expression (usually a column name). Empty/NULL
    payloads are the caller's problem (refuse them upstream — an empty
    chunk set can neither dedup nor reconcile)."""
    # Every shared subexpression is LET-BOUND once via single-element
    # transform arrays (the nearest_centroid_sql convention): h (hex
    # payload), n (byte length), vs (per-byte values — one element_at
    # per polynomial term instead of two substring+ascii calls), bnd0
    # (boundary candidates — computed ONCE, the naive form evaluated the
    # rolling hash three times through the CASE arms and cost ~4x).
    hash_i = (
        "(aggregate(sequence(0, 7), CAST(0 AS BIGINT), (s, j) -> "
        "s + element_at(vs, CAST(i-j+1 AS INT)) * "
        f"element_at(array({_PLIT}), CAST(j+1 AS INT))) % {CDC_MOD})"
    )
    return F.expr(f"""
      element_at(transform(array(upper(hex({payload_sql}))), h ->
       element_at(transform(array(CAST(length({payload_sql}) AS BIGINT)), n ->
        element_at(transform(array(
          transform(sequence(1, greatest(n, CAST(1 AS BIGINT))), q ->
            CAST(ascii(substring(h, CAST(2*q-1 AS INT), 1)) AS BIGINT)*131 +
            CAST(ascii(substring(h, CAST(2*q AS INT), 1)) AS BIGINT))
        ), vs ->
         element_at(transform(array(
           CASE WHEN n >= 8
                THEN filter(sequence(CAST(7 AS BIGINT), n-1),
                            i -> {hash_i} % {int(mask)} = 0)
                ELSE array() END
         ), b0 ->
          element_at(transform(array(
            CASE WHEN size(b0) > 0 AND element_at(b0, -1) = n-1 THEN b0
                 ELSE concat(b0, array(n-1)) END
          ), bs -> transform(bs, (bk, k0) ->
            md5(substring(h,
                CAST(2*(IF(k0 = 0, CAST(-1 AS BIGINT),
                           element_at(bs, k0)) + 1) + 1 AS INT),
                CAST(2*(bk - IF(k0 = 0, CAST(-1 AS BIGINT),
                                element_at(bs, k0))) AS INT)))
          )), 1)
         ), 1)
        ), 1)
       ), 1)
      ), 1)
    """)


def payload_cdc_chunks_duck(payload_sql: str, mask: int = CDC_MASK) -> str:
    """The DuckDB twin of payload_cdc_chunks — identical boundaries,
    identical chunk md5s (oracle use). Returns SQL for LIST(VARCHAR);
    meant to be applied in a CTE where ``h``/``n`` aliases are awkward,
    so it inlines everything like the Spark expression does."""
    hash_i = (
        "(list_sum(list_transform(range(0, 8), j -> "
        "CAST(ascii(substr(h, 2*(i-j)+1, 1))*131 + "
        "ascii(substr(h, 2*(i-j)+2, 1)) AS BIGINT) "
        f"* ([{_PLIT}])[j+1])) % {CDC_MOD})"
    )
    bnd0 = (
        f"list_filter(range(7, n), i -> {hash_i} % {int(mask)} = 0)"
    )
    return f"""(
      WITH _p AS (SELECT upper(hex({payload_sql})) AS h,
                         octet_length({payload_sql}) AS n),
      _b AS (SELECT h, n, {bnd0} AS bnd0 FROM _p),
      _c AS (SELECT h, n,
               CASE WHEN len(bnd0) > 0 AND bnd0[-1] = n-1 THEN bnd0
                    ELSE list_append(bnd0, n-1) END AS bnds FROM _b)
      SELECT list_transform(range(1, len(bnds)+1), k ->
        md5(substr(h,
            2*(CASE WHEN k = 1 THEN 0 ELSE bnds[k-1]+1 END) + 1,
            2*(bnds[k] - (CASE WHEN k = 1 THEN -1 ELSE bnds[k-1] END)))))
      FROM _c
    )"""
