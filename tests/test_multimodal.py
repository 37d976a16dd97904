"""Multimodal plumbing: real Spark-side schemas/batching, stubbed kernels
(no codec libraries in this container — see operators/multimodal.py)."""

from __future__ import annotations

import hashlib

import pytest

from custom_vector_database_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-payload-1", ("image/png", 64, 48, None)),
        (2, "image", b"\x89PNG-fake-payload-two", ("image/png", 32, 32, None)),
        (3, "video", b"\x00\x01" * 500, ("video/mp4", 640, 480, 3500)),
        (4, "audio", b"RIFF-fake", ("audio/wav", None, None, 1200)),
    ]
    return mm.make_media_df(spark, rows).repartition(2).cache()


def test_extract_media_meta(media):
    out = {r["media_id"]: r for r in mm.extract_media_meta(media).collect()}
    assert out[1]["n_bytes"] == len(b"\x89PNG-fake-payload-1")
    assert out[3]["kind"] == "video" and out[3]["duration_ms"] == 3500
    assert out[4]["mime"] == "audio/wav"


def test_image_features_stub_deterministic(media):
    out = {r["media_id"]: r for r in mm.image_features(media).collect()}
    assert set(out) == {1, 2}  # only images
    payload = b"\x89PNG-fake-payload-1"
    assert out[1]["sha256"] == hashlib.sha256(payload).hexdigest()
    assert len(out[1]["features"]) == mm.FEATURE_DIM
    expected0 = hashlib.sha256(payload).digest()[0] / 255.0
    assert out[1]["features"][0] == pytest.approx(expected0, abs=1e-6)


def test_video_frame_sampling(media):
    frames = mm.sample_video_frames(media, every_ms=1000).collect()
    by_id = [f for f in frames if f["media_id"] == 3]
    assert len(by_id) == 3  # 3500ms at 1000ms stride
    assert [f["frame_ms"] for f in sorted(by_id, key=lambda f: f["frame_idx"])] == [
        0, 1000, 2000,
    ]
    # frames partition the payload without overlap or loss
    total = b"".join(
        f["frame_payload"] for f in sorted(by_id, key=lambda f: f["frame_idx"])
    )
    assert total == b"\x00\x01" * 500


def test_resize_images_preserves_media_schema_and_composes(media):
    resized = mm.resize_images(media, width=16, height=16)
    # same shape as MEDIA_SCHEMA (nullability flags differ after mapInPandas)
    assert resized.schema.simpleString() == mm.MEDIA_SCHEMA.simpleString()
    out = {r["media_id"]: r for r in resized.collect()}
    assert set(out) == {1, 2}  # only images
    assert out[1]["meta"]["width"] == 16 and out[1]["meta"]["height"] == 16
    # stub resize shrinks toward the target pixel budget, stays payload-derived
    assert 0 < len(out[1]["payload"]) <= len(b"\x89PNG-fake-payload-1")
    assert set(out[1]["payload"]) <= set(b"\x89PNG-fake-payload-1")
    # output is a valid media table: downstream operators accept it
    feats = {r["media_id"]: r for r in mm.image_features(resized).collect()}
    assert set(feats) == {1, 2}
    assert len(feats[1]["features"]) == mm.FEATURE_DIM


def test_resize_images_deterministic(media):
    a = mm.resize_images(media, width=16, height=16).collect()
    b = mm.resize_images(media, width=16, height=16).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in a} == {
        r["media_id"]: bytes(r["payload"]) for r in b
    }


def test_resize_rejects_bad_target(media):
    with pytest.raises(ValueError):
        mm.resize_images(media, width=0, height=16)


def test_resize_handles_null_dims_and_empty_payload(spark):
    """Nullable meta ints arrive in pandas as NaN; empty payloads are
    valid BinaryType — neither may kill the job."""
    rows = [
        (1, "image", b"some-bytes-here", ("image/png", None, None, None)),
        (2, "image", b"", ("image/png", 8, 8, None)),
    ]
    out = {
        r["media_id"]: r
        for r in mm.resize_images(mm.make_media_df(spark, rows), 4, 4).collect()
    }
    assert len(out[1]["payload"]) > 0  # unknown dims → length-derived budget
    assert bytes(out[2]["payload"]) == b""  # empty in, empty out
    assert out[1]["meta"]["width"] == 4 and out[2]["meta"]["height"] == 4


def test_real_decode_is_explicitly_stubbed(media):
    with pytest.raises(NotImplementedError):
        mm.image_features(media, decode_stub=False)
    with pytest.raises(NotImplementedError):
        mm.sample_video_frames(media, decode_stub=False)
    with pytest.raises(NotImplementedError):
        mm.resize_images(media, 8, 8, decode_stub=False)


def test_video_frames_null_duration(spark):
    rows = [(9, "video", b"\x07" * 40, ("video/mp4", None, None, None))]
    frames = mm.sample_video_frames(mm.make_media_df(spark, rows), every_ms=1000).collect()
    # unknown duration → a single frame covering the whole payload
    assert len(frames) == 1 and bytes(frames[0]["frame_payload"]) == b"\x07" * 40
