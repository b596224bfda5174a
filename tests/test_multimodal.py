"""Multimodal column plumbing: binary payloads + typed metadata,
Arrow-batched decode/featurize/frame-sample with the stub codec, and
the NotImplementedError gate for real codecs."""

from __future__ import annotations

import importlib.util

import pytest

from pyspark.sql import functions as F

from sensor_data_pipeline___spark.operators import multimodal as mm


def _fake_payload(w: int, h: int, frames: int, body: bytes) -> bytes:
    return f"{w}:{h}:{frames}".encode() + b";" + body


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, _fake_payload(4, 2, 3, bytes(range(24))), "video", mm.FAKE_CODEC),
        (2, _fake_payload(8, 8, 1, b"\x01\x02\x03\x04"), "image", mm.FAKE_CODEC),
        (3, _fake_payload(2, 2, 2, b"\xff" * 8), "video", mm.FAKE_CODEC),
    ]
    return spark.createDataFrame(
        rows, "media_id long, payload binary, media_type string, codec string"
    )


def test_attach_metadata_jvm_side(media):
    out = mm.attach_metadata(media).collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[2]["n_bytes"] == len(_fake_payload(8, 8, 1, b"\x01\x02\x03\x04"))
    assert len(by_id[1]["checksum"]) == 32  # md5 hex


def test_extract_features(media):
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    assert feats[2]["width"] == 8 and feats[2]["height"] == 8
    assert len(feats[1]["feature"]) == 8
    # histogram is normalized
    assert sum(feats[1]["feature"]) == pytest.approx(1.0)


def test_frame_sample(media):
    frames = mm.frame_sample(media, every_nth=2).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert by_media[1] == [0, 2]  # 3 frames, every 2nd
    assert by_media[3] == [0]
    # frame payload is the right slice length (24 bytes / 3 frames)
    f0 = [r for r in frames if r["media_id"] == 1 and r["frame_idx"] == 0][0]
    assert bytes(f0["frame_payload"]) == bytes(range(8))


def test_unknown_codec_raises(spark, media):
    # Without Pillow the real-codec path raises NotImplementedError;
    # with Pillow installed these bytes aren't a valid image, so PIL
    # rejects them instead — either way the decode must fail loudly.
    real = media.withColumn("codec", F.lit("jpeg"))
    with pytest.raises(Exception, match="NotImplementedError|codec|identify"):
        mm.extract_features(real).collect()


_HAS_PIL = importlib.util.find_spec("PIL") is not None


def _png_payload(w: int, h: int, body: bytes) -> bytes:
    import io

    from PIL import Image

    im = Image.frombytes("L", (w, h), body)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.parametrize(
    "codec",
    [
        mm.FAKE_CODEC,
        pytest.param(
            "png",
            marks=pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed"),
        ),
    ],
)
def test_decode_real_and_fake_codecs(spark, codec):
    # Same 4x2 luminance image through either codec — identical
    # decoded dims, body bytes, and downstream feature rows.
    body = bytes(range(8))
    if codec == mm.FAKE_CODEC:
        payload = _fake_payload(4, 2, 1, body)
    else:
        payload = _png_payload(4, 2, body)
    meta = mm._decode_payload(payload, codec)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (4, 2, 1)
    assert bytes(meta["body"]) == body
    df = spark.createDataFrame(
        [(1, payload, "image", codec)],
        "media_id long, payload binary, media_type string, codec string",
    )
    feats = mm.extract_features(df).collect()
    assert feats[0]["width"] == 4 and feats[0]["height"] == 2
    assert sum(feats[0]["feature"]) == pytest.approx(1.0)


def test_resize_nearest_neighbor(media):
    out = {r["media_id"]: r for r in mm.resize(media, 2, 1).collect()}
    # media 1: 4x2x3 frames of bytes(range(24)); frame 0 = rows
    # [0,1,2,3],[4,5,6,7] -> nearest at (y=0, x in {0,2}) = [0, 2]
    assert out[1]["width"] == 2 and out[1]["height"] == 1
    body = bytes(out[1]["payload"]).partition(b";")[2]
    assert body[:2] == bytes([0, 2])  # frame 0
    assert body[2:4] == bytes([8, 10])  # frame 1 starts at byte 8
    # resized payload re-decodes and chains into the feature stage
    feats = {r["media_id"]: r for r in mm.extract_features(
        mm.resize(media, 2, 1)).collect()}
    assert feats[1]["width"] == 2 and feats[1]["height"] == 1
