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


def _pgm_payload(w: int, h: int, body: bytes) -> bytes:
    return f"P5\n{w} {h}\n255\n".encode() + body


def _ppm_gray_payload(w: int, h: int, body: bytes) -> bytes:
    # P6 with r=g=b=v pixels: BT.601 luma of gray is identity, so the
    # decoded body equals `body` exactly. Header includes a comment to
    # exercise the '#' scan.
    rgb = b"".join(bytes([v, v, v]) for v in body)
    return f"P6\n# synthetic\n{w} {h}\n255\n".encode() + rgb


def _bmp24_payload(w: int, h: int, body: bytes) -> bytes:
    # Uncompressed 24-bit BMP, bottom-up, 4-byte row padding, gray
    # pixels (BGR = v,v,v) so decoded luminance equals `body`.
    import struct

    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for y in reversed(range(h)):  # bottom-up storage order
        row = bytearray()
        for x in range(w):
            v = body[y * w + x]
            row += bytes([v, v, v])
        row += b"\x00" * (stride - len(row))
        raster += row
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0, 54)
    return file_hdr + dib + bytes(raster)


def _bmp8_payload(w: int, h: int, idx_rows: bytes, palette_grays: list[int]) -> bytes:
    # 8-bit paletted BMP: palette entry i is gray palette_grays[i].
    import struct

    n_colors = len(palette_grays)
    stride = (w + 3) & ~3
    raster = bytearray()
    for y in reversed(range(h)):
        row = bytearray(idx_rows[y * w : (y + 1) * w])
        row += b"\x00" * (stride - len(row))
        raster += row
    palette = b"".join(bytes([g, g, g, 0]) for g in palette_grays)
    data_off = 14 + 40 + len(palette)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(raster), 0, 0, n_colors, 0
    )
    file_hdr = struct.pack(
        "<2sIHHI", b"BM", data_off + len(raster), 0, 0, data_off
    )
    return file_hdr + dib + palette + bytes(raster)


@pytest.mark.parametrize(
    "codec",
    [
        mm.FAKE_CODEC,
        "pgm",
        "ppm",
        "bmp",
        pytest.param(
            "png",
            marks=pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed"),
        ),
    ],
)
def test_decode_real_and_fake_codecs(spark, codec):
    # Same 4x2 luminance image through every codec — identical decoded
    # dims, body bytes, and downstream feature rows. pgm/ppm/bmp decode
    # natively (no image library), so this path runs in this container.
    body = bytes(range(8))
    if codec == mm.FAKE_CODEC:
        payload = _fake_payload(4, 2, 1, body)
    elif codec == "pgm":
        payload = _pgm_payload(4, 2, body)
    elif codec == "ppm":
        payload = _ppm_gray_payload(4, 2, body)
    elif codec == "bmp":
        payload = _bmp24_payload(4, 2, body)
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


def test_bmp24_non_gray_luma_and_padding():
    # 3x2 image, non-gray pixels: BT.601 integer luma, bottom-up flip,
    # and the 3-byte row pad (stride 12) must all be honored.
    import struct

    w, h = 3, 2
    # top-down pixel RGB values
    px = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (200, 100, 50), (0, 0, 0)],
    ]
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for y in reversed(range(h)):
        row = bytearray()
        for r, g, b in px[y]:
            row += bytes([b, g, r])  # BGR on disk
        row += b"\x00" * (stride - len(row))
        raster += row
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    payload = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54) + dib + bytes(raster)
    meta = mm._decode_payload(payload, "bmp")
    assert (meta["width"], meta["height"], meta["n_frames"]) == (3, 2, 1)
    expect = bytes(
        (299 * r + 587 * g + 114 * b + 500) // 1000
        for row in px
        for (r, g, b) in row
    )
    assert bytes(meta["body"]) == expect


def test_bmp8_paletted_decode():
    grays = [0, 10, 20, 250]
    idx = bytes([0, 1, 2, 3, 1, 3, 2, 0, 0, 1])  # 5x2
    payload = _bmp8_payload(5, 2, idx, grays)
    meta = mm._decode_payload(payload, "bmp")
    assert (meta["width"], meta["height"]) == (5, 2)
    assert bytes(meta["body"]) == bytes(grays[i] for i in idx)


def test_magic_sniff_without_codec_name():
    # Payload magic alone routes to the native decoders even when the
    # codec column carries a generic label.
    body = bytes(range(6))
    assert bytes(mm._decode_payload(_pgm_payload(3, 2, body), "image")["body"]) == body
    assert bytes(mm._decode_payload(_bmp24_payload(3, 2, body), "image")["body"]) == body


def test_resize_restamps_codec_on_reencode(spark):
    # A resized BMP payload is re-encoded in the raw container, so the
    # output row must say FAKE_CODEC (not "bmp") and chain into decode.
    body = bytes(range(8))
    df = spark.createDataFrame(
        [(7, _bmp24_payload(4, 2, body), "image", "bmp")],
        "media_id long, payload binary, media_type string, codec string",
    )
    out = mm.resize(df, 2, 1).collect()[0]
    assert out["codec"] == mm.FAKE_CODEC
    meta = mm._decode_payload(bytes(out["payload"]), out["codec"])
    assert (meta["width"], meta["height"]) == (2, 1)
    feats = mm.extract_features(mm.resize(df, 2, 1)).collect()
    assert feats[0]["width"] == 2 and feats[0]["height"] == 1


def _wav_payload(
    samples, n_channels: int = 1, sample_rate: int = 8000, bits: int = 16,
    extra_chunk: bool = False,
) -> bytes:
    """Build a RIFF/WAVE PCM payload in pure struct (no audio lib).
    ``samples`` is a flat int list, interleaved when multi-channel.
    ``extra_chunk`` inserts an odd-length LIST chunk before data to
    exercise the even-padded chunk walk."""
    import struct

    if bits == 16:
        data = b"".join(struct.pack("<h", s) for s in samples)
    else:
        data = bytes((s >> 8) + 128 for s in samples)
    byte_rate = sample_rate * n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate,
        n_channels * bits // 8, bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:
        odd = b"INFOx"  # 5 bytes: forces the pad-to-even path
        chunks += b"LIST" + struct.pack("<I", len(odd)) + odd + b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_decode_16bit_stereo_round_trip():
    # stereo frames: (100, 200), (-100, -200), (32767, 32767), (0, 0)
    interleaved = [100, 200, -100, -200, 32767, 32767, 0, 0]
    wav = mm._decode_wav(
        _wav_payload(interleaved, n_channels=2, sample_rate=44100)
    )
    assert wav["sample_rate"] == 44100
    assert wav["n_channels"] == 2
    assert wav["n_samples"] == 4
    # integer-mean mono mix (floor division, like the luma collapse)
    assert list(wav["samples"]) == [150, -150, 32767, 0]


def test_wav_decode_8bit_and_chunk_walk():
    samples = [0, 16384, -16384, 8192]
    wav = mm._decode_wav(
        _wav_payload(samples, bits=8, extra_chunk=True)
    )
    assert wav["n_samples"] == 4
    # 8-bit quantization keeps the top byte
    assert list(wav["samples"]) == [0, 16384, -16384, 8192]


def test_wav_non_pcm_raises():
    import struct

    payload = _wav_payload([0, 1])
    # overwrite the format tag with 3 (IEEE float)
    pos = payload.index(b"fmt ") + 8
    payload = payload[:pos] + struct.pack("<H", 3) + payload[pos + 2 :]
    with pytest.raises(NotImplementedError, match="PCM"):
        mm._decode_wav(payload)


def test_waveform_downsample_envelope(spark):
    # a deterministic ramp: bucket envelopes are exactly predictable
    n = 1000
    samples = [((i * 65) % 65536) - 32768 for i in range(n)]
    df = spark.createDataFrame(
        [(7, _wav_payload(samples, sample_rate=1000), "audio", "wav")],
        "media_id long, payload binary, media_type string, codec string",
    )
    row = mm.waveform_downsample(df, n_points=10).collect()[0]
    assert row["n_samples"] == n
    assert row["duration_s"] == pytest.approx(1.0)
    assert len(row["env_min"]) == 10 and len(row["env_max"]) == 10
    import numpy as np

    s = np.array(samples, dtype=np.float32) / 32768.0
    for i in range(10):
        lo, hi = i * n // 10, (i + 1) * n // 10
        assert row["env_min"][i] == pytest.approx(float(s[lo:hi].min()))
        assert row["env_max"][i] == pytest.approx(float(s[lo:hi].max()))
    assert all(
        a <= b for a, b in zip(row["env_min"], row["env_max"])
    )


def test_wav_through_generic_pipeline(spark):
    """Audio rides the SAME decode/featurize path as images: the body
    is midpoint-128 8-bit amplitude, 1 x n_samples."""
    samples = [0, 256, -256, 32512]
    df = spark.createDataFrame(
        [(9, _wav_payload(samples), "audio", "wav")],
        "media_id long, payload binary, media_type string, codec string",
    )
    feat = mm.extract_features(df).collect()[0]
    assert feat["width"] == 4 and feat["height"] == 1
    assert feat["n_frames"] == 1
    assert sum(feat["feature"]) == pytest.approx(1.0)
    # magic-byte sniff: codec name not required
    df2 = spark.createDataFrame(
        [(10, _wav_payload(samples), "audio", "unknown-bin")],
        "media_id long, payload binary, media_type string, codec string",
    )
    assert mm.extract_features(df2).collect()[0]["width"] == 4


def test_audio_features_framing_and_values(spark):
    """RMS/ZCR framing: silence scores 0/0; a full-scale square wave
    alternating every sample has RMS ~1 and ZCR ~1; the ragged tail
    frame is kept (chunk_documents' completeness rule)."""
    import numpy as np

    silence = [0] * 1000
    square = [32767 if i % 2 == 0 else -32768 for i in range(1000)]
    df = spark.createDataFrame(
        [
            (1, _wav_payload(silence, sample_rate=1000), "audio", "wav"),
            (2, _wav_payload(square, sample_rate=1000), "audio", "wav"),
        ],
        "media_id long, payload binary, media_type string, codec string",
    )
    rows = {
        r["media_id"]: r
        for r in mm.audio_features(df, frame_len=400, hop=160).collect()
    }
    sil, sq = rows[1], rows[2]
    # starts 0,160,320,480,600 — the last full frame ends exactly at
    # sample 1000, so no extra tail frame is appended
    assert sil["n_frames"] == sq["n_frames"] == 5
    assert all(v == pytest.approx(0.0) for v in sil["rms"])
    assert all(v == pytest.approx(0.0) for v in sil["zcr"])
    assert all(v == pytest.approx(1.0, abs=2e-2) for v in sq["rms"])
    assert all(v == pytest.approx(1.0, abs=1e-6) for v in sq["zcr"])
    assert sq["clip_peak"] == pytest.approx(1.0, abs=1e-4)
    assert sq["clip_rms"] == pytest.approx(1.0, abs=2e-2)

    # ragged tail: 500 samples, frame 400/hop 160 -> starts 0, 100? no:
    # starts are 0 and (tail) 160; last frame truncated to 340 samples
    short = [16384] * 500
    df2 = spark.createDataFrame(
        [(3, _wav_payload(short, sample_rate=1000), "audio", "wav")],
        "media_id long, payload binary, media_type string, codec string",
    )
    r3 = mm.audio_features(df2, frame_len=400, hop=160).collect()[0]
    assert r3["n_frames"] == 2  # start 0 (full) + tail start 160
    assert all(v == pytest.approx(0.5, abs=1e-4) for v in r3["rms"])


def _pgm_frame(w, h, fill):
    return b"P5\n%d %d\n255\n" % (w, h) + bytes([fill]) * (w * h)


def test_pgv_native_video_decode_and_frame_sample(spark):
    """Video on a REAL container: 6 PGM frames in a PGV payload ride
    the generic decode into frame_sample — sampled frame payloads are
    byte-identical to the encoded frames' rasters."""
    frames = [_pgm_frame(4, 3, 10 * i) for i in range(6)]
    payload = mm.encode_pgv(frames)
    df = spark.createDataFrame(
        [(1, payload, "video", "pgv")],
        "media_id long, payload binary, media_type string, codec string",
    )
    feat = mm.extract_features(df).collect()[0]
    assert (feat["width"], feat["height"], feat["n_frames"]) == (4, 3, 6)

    sampled = {
        r["frame_idx"]: bytes(r["frame_payload"])
        for r in mm.frame_sample(df, every_nth=2).collect()
    }
    assert sorted(sampled) == [0, 2, 4]
    for idx in (0, 2, 4):
        assert sampled[idx] == bytes([10 * idx]) * 12


def test_pgv_rejects_dimension_drift():
    bad = mm.encode_pgv([_pgm_frame(4, 3, 1), _pgm_frame(5, 3, 2)])
    with pytest.raises(ValueError, match="frame 1"):
        mm._decode_pgv(bad)


def test_pgv_p6_frames_collapse_to_luma():
    """Color video: P6 frames collapse per-frame to BT.601 luma, same
    as still PPM images."""
    rgb = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 255, 0])  # red, green px
    meta = mm._decode_pgv(mm.encode_pgv([rgb, rgb]))
    assert (meta["width"], meta["height"], meta["n_frames"]) == (2, 1, 2)
    body = bytes(meta["body"])
    assert len(body) == 4 and body[:2] == body[2:]
    # red luma (~76) < green luma (~150), both via the image-path math
    assert body[0] < body[1]


def test_wav_truncated_payload_raises():
    """A data chunk whose declared size exceeds the available bytes is
    a truncated upload — must raise, never silently decode a shorter
    clip (the PGV contract, applied to audio)."""
    full = mm.encode_wav_pcm16([100, -100, 200, -200])
    with pytest.raises(ValueError, match="truncated"):
        mm._decode_wav(full[:-3])


def test_audio_features_rejects_bad_hop(spark):
    df = spark.createDataFrame(
        [(1, mm.encode_wav_pcm16([0] * 10), "audio", "wav")],
        "media_id long, payload binary, media_type string, codec string",
    )
    with pytest.raises(ValueError):
        mm.audio_features(df, frame_len=100, hop=400)
    with pytest.raises(ValueError):
        mm.audio_features(df, frame_len=100, hop=0)


def test_encode_wav_rejects_out_of_range_and_float_samples():
    """np.asarray(dtype='<i2') silently wraps out-of-int16-range
    values; the encoder must keep the struct.pack('<h') contract it
    replaced — raise on range overflow and on non-integer samples, so
    a clipping bug in a caller becomes an error, not corrupted audio."""
    with pytest.raises(ValueError, match="int16 range"):
        mm.encode_wav_pcm16([0, 40000])
    with pytest.raises(ValueError, match="int16 range"):
        mm.encode_wav_pcm16([-32769])
    with pytest.raises(TypeError, match="integers"):
        mm.encode_wav_pcm16([1.5, 2.5])
    # boundary values round-trip exactly
    wav = mm.encode_wav_pcm16([-32768, 32767])
    meta = mm._decode_wav(wav)
    assert meta["n_samples"] == 2


def test_pgv_truncated_final_p5_frame_raises():
    """A truncated final grayscale frame must raise: P5 bodies are
    sliced without a length check in _decode_pnm (only P6's
    np.frombuffer raises), so _scan_pnm itself enforces end <= len."""
    frames = [_pgm_frame(4, 3, 1), _pgm_frame(4, 3, 2)]
    payload = mm.encode_pgv(frames)
    with pytest.raises(ValueError, match="truncated"):
        mm._decode_pgv(payload[:-5])  # short final P5 body


def test_encode_wav_empty_input_is_valid_zero_sample_wav():
    """ADVICE r6: np.asarray([]) defaults to float64, so the integer
    dtype check must not reject an empty sequence — a zero-sample WAV
    is degenerate but valid, and decode(encode([])) must round-trip."""
    wav = mm.encode_wav_pcm16([])
    meta = mm._decode_wav(wav)
    assert meta["n_samples"] == 0
