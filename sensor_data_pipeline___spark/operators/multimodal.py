"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched Pandas UDFs.

The Spark-side plumbing — schema, partition shape, UDF signatures,
batch iteration — is real and tested. Decode is real for uncompressed
containers (PPM/PGM and BI_RGB BMP images, RIFF/WAVE PCM audio — all
parsed natively in numpy, no media library needed) plus the
deterministic fake codec; compressed codecs (JPEG/PNG/...) route to
Pillow at call time when installed and raise NotImplementedError
otherwise, so a real deployment enables them by installing the
library, with no Spark-side change. Audio adds the encode twin
(``encode_wav_pcm16``) and the envelope reduction
(``waveform_downsample``), with a DuckDB-oracle round-trip proof in
``queries.py`` (``waveform_envelope``).

Scale notes: ``mapInPandas`` streams Arrow batches — peak memory is
one batch of payloads, not a partition; `maxRecordsPerBatch` bounds
it. Payload bytes never pass through a Python row object, and metadata
extraction that doesn't need the bytes (length, hash) stays JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried alongside every media payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), False),  # image/audio/video
        T.StructField("codec", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

#: The deterministic fake codec used by tests (a real deployment
#: registers real codecs here).
FAKE_CODEC = "fake-raw-v1"


def attach_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-side metadata: byte length + md5 checksum — no Python, no
    decode, safe to run over 100 TB of blobs."""
    return df.withColumn("n_bytes", F.octet_length(F.col(payload_col)).cast("long")).withColumn(
        "checksum", F.md5(F.col(payload_col))
    )


def _rgb_to_luma(rgb: "Any") -> bytes:
    """ITU-R BT.601 integer luminance of an (..., 3) uint8 array —
    deterministic (integer arithmetic, no float rounding drift)."""
    import numpy as np

    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(np.uint8).tobytes()


def _decode_pnm(payload: bytes) -> dict[str, Any]:
    """Native decode of binary PPM (P6, RGB) / PGM (P5, grayscale):
    whitespace/comment-tolerant header scan, then a raw 8-bit body.
    RGB collapses to BT.601 luminance — the single-channel body layout
    every downstream stage (featurize/resize/frame-sample) uses."""
    import numpy as np

    magic = payload[:2]
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(payload) and payload[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte separates header from raster
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PNM is not supported natively")
    if magic == b"P5":
        body = payload[pos : pos + w * h]
    else:  # P6
        rgb = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=pos)
        body = _rgb_to_luma(rgb.reshape(h, w, 3))
    return {"width": w, "height": h, "n_frames": 1, "body": body}


def _decode_bmp(payload: bytes) -> dict[str, Any]:
    """Native decode of uncompressed (BI_RGB) BMP: 24-bit true-color or
    8-bit paletted, bottom-up or top-down, 4-byte-padded rows."""
    import struct

    import numpy as np

    data_off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (8, 24):
        raise NotImplementedError(
            f"only uncompressed 8/24-bit BMP decodes natively "
            f"(got compression={compression}, bpp={bpp})"
        )
    h = abs(h_signed)
    stride = (w * bpp // 8 + 3) & ~3  # rows pad to 4-byte boundaries
    raster = np.frombuffer(payload, np.uint8, count=stride * h, offset=data_off)
    rows = raster.reshape(h, stride)[:, : w * bpp // 8]
    if h_signed > 0:  # bottom-up storage → flip to top-down
        rows = rows[::-1]
    if bpp == 24:
        bgr = rows.reshape(h, w, 3)
        body = _rgb_to_luma(bgr[..., ::-1])  # BGR on disk
    else:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        palette = np.frombuffer(
            payload, np.uint8, count=n_colors * 4, offset=14 + dib_size
        ).reshape(n_colors, 4)  # BGRA entries
        luma = np.frombuffer(
            _rgb_to_luma(palette[:, 2::-1][:, None, :]), np.uint8
        )
        body = luma[rows].tobytes()
    return {"width": w, "height": h, "n_frames": 1, "body": body}


def _decode_payload(payload: bytes, codec: str) -> dict[str, Any]:
    """Decode one payload.

    The deterministic fake codec and the uncompressed containers
    (PPM/PGM, BI_RGB BMP — recognized by codec name or magic bytes)
    decode natively in numpy. Every other codec is routed to Pillow AT
    CALL TIME (executor-side import — workers, not the driver, need
    the library), so compressed formats light up the moment the
    environment provides PIL, with no Spark-side change.
    """
    if codec == FAKE_CODEC:
        # fake-raw-v1: header = width:height:frames as ascii, ';', raw bytes
        header, _, body = payload.partition(b";")
        w, h, n = (int(x) for x in header.split(b":"))
        return {"width": w, "height": h, "n_frames": n, "body": body}
    if codec in ("ppm", "pgm") or payload[:2] in (b"P5", b"P6"):
        return _decode_pnm(payload)
    if codec == "pgv" or payload[:5] == PGV_MAGIC:
        return _decode_pgv(payload)
    if codec == "bmp" or payload[:2] == b"BM":
        return _decode_bmp(payload)
    if codec in ("wav", "pcm") or payload[:4] == b"RIFF":
        # audio in the generic pipeline: the 1×n_samples "image" whose
        # bytes are midpoint-128 8-bit amplitude — featurize/resize
        # work unchanged; waveform_downsample is the full-precision path
        wav = _decode_wav(payload)
        body = (
            (wav["samples"].astype("int32") >> 8) + 128
        ).astype("uint8").tobytes()
        return {
            "width": wav["n_samples"],
            "height": 1,
            "n_frames": 1,
            "body": body,
        }
    try:
        from PIL import Image  # noqa: PLC0415 — executor-side optional dep
    except ImportError as exc:
        raise NotImplementedError(
            f"codec {codec!r}: media decoding requires Pillow, which is not "
            "present in this container; pip install Pillow to enable it"
        ) from exc
    import io

    with Image.open(io.BytesIO(payload)) as im:
        n_frames = int(getattr(im, "n_frames", 1))
        # single-channel luminance body — same byte layout the fake
        # codec uses, so featurize/resize/frame-sample work unchanged
        frames = []
        for idx in range(n_frames):
            if n_frames > 1:
                im.seek(idx)
            frames.append(im.convert("L").tobytes())
        return {
            "width": int(im.width),
            "height": int(im.height),
            "n_frames": n_frames,
            "body": b"".join(frames),
        }


def extract_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Decode + featurize payloads via ``mapInPandas`` (Arrow batches).

    The feature is a deterministic byte-histogram projection — a
    stand-in with the exact shape (``array<float>``) a real encoder
    would produce."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = _decode_payload(row.payload, row.codec)
                body = meta["body"]
                hist = [0.0] * feature_dim
                for i, b in enumerate(body):
                    hist[b % feature_dim] += 1.0
                total = max(len(body), 1)
                out.append(
                    {
                        "media_id": row.media_id,
                        "media_type": row.media_type,
                        "width": meta["width"],
                        "height": meta["height"],
                        "n_frames": meta["n_frames"],
                        "feature": [v / total for v in hist],
                    }
                )
            yield pd.DataFrame(out)

    cols = ["media_id", "media_type", "payload", "codec"]
    return media.select(*cols).mapInPandas(process, schema=FEATURE_SCHEMA)


def resize(media: DataFrame, new_width: int, new_height: int) -> DataFrame:
    """Nearest-neighbor resize of every frame. Output payloads are
    re-encoded as ``fake-raw-v1`` luminance (and stamped with that
    codec) regardless of input codec — the decoded body is already
    single-channel raw, so that container is the honest one, and it
    keeps resize→decode/featurize chains working for any input format.

    The resample is an index map over the w×h×frames byte body — the
    exact mapInPandas shape a PIL/libav-backed resize uses, including
    the payload-in/payload-out contract that lets resizes chain with
    decode/featurize stages."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("codec", T.StringType(), True),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                meta = _decode_payload(row.payload, row.codec)
                w, h, n = meta["width"], meta["height"], max(meta["n_frames"], 1)
                body = meta["body"]
                frame_len = w * h
                out = bytearray()
                for f in range(n):
                    frame = body[f * frame_len : (f + 1) * frame_len]
                    for yy in range(new_height):
                        y = yy * h // new_height
                        for xx in range(new_width):
                            x = xx * w // new_width
                            # fake codec tolerates truncated bodies
                            # (header dims are authoritative, bytes
                            # may be short) — read missing pixels as 0
                            idx = y * w + x
                            out.append(frame[idx] if idx < len(frame) else 0)
                header = f"{new_width}:{new_height}:{meta['n_frames']}".encode()
                rows.append(
                    {
                        "media_id": row.media_id,
                        "media_type": row.media_type,
                        # body was re-encoded into the raw container;
                        # carrying the input codec forward would stamp
                        # e.g. "bmp" on bytes that are no longer BMP
                        "codec": FAKE_CODEC,
                        "payload": header + b";" + bytes(out),
                        "width": new_width,
                        "height": new_height,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "codec", "payload", "width", "height",
                ],
            )

    cols = ["media_id", "media_type", "payload", "codec"]
    return media.select(*cols).mapInPandas(process, schema=out_schema)


def frame_sample(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling for video payloads: emit one row per sampled
    frame index — a mapInPandas flatMap (one input row → many output
    rows), the shape a real frame extractor uses."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                meta = _decode_payload(row.payload, row.codec)
                n = meta["n_frames"] or 0
                frame_len = max(len(meta["body"]) // max(n, 1), 1)
                for idx in range(0, n, every_nth):
                    start = idx * frame_len
                    rows.append(
                        {
                            "media_id": row.media_id,
                            "frame_idx": idx,
                            "frame_payload": meta["body"][start : start + frame_len],
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_payload"])

    return media.select("media_id", "payload", "codec").mapInPandas(
        sample, schema=out_schema
    )


def _decode_wav(payload: bytes) -> dict[str, Any]:
    """Native decode of RIFF/WAVE PCM audio (mirrors ``_decode_pnm``:
    header + body parse in numpy, zero audio-library dependency).

    Supports integer PCM (format tag 1), 8-bit unsigned or 16-bit
    signed, any channel count; chunks are walked by the RIFF grammar
    (even-byte padded), so extra chunks (LIST, fact, ...) are skipped
    rather than assumed absent. Multi-channel audio is mixed to mono by
    integer mean — deterministic, like the BT.601 luma collapse on the
    image side. Returns int16 mono ``samples`` plus the container
    facts (``sample_rate``, ``n_channels``, ``n_samples``)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt_chunk = data_chunk = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            fmt_chunk = payload[pos + 8 : pos + 8 + size]
        elif cid == b"data":
            data_chunk = payload[pos + 8 : pos + 8 + size]
            if len(data_chunk) < size:
                # a declared size past the payload end is a truncated
                # upload/corrupt blob — slicing would silently decode a
                # SHORTER clip and downstream features would be
                # confidently wrong (the PGV contract: detected, not
                # read past)
                raise ValueError(
                    f"truncated WAVE data chunk: header declares {size} "
                    f"bytes, {len(data_chunk)} present"
                )
        pos += 8 + size + (size & 1)  # chunk bodies pad to even offsets
    if fmt_chunk is None or data_chunk is None:
        raise ValueError("WAVE payload missing fmt/data chunk")
    audio_format, n_channels, sample_rate = struct.unpack_from(
        "<HHI", fmt_chunk, 0
    )
    bits = struct.unpack_from("<H", fmt_chunk, 14)[0]
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only integer PCM 8/16-bit WAV decodes natively "
            f"(got format={audio_format}, bits={bits})"
        )
    if bits == 16:
        raw = np.frombuffer(
            data_chunk, "<i2", count=len(data_chunk) // 2
        ).astype(np.int16)
    else:  # 8-bit WAV is unsigned midpoint-128
        raw = (
            (np.frombuffer(data_chunk, np.uint8).astype(np.int16) - 128) << 8
        )
    frames = raw[: (raw.shape[0] // n_channels) * n_channels].reshape(
        -1, n_channels
    )
    mono = (frames.astype(np.int32).sum(axis=1) // n_channels).astype(np.int16)
    return {
        "sample_rate": int(sample_rate),
        "n_channels": int(n_channels),
        "n_samples": int(mono.shape[0]),
        "samples": mono,
    }


def waveform_downsample(media: DataFrame, n_points: int = 64) -> DataFrame:
    """Waveform envelope downsample — ``frame_sample``'s audio analog
    and the audio cousin of the M4 query: per payload, bucket the mono
    samples into ``n_points`` equal-width time buckets and keep each
    bucket's (min, max) amplitude in [-1, 1]. That is the lossless-for-
    rendering reduction a 100 TB audio corpus ships to a browser or a
    feature store instead of raw PCM.

    mapInPandas streams Arrow batches; per-row work is O(n_samples)
    numpy, output is O(n_points) — constant-width rows downstream."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), False),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("duration_s", T.DoubleType(), False),
            T.StructField("env_min", T.ArrayType(T.FloatType()), False),
            T.StructField("env_max", T.ArrayType(T.FloatType()), False),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                wav = _decode_wav(row.payload)
                s = wav["samples"].astype(np.float32) / 32768.0
                n = s.shape[0]
                # equal-width buckets via the same integer cut the
                # nearest-neighbor resize uses; empty buckets (fewer
                # samples than points) emit 0.0
                env_min, env_max = [], []
                for i in range(n_points):
                    lo, hi = i * n // n_points, (i + 1) * n // n_points
                    if hi > lo:
                        env_min.append(float(s[lo:hi].min()))
                        env_max.append(float(s[lo:hi].max()))
                    else:
                        env_min.append(0.0)
                        env_max.append(0.0)
                rows.append(
                    {
                        "media_id": row.media_id,
                        "sample_rate": wav["sample_rate"],
                        "n_samples": n,
                        "duration_s": n / wav["sample_rate"],
                        "env_min": env_min,
                        "env_max": env_max,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_samples",
                    "duration_s", "env_min", "env_max",
                ],
            )

    return media.select("media_id", "payload", "codec").mapInPandas(
        process, schema=out_schema
    )


def encode_wav_pcm16(samples, sample_rate: int = 8000) -> bytes:
    """Producer twin of :func:`_decode_wav`: mono 16-bit PCM RIFF/WAVE
    bytes from an int sequence — the deterministic payload builder the
    synthetic-media queries and tests use (decode(encode(x)) == x)."""
    import struct

    import numpy as np

    # one vectorized conversion, not a struct.pack per sample — this
    # runs per document inside the synthetic-media queries' hot path.
    # Validate int16 range BEFORE the cast: np.asarray(dtype='<i2')
    # silently wraps out-of-range values (NumPy-version-dependent for
    # Python ints), so a clipping bug in a caller would otherwise
    # produce corrupted audio instead of an error — the struct.pack
    # contract this replaced raised, and so do we.
    arr = np.asarray(list(samples))
    # an empty sequence defaults to float64 under np.asarray; a
    # zero-sample WAV is degenerate but VALID (decode(encode([])) ==
    # []), so skip the dtype check rather than reject it with a
    # misleading "must be integers" error
    if arr.size and not np.issubdtype(arr.dtype, np.integer):
        raise TypeError(f"samples must be integers, got {arr.dtype}")
    if arr.size and (arr.min() < -32768 or arr.max() > 32767):
        raise ValueError("sample out of int16 range [-32768, 32767]")
    data = arr.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def audio_features(media: DataFrame, frame_len: int = 400, hop: int = 160) -> DataFrame:
    """Framed audio features over the native WAV decode: per-frame RMS
    energy and zero-crossing rate, plus clip-level aggregates — the
    deterministic stand-ins for a real acoustic front end (MFCC etc.),
    with the Spark-side plumbing (frame math, Arrow batch shape,
    schema) exactly as a production extractor would have it.

    Frames of ``frame_len`` samples every ``hop`` samples (defaults:
    25 ms / 10 ms at 16 kHz — the speech-standard windowing); the
    ragged tail frame is kept (same completeness rule as
    ``chunk_documents``). RMS is computed in float64 then stored
    float32; ZCR counts sign changes over the frame. Output is
    O(n_frames) per clip — constant-width rows downstream, like
    ``waveform_downsample``."""
    if not (0 < hop <= frame_len):
        # hop > frame_len would leave inter-frame samples uncovered and
        # the tail append could emit a phantom empty frame — same
        # guard as chunk_documents' stride
        raise ValueError("require 0 < hop <= frame_len")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_frames", T.IntegerType(), False),
            T.StructField("rms", T.ArrayType(T.FloatType()), False),
            T.StructField("zcr", T.ArrayType(T.FloatType()), False),
            T.StructField("clip_rms", T.DoubleType(), False),
            T.StructField("clip_peak", T.DoubleType(), False),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                wav = _decode_wav(row.payload)
                s = wav["samples"].astype(np.float64) / 32768.0
                n = s.shape[0]
                starts = list(range(0, max(n - frame_len, 0) + 1, hop))
                if not starts:
                    starts = [0]
                elif starts[-1] + frame_len < n:
                    starts.append(starts[-1] + hop)  # ragged tail
                rms, zcr = [], []
                for st in starts:
                    fr = s[st : st + frame_len]
                    if fr.shape[0] == 0:
                        rms.append(0.0)
                        zcr.append(0.0)
                        continue
                    rms.append(float(np.sqrt(np.mean(fr * fr))))
                    signs = np.signbit(fr)
                    zcr.append(
                        float(np.count_nonzero(signs[1:] != signs[:-1]))
                        / max(fr.shape[0] - 1, 1)
                    )
                rows.append(
                    {
                        "media_id": row.media_id,
                        "n_frames": len(starts),
                        "rms": rms,
                        "zcr": zcr,
                        "clip_rms": float(np.sqrt(np.mean(s * s))) if n else 0.0,
                        "clip_peak": float(np.abs(s).max()) if n else 0.0,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_frames", "rms", "zcr",
                    "clip_rms", "clip_peak",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        process, schema=out_schema
    )


def _scan_pnm(payload: bytes, pos: int) -> "tuple[dict[str, Any], int]":
    """Parse one binary PNM (P5/P6) image starting at ``pos``; returns
    (decoded meta à la :func:`_decode_pnm`, end offset) — the slicing
    primitive the multi-frame container needs."""
    magic = payload[pos : pos + 2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"expected P5/P6 frame at offset {pos}")
    p = pos + 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while p < len(payload) and payload[p : p + 1].isspace():
            p += 1
        if payload[p : p + 1] == b"#":
            while p < len(payload) and payload[p] not in (0x0A, 0x0D):
                p += 1
            continue
        start = p
        while p < len(payload) and not payload[p : p + 1].isspace():
            p += 1
        tokens.append(int(payload[start:p]))
    p += 1  # single whitespace before raster
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PNM is not supported natively")
    body_len = w * h * (3 if magic == b"P6" else 1)
    end = p + body_len
    if end > len(payload):
        # a truncated final P5 frame would otherwise slip through:
        # _decode_pnm slices the P5 body without a length check (only
        # P6's np.frombuffer raises), yielding a silently undersized
        # body — truncation must be DETECTED, not read past
        raise ValueError(
            f"truncated frame at offset {pos}: body needs {body_len} "
            f"bytes, payload has {len(payload) - p}"
        )
    meta = _decode_pnm(payload[pos:end])
    return meta, end


PGV_MAGIC = b"PGV1\n"


def encode_pgv(frames: "list[bytes]") -> bytes:
    """Producer twin of :func:`_decode_pgv`: a multi-frame video
    container as concatenated binary PNM frames behind a counted
    header — the uncompressed-video analog of :func:`encode_wav_pcm16`
    (deterministic, zero-dependency, so tests build REAL payloads)."""
    return PGV_MAGIC + str(len(frames)).encode() + b"\n" + b"".join(frames)


def _decode_pgv(payload: bytes) -> dict[str, Any]:
    """Native decode of the PGV multi-frame container: counted,
    self-describing PNM frames (each frame re-states its own header,
    so truncation/dimension drift is detected, not silently read
    past). All frames must share dimensions; bodies concatenate into
    the single-channel layout every downstream stage uses — which is
    exactly the fake codec's contract, so featurize/resize/
    frame-sample light up on a REAL container unchanged."""
    if payload[: len(PGV_MAGIC)] != PGV_MAGIC:
        raise ValueError("not a PGV payload")
    pos = len(PGV_MAGIC)
    nl = payload.index(b"\n", pos)
    n_frames = int(payload[pos:nl])
    pos = nl + 1
    w = h = None
    bodies = []
    for i in range(n_frames):
        meta, pos = _scan_pnm(payload, pos)
        if w is None:
            w, h = meta["width"], meta["height"]
        elif (meta["width"], meta["height"]) != (w, h):
            raise ValueError(
                f"frame {i} is {meta['width']}x{meta['height']}, "
                f"container is {w}x{h}"
            )
        bodies.append(
            meta["body"]
            if isinstance(meta["body"], bytes)
            else bytes(meta["body"])
        )
    return {
        "width": w or 0,
        "height": h or 0,
        "n_frames": n_frames,
        "body": b"".join(bodies),
    }
