"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched Pandas UDFs.

The Spark-side plumbing — schema, partition shape, UDF signatures,
batch iteration — is real and tested. The actual media decode is
STUBBED (`decode_image` raises NotImplementedError unless given the
deterministic fake codec) because no image/audio libraries exist in
this container; swap `_decode_payload` for a PIL/libav call in a real
deployment without touching any Spark code.

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


def _decode_payload(payload: bytes, codec: str) -> dict[str, Any]:
    """Decode one payload.

    The deterministic fake codec always works; every other codec is
    routed to Pillow AT CALL TIME (executor-side import — workers, not
    the driver, need the library), so the stub becomes a real decoder
    the moment the environment provides PIL, with no Spark-side change.
    """
    if codec == FAKE_CODEC:
        # fake-raw-v1: header = width:height:frames as ascii, ';', raw bytes
        header, _, body = payload.partition(b";")
        w, h, n = (int(x) for x in header.split(b":"))
        return {"width": w, "height": h, "n_frames": n, "body": body}
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
    """Nearest-neighbor resize of every frame, re-encoded in place
    (payload out = payload in's codec with updated dimensions).

    With the fake codec the body is w×h×frames single-byte pixels, so
    the resample is an index map — the exact mapInPandas shape a
    PIL/libav-backed resize uses, including the payload-in/payload-out
    contract that lets resizes chain with decode/featurize stages."""
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
                        "codec": row.codec,
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
