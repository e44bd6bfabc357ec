"""Multimodal asset columns: opaque binary payloads + typed metadata.

A large-scale training-data pipeline carries image/audio/video alongside
text. The Spark-side contract here is real and tested — schema, partition
strategy, Arrow batch shapes, mapInPandas signatures — while the *codec*
layer is a deterministic in-repo RAW format (this container has no
PIL/ffmpeg/librosa; real codecs plug into the same seams, see
``decode.DECODERS``).

Table schema (the shape an Iceberg `assets` table would have at 100 TB,
partitioned by ``kind`` and bucketed by ``asset_id`` so decode stages scan
one modality without touching the others):

    assets(asset_id bigint, kind string, payload binary,
           meta struct<width int, height int, channels int,
                       sample_rate int, n_samples int,
                       n_frames int, codec string>)

RAW payload formats (little-endian, deterministic from (asset_id, seed)):
  image: b"RIMG" + w:int32 + h:int32 + c:int32 + w*h*c uint8 pixels
  audio: b"RAUD" + sample_rate:int32 + n:int32 + n int16 PCM samples
  video: b"RVID" + w:int32 + h:int32 + n_frames:int32 + frames of w*h uint8
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RAW_IMAGE_MAGIC = b"RIMG"
RAW_AUDIO_MAGIC = b"RAUD"
RAW_VIDEO_MAGIC = b"RVID"

META_FIELDS = [
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("codec", StringType()),
]

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("meta", StructType(META_FIELDS), False),
    ]
)


def _rng(asset_id: int, seed: int) -> np.random.Generator:
    return np.random.default_rng(np.uint64(asset_id * 2654435761 + seed))


def md5_pixels(asset_id: int, n_bytes: int) -> bytes:
    """Deterministic pseudo-random pixel bytes from md5(asset_id:block) —
    chosen over the numpy PCG64 stream because an independent SQL engine
    can recompute md5 hex digits, making decoded-image statistics
    oracle-able (see queries.q_multimodal_image_stats)."""
    return md5_bytes("", asset_id, n_bytes)


def encode_md5_image(asset_id: int, w: int = 16, h: int = 12, c: int = 3) -> bytes:
    """RAW image whose pixels are the md5-derived byte stream (same RIMG
    container as encode_raw_image; only the pixel source differs)."""
    return RAW_IMAGE_MAGIC + struct.pack("<iii", w, h, c) + md5_pixels(asset_id, w * h * c)


def md5_bytes(key_prefix: str, asset_id: int, n_bytes: int) -> bytes:
    """md5-derived byte stream with a stream prefix (so image and audio
    assets of the same id draw from independent streams)."""
    import hashlib

    out = bytearray()
    for blk in range((n_bytes + 15) // 16):
        out += hashlib.md5(f"{key_prefix}{asset_id}:{blk}".encode()).digest()
    return bytes(out[:n_bytes])


def encode_md5_audio(asset_id: int, sample_rate: int = 8000, n: int = 400) -> bytes:
    """RAW PCM16 audio whose samples are the md5-derived byte stream
    (stream key 'a<asset_id>:<blk>', little-endian int16) — SQL-recomputable
    like encode_md5_image, so decoded RMS stats are oracle-able
    (queries.q_multimodal_audio_stats)."""
    return RAW_AUDIO_MAGIC + struct.pack("<ii", sample_rate, n) + md5_bytes("a", asset_id, 2 * n)


def encode_md5_video(asset_id: int, w: int = 8, h: int = 8, n_frames: int = 12) -> bytes:
    """RAW grayscale video whose frames are the md5-derived byte stream
    (stream key 'v<asset_id>:<blk>', frame i = bytes [i*w*h, (i+1)*w*h)) —
    SQL-recomputable like encode_md5_image, so frame-sampled brightness
    stats are oracle-able (queries.q_multimodal_video_frames)."""
    return (
        RAW_VIDEO_MAGIC
        + struct.pack("<iii", w, h, n_frames)
        + md5_bytes("v", asset_id, w * h * n_frames)
    )


def encode_wav(asset_id: int, sample_rate: int = 8000, n: int = 400) -> bytes:
    """REAL RIFF/WAVE container (PCM16 mono, the canonical 44-byte-header
    layout plus chunk walking) around the SAME md5 sample stream as
    encode_md5_audio — so the real-format ``wav`` codec path is verifiable
    against the identical DuckDB oracle (queries.multimodal_wav_stats)."""
    data = md5_bytes("a", asset_id, 2 * n)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def encode_png(asset_id: int, w: int = 16, h: int = 12) -> bytes:
    """REAL PNG (8-bit RGB, zlib-deflated scanlines, per-row filter 0,
    CRC-checked chunks) of the SAME md5 pixel stream as encode_md5_image —
    so the real-format ``png`` codec path is verifiable against the
    identical DuckDB oracle (queries.multimodal_png_stats)."""
    import zlib

    px = md5_pixels(asset_id, w * h * 3)
    raw = b"".join(
        b"\x00" + px[y * w * 3:(y + 1) * w * 3] for y in range(h)
    )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_raw_image(asset_id: int, seed: int, w: int = 16, h: int = 12, c: int = 3) -> bytes:
    px = _rng(asset_id, seed).integers(0, 256, size=w * h * c, dtype=np.uint8)
    return RAW_IMAGE_MAGIC + struct.pack("<iii", w, h, c) + px.tobytes()


def encode_raw_audio(asset_id: int, seed: int, sample_rate: int = 8000, n: int = 400) -> bytes:
    pcm = _rng(asset_id, seed).integers(-32768, 32768, size=n, dtype=np.int16)
    return RAW_AUDIO_MAGIC + struct.pack("<ii", sample_rate, n) + pcm.tobytes()


def encode_raw_video(asset_id: int, seed: int, w: int = 8, h: int = 8, n_frames: int = 12) -> bytes:
    frames = _rng(asset_id, seed).integers(0, 256, size=w * h * n_frames, dtype=np.uint8)
    return RAW_VIDEO_MAGIC + struct.pack("<iii", w, h, n_frames) + frames.tobytes()


def _make_asset(asset_id: int, seed: int) -> tuple:
    kind = ("image", "audio", "video")[asset_id % 3]
    if kind == "image":
        payload = encode_raw_image(asset_id, seed)
        meta = (16, 12, 3, None, None, None, "raw-img")
    elif kind == "audio":
        payload = encode_raw_audio(asset_id, seed)
        meta = (None, None, None, 8000, 400, None, "raw-pcm16")
    else:
        payload = encode_raw_video(asset_id, seed)
        meta = (8, 8, 1, None, None, 12, "raw-vid")
    return (asset_id, kind, bytearray(payload), meta)


def synthesize_assets(spark: SparkSession, n: int = 96, seed: int = 7,
                      partitions: int = 8) -> DataFrame:
    """Deterministic asset table, generated distributed: the driver ships
    only (asset_id, seed); payload bytes materialize inside mapInPandas on
    the executors (at 10^9 assets the driver never holds a payload)."""
    ids = spark.range(0, n, 1, partitions)

    def gen(batches):
        for pdf in batches:
            rows = [_make_asset(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "asset_id": [r[0] for r in rows],
                    "kind": [r[1] for r in rows],
                    "payload": [r[2] for r in rows],
                    "meta": [
                        {f.name: v for f, v in zip(META_FIELDS, r[3])} for r in rows
                    ],
                }
            )

    return ids.mapInPandas(gen, schema=ASSET_SCHEMA)


def _derived_assets(docs: DataFrame, encode_fn, kind: str, meta: dict) -> DataFrame:
    """One generator for every derive-an-asset-per-document builder
    (code-review r4: five copy-pasted mapInPandas scaffolds differing only
    in encoder/kind/meta). Payloads are a deterministic function of
    doc_id, so any sf_dir yields the same assets on every engine/run —
    what makes the decoded statistics DuckDB-verifiable."""
    ids = docs.select(F.col("doc_id").cast("long").alias("id"))

    def gen(batches):
        for pdf in batches:
            rows = [(int(i), bytearray(encode_fn(int(i)))) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "asset_id": [r[0] for r in rows],
                    "kind": [kind] * len(rows),
                    "payload": [r[1] for r in rows],
                    "meta": [meta] * len(rows),
                }
            )

    return ids.mapInPandas(gen, schema=ASSET_SCHEMA)


_NO_META = {"width": None, "height": None, "channels": None,
            "sample_rate": None, "n_samples": None, "n_frames": None}


def assets_from_documents(docs: DataFrame, seed: int = 7) -> DataFrame:
    """Image-asset table 1:1 from a documents table (md5 pixel stream,
    RAW container) — the 'render the doc' derivation pattern."""
    return _derived_assets(
        docs, encode_md5_image, "image",
        {**_NO_META, "width": 16, "height": 12, "channels": 3,
         "codec": "raw-img"})


def video_assets_from_documents(docs: DataFrame, seed: int = 7) -> DataFrame:
    """Video twin (stream key 'v', RAW container, 12 frames)."""
    return _derived_assets(
        docs, encode_md5_video, "video",
        {**_NO_META, "width": 8, "height": 8, "channels": 1, "n_frames": 12,
         "codec": "raw-vid"})


def audio_assets_from_documents(docs: DataFrame, seed: int = 7) -> DataFrame:
    """Audio twin (stream key 'a', RAW PCM16 container)."""
    return _derived_assets(
        docs, encode_md5_audio, "audio",
        {**_NO_META, "sample_rate": 8000, "n_samples": 400,
         "codec": "raw-pcm16"})


def wav_assets_from_documents(docs: DataFrame, seed: int = 7) -> DataFrame:
    """Real-format twin of audio_assets_from_documents: the SAME md5
    sample stream in a genuine RIFF/WAVE container -> the real ``wav``
    codec, same features, same oracle."""
    return _derived_assets(
        docs, encode_wav, "audio",
        {**_NO_META, "sample_rate": 8000, "n_samples": 400, "codec": "wav"})


def png_assets_from_documents(docs: DataFrame, seed: int = 7) -> DataFrame:
    """Real-format twin of assets_from_documents: the SAME md5 pixel
    stream in a genuine PNG -> the real ``png`` codec, same features,
    same oracle."""
    return _derived_assets(
        docs, encode_png, "image",
        {**_NO_META, "width": 16, "height": 12, "channels": 3,
         "codec": "png"})
