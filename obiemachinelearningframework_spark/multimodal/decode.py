"""Decode / feature-extract / resize / frame-sample over binary columns.

All operators are Arrow-batched ``mapInPandas`` stages: one Python process
per partition, whole pandas batches in and out, zero per-row Python UDFs.
At 100 TB the input table is partitioned by ``kind`` so each stage scans
only its modality, and ``spark.sql.files.maxPartitionBytes`` bounds the
decoded-bytes-in-flight per task (decoded image >> payload; keep
partitions small on the decode stage, repartition wider before it if
payloads are large).

Codec seam: ``DECODERS[codec]`` maps codec string -> bytes -> np.ndarray.
The in-repo RAW codecs are complete; real formats raise a clearly-marked
NotImplementedError until PIL/ffmpeg are provisioned (this container has
neither) — the Spark plumbing around them is identical and is what the
tests exercise.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .assets import RAW_AUDIO_MAGIC, RAW_IMAGE_MAGIC, RAW_VIDEO_MAGIC


def _decode_raw_image(payload: bytes) -> np.ndarray:
    assert payload[:4] == RAW_IMAGE_MAGIC, "not a raw image"
    w, h, c = struct.unpack("<iii", payload[4:16])
    return np.frombuffer(payload[16:], dtype=np.uint8).reshape(h, w, c)


def _decode_raw_audio(payload: bytes) -> tuple[int, np.ndarray]:
    assert payload[:4] == RAW_AUDIO_MAGIC, "not raw audio"
    rate, n = struct.unpack("<ii", payload[4:12])
    return rate, np.frombuffer(payload[12:], dtype=np.int16)


def _decode_raw_video(payload: bytes) -> np.ndarray:
    assert payload[:4] == RAW_VIDEO_MAGIC, "not raw video"
    w, h, n = struct.unpack("<iii", payload[4:16])
    return np.frombuffer(payload[16:], dtype=np.uint8).reshape(n, h, w)


def _unimplemented(codec):
    def fail(_payload):
        raise NotImplementedError(
            f"codec '{codec}' needs an external library (PIL/ffmpeg) not present "
            "in this environment; plug a decoder into multimodal.decode.DECODERS"
        )
    return fail


DECODERS = {
    "raw-img": _decode_raw_image,
    "raw-pcm16": _decode_raw_audio,
    "raw-vid": _decode_raw_video,
    "jpeg": _unimplemented("jpeg"),
    "png": _unimplemented("png"),
    "wav": _unimplemented("wav"),
    "mp4": _unimplemented("mp4"),
}


# ------------------------------------------------------------------ image ops

DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixels", BinaryType()),  # h*w*c uint8, row-major
    ]
)


def decode_images(assets: DataFrame) -> DataFrame:
    """binary payload -> (dims, raw pixel buffer). Output stays binary so
    downstream Arrow transfer is one buffer per row, not a list of ints."""

    def run(batches):
        for pdf in batches:
            out = {"asset_id": [], "width": [], "height": [], "channels": [], "pixels": []}
            for aid, payload, meta in zip(pdf["asset_id"], pdf["payload"], pdf["meta"]):
                arr = DECODERS[meta["codec"]](bytes(payload))
                h, w, c = arr.shape
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["pixels"].append(bytearray(arr.tobytes()))
            yield pd.DataFrame(out)

    return assets.filter("kind = 'image'").mapInPandas(run, schema=DECODED_IMAGE_SCHEMA)


def resize_images(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize — pure numpy indexing, vectorized per image."""

    def run(batches):
        for pdf in batches:
            out = {"asset_id": [], "width": [], "height": [], "channels": [], "pixels": []}
            for aid, w, h, c, buf in zip(
                pdf["asset_id"], pdf["width"], pdf["height"], pdf["channels"], pdf["pixels"]
            ):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(h, w, c)
                ys = (np.arange(out_h) * h // out_h).astype(np.int64)
                xs = (np.arange(out_w) * w // out_w).astype(np.int64)
                res = arr[ys][:, xs]
                out["asset_id"].append(aid)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["channels"].append(c)
                out["pixels"].append(bytearray(res.tobytes()))
            yield pd.DataFrame(out)

    return decoded.mapInPandas(run, schema=DECODED_IMAGE_SCHEMA)


IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("mean_rgb", ArrayType(DoubleType())),
        StructField("std_rgb", ArrayType(DoubleType())),
        StructField("brightness", DoubleType()),
        StructField("phash", StringType()),
    ]
)


def image_features(decoded: DataFrame) -> DataFrame:
    """Per-channel mean/std, brightness, and an 8x8 average-hash-style
    perceptual hash (hex) — the embed-ready feature row per image."""

    def run(batches):
        for pdf in batches:
            out = {"asset_id": [], "mean_rgb": [], "std_rgb": [], "brightness": [], "phash": []}
            for aid, w, h, c, buf in zip(
                pdf["asset_id"], pdf["width"], pdf["height"], pdf["channels"], pdf["pixels"]
            ):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(h, w, c).astype(np.float64)
                gray = arr.mean(axis=2)
                ys = (np.arange(8) * h // 8).astype(np.int64)
                xs = (np.arange(8) * w // 8).astype(np.int64)
                small = gray[ys][:, xs]
                bits = (small > small.mean()).flatten()
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                out["asset_id"].append(aid)
                out["mean_rgb"].append([round(float(x), 6) for x in arr.mean(axis=(0, 1))])
                out["std_rgb"].append([round(float(x), 6) for x in arr.std(axis=(0, 1))])
                out["brightness"].append(round(float(gray.mean()), 6))
                out["phash"].append(f"{val:016x}")
            yield pd.DataFrame(out)

    return decoded.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


# ------------------------------------------------------------------ video ops

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def frame_sample(assets: DataFrame, every_k: int = 4) -> DataFrame:
    """Video -> every k-th frame as an image row (one-to-many mapInPandas;
    the Spark analog of an UDTF/explode over the decoded stream)."""

    def run(batches):
        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "width": [], "height": [],
                   "channels": [], "pixels": []}
            for aid, payload, meta in zip(pdf["asset_id"], pdf["payload"], pdf["meta"]):
                frames = DECODERS[meta["codec"]](bytes(payload))
                n, h, w = frames.shape
                for i in range(0, n, every_k):
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(i)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(1)
                    out["pixels"].append(bytearray(frames[i].tobytes()))
            yield pd.DataFrame(out)

    return assets.filter("kind = 'video'").mapInPandas(run, schema=FRAME_SCHEMA)


FRAME_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("brightness", DoubleType()),
    ]
)


def frame_features(frames: DataFrame) -> DataFrame:
    """Sampled frame -> brightness (mean pixel value). Keyed by
    (asset_id, frame_idx) so per-frame stats survive downstream joins —
    image_features would collapse the frame dimension."""

    def run(batches):
        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "brightness": []}
            for aid, idx, buf in zip(pdf["asset_id"], pdf["frame_idx"], pdf["pixels"]):
                px = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.float64)
                out["asset_id"].append(aid)
                out["frame_idx"].append(idx)
                out["brightness"].append(round(float(px.mean()), 6))
            yield pd.DataFrame(out)

    return frames.mapInPandas(run, schema=FRAME_FEATURE_SCHEMA)


# ------------------------------------------------------------------ audio ops

AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossing_rate", DoubleType()),
    ]
)


def audio_features(assets: DataFrame) -> DataFrame:
    """PCM -> RMS energy + zero-crossing rate (speech/music/quality gates)."""

    def run(batches):
        for pdf in batches:
            out = {"asset_id": [], "sample_rate": [], "duration_ms": [], "rms": [],
                   "zero_crossing_rate": []}
            for aid, payload, meta in zip(pdf["asset_id"], pdf["payload"], pdf["meta"]):
                rate, pcm = DECODERS[meta["codec"]](bytes(payload))
                x = pcm.astype(np.float64) / 32768.0
                zc = float(np.mean(np.abs(np.diff(np.signbit(x)).astype(np.float64))))
                out["asset_id"].append(aid)
                out["sample_rate"].append(rate)
                out["duration_ms"].append(round(len(x) / rate * 1000.0, 3))
                out["rms"].append(round(float(np.sqrt(np.mean(x * x))), 6))
                out["zero_crossing_rate"].append(round(zc, 6))
            yield pd.DataFrame(out)

    return assets.filter("kind = 'audio'").mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)
