"""Multimodal plumbing tests: schema shape, determinism across
parallelism, stub gating."""

import pytest
from pyspark.sql import functions as F

from trainable_entity_extractor_spark.operators.multimodal import (
    decode_image,
    image_features,
    sample_frames,
    synth_assets,
)


def test_image_features_schema_and_determinism(spark):
    assets = synth_assets(spark, 50)
    feats = image_features(assets, deterministic_fake=True)
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert len(rows) == 50
    r = rows["asset/0"]
    assert r["meta"]["channels"] == 3
    assert len(r["feature"]) == 16

    # identical output at different parallelism
    assets2 = synth_assets(spark, 50).repartition(7)
    rows2 = {r["asset_id"]: r for r in image_features(assets2).collect()}
    assert rows2["asset/0"]["feature"] == r["feature"]


def test_decode_stub_gated():
    with pytest.raises(NotImplementedError):
        decode_image(b"xyz", deterministic_fake=False)


def test_frame_sampling_one_to_many(spark):
    assets = synth_assets(spark, 10)
    frames = sample_frames(assets, every_n_bytes=8, max_frames=4)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"asset_id", "frame_idx", "frame"}
    per_asset = pdf.groupby("asset_id")["frame_idx"].count()
    assert (per_asset == 4).all()  # 32-byte blobs / 8 = 4 frames


# ---------------------------------------------------------------------------
# real PNG decode path
# ---------------------------------------------------------------------------

import numpy as np

from trainable_entity_extractor_spark.operators.multimodal import (
    average_phash64,
    decode_image_array,
    encode_png,
    image_phash,
    phash_duplicates,
)


def _synth_image(seed: int, h: int = 13, w: int = 17, c: int = 3) -> np.ndarray:
    """Deterministic pseudo-random image without RNG state leakage."""
    idx = np.arange(h * w * c, dtype=np.int64)
    vals = (idx * 2654435761 + seed * 97) % 251
    return vals.reshape(h, w, c).astype(np.uint8)


def test_png_roundtrip_all_filters_and_channel_counts():
    for c in (1, 2, 3, 4):
        img = _synth_image(seed=c, h=9, w=11, c=c)
        for f in range(5):
            payload = encode_png(img, filter_type=f)
            arr = decode_image_array(payload)
            assert arr.shape == (9, 11, c), (c, f)
            assert np.array_equal(arr, img), f"filter {f}, channels {c}"


def test_decode_image_real_png_meta():
    img = _synth_image(seed=3, h=20, w=32, c=3)
    meta = decode_image(encode_png(img))  # no deterministic_fake needed
    assert meta == {"width": 32, "height": 20, "channels": 3, "format": "png"}


def test_phash_invariant_to_encoding_filter_and_sensitive_to_content():
    img = _synth_image(seed=7, h=24, w=24, c=3)
    h0 = average_phash64(decode_image_array(encode_png(img, 0)))
    h4 = average_phash64(decode_image_array(encode_png(img, 4)))
    assert h0 == h4  # same pixels, different wire encoding
    other = _synth_image(seed=8, h=24, w=24, c=3)
    assert average_phash64(other) != h0


def test_phash_dedup_buckets(spark):
    img_a = _synth_image(seed=1, h=16, w=16, c=3)
    img_b = _synth_image(seed=2, h=16, w=16, c=3)
    rows = [
        ("a1", bytearray(encode_png(img_a, 0))),
        ("a2", bytearray(encode_png(img_a, 2))),  # same pixels, refiltered
        ("b1", bytearray(encode_png(img_b))),
        ("junk", bytearray(b"not a png")),
    ]
    assets = spark.createDataFrame(rows, "asset_id string, blob binary")
    hashes = {r["asset_id"]: r["phash"] for r in image_phash(assets).collect()}
    assert hashes["junk"] is None
    assert hashes["a1"] == hashes["a2"] != hashes["b1"]
    dups = phash_duplicates(assets).collect()
    assert len(dups) == 1 and dups[0]["n_assets"] == 2 and dups[0]["keep_id"] == "a1"


def test_image_features_uses_real_pixels_for_png(spark):
    flat = np.full((8, 8, 3), 10, dtype=np.uint8)
    bright = np.full((8, 8, 3), 250, dtype=np.uint8)
    assets = spark.createDataFrame(
        [("dark", bytearray(encode_png(flat))), ("bright", bytearray(encode_png(bright)))],
        "asset_id string, blob binary",
    )
    rows = {r["asset_id"]: r for r in image_features(assets).collect()}
    assert rows["dark"]["meta"]["format"] == "png"
    # 4x4 grayscale means: dark image ~10/255, bright ~250/255
    assert all(abs(v - 10 / 255) < 1e-6 for v in rows["dark"]["feature"][:16])
    assert all(abs(v - 250 / 255) < 1e-6 for v in rows["bright"]["feature"][:16])


def test_corrupt_png_degrades_not_crashes(spark):
    """Malformed PNG-signed payloads (corrupt IDAT, short IHDR) must yield
    a null phash / fall back to the deterministic fake — not kill the
    Spark job with an uncaught zlib.error/struct.error (r3 ADVICE)."""
    import zlib as _zlib

    import pytest as _pytest

    from trainable_entity_extractor_spark.operators.multimodal import (
        _PNG_SIG,
        decode_image,
        encode_png,
        image_phash,
    )

    idx = np.arange(8 * 8 * 3, dtype=np.int64)
    good = encode_png(((idx * 31) % 251).reshape(8, 8, 3).astype(np.uint8))
    corrupt_idat = bytearray(good)
    corrupt_idat[60] ^= 0xFF  # flip a byte inside the IDAT stream
    short_ihdr = bytes(_PNG_SIG) + b"\x00\x00\x00\x05IHDR" + b"abcde" + b"\x00" * 4

    for bad in (bytes(corrupt_idat), short_ihdr):
        with _pytest.raises(ValueError):  # never zlib.error/struct.error
            decode_image(bad, deterministic_fake=False)
        assert decode_image(bad, deterministic_fake=True)["format"] == "fake"

    assets = spark.createDataFrame(
        [("ok", bytearray(good)), ("bad1", corrupt_idat), ("bad2", bytearray(short_ihdr))],
        "asset_id string, blob binary",
    )
    rows = {r["asset_id"]: r["phash"] for r in image_phash(assets).collect()}
    assert rows["ok"] is not None
    assert rows["bad1"] is None and rows["bad2"] is None


def test_image_features_corrupt_png_degrades(spark):
    """Regression (round-4 review): image_features' PNG branch must
    degrade corrupt PNG-signed payloads to the fake meta/features like
    decode_image does, not die inside mapInPandas."""
    from trainable_entity_extractor_spark.operators.multimodal import (
        encode_png,
        image_features,
    )

    idx = np.arange(8 * 8 * 3, dtype=np.int64)
    good = encode_png(((idx * 17) % 251).reshape(8, 8, 3).astype(np.uint8))
    bad = bytearray(good)
    bad[60] ^= 0xFF
    assets = spark.createDataFrame(
        [("ok", bytearray(good)), ("bad", bad)], "asset_id string, blob binary"
    )
    rows = {r["asset_id"]: r for r in image_features(assets).collect()}
    assert rows["ok"]["meta"]["format"] == "png"
    assert rows["bad"]["meta"]["format"] == "fake"
    assert len(rows["bad"]["feature"]) == 16
