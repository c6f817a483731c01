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
