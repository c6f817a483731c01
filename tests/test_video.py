"""MJPEG/AVI container (operators/video.py) tests: encode/decode
roundtrip, header metadata, chunk-walker robustness, error contract,
and the distributed video_frame_stats operator (sampling, degradation,
determinism across parallelism)."""

import struct

import numpy as np
import pytest

from trainable_entity_extractor_spark.operators.video import (
    avi_decode,
    avi_encode,
    synth_avi_rows,
    video_frame_stats,
)


def _gray(v, h=16, w=24):
    return np.full((h, w), v, dtype=np.uint8)


def test_roundtrip_gray_and_meta():
    frames = [_gray(55 + 10 * f) for f in range(4)]
    out, meta = avi_decode(avi_encode(frames, fps=12))
    assert meta == {
        "format": "mjpeg",
        "width": 24,
        "height": 16,
        "n_frames": 4,
        "declared_frames": 4,
        "fps": 12,
    }
    # uniform 8x8-aligned frames survive JPEG quantization exactly
    assert all((o == f).all() for o, f in zip(out, frames))


def test_roundtrip_color():
    fr = np.zeros((16, 24, 3), np.uint8)
    fr[:, :] = (90, 130, 170)
    out, meta = avi_decode(avi_encode([fr, fr]))
    assert meta["n_frames"] == 2
    assert out[0].shape == (16, 24, 3) and (out[0] == fr).all()


def test_walker_skips_unknown_chunks():
    payload = avi_encode([_gray(70)])
    # splice an odd-sized LIST INFO chunk between hdrl and movi,
    # fixing up the RIFF size
    movi_at = payload.index(b"LIST", payload.index(b"movi") - 8)
    extra = b"LIST" + struct.pack("<I", 9) + b"INFOjunkx" + b"\x00"
    spliced = payload[:movi_at] + extra + payload[movi_at:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out, meta = avi_decode(spliced)
    assert meta["n_frames"] == 1 and (out[0] == 70).all()


def test_audio_chunks_ignored_inside_movi():
    payload = bytearray(avi_encode([_gray(70), _gray(80)]))
    # rewrite the second frame's chunk id to an audio chunk: skipped
    second = payload.index(b"00dc", payload.index(b"00dc") + 4)
    payload[second : second + 4] = b"01wb"
    out, meta = avi_decode(bytes(payload))
    assert meta["n_frames"] == 1 and (out[0] == 70).all()


def test_decode_errors():
    with pytest.raises(ValueError):
        avi_decode(b"JUNKJUNKJUNKJUNK")
    with pytest.raises(ValueError):
        avi_decode(b"RIFF\x04\x00\x00\x00WAVE")  # right container, wrong form
    # a compressed chunk that is not JPEG => not MJPEG
    payload = bytearray(avi_encode([_gray(70)]))
    at = payload.index(b"00dc") + 8
    payload[at : at + 2] = b"XX"
    with pytest.raises(ValueError):
        avi_decode(bytes(payload))
    with pytest.raises(ValueError):
        avi_encode([])


def test_synth_rows_formulas():
    rows = synth_avi_rows(8)
    for i, (aid, blob) in enumerate(rows):
        frames, meta = avi_decode(blob)
        assert meta["n_frames"] == i % 3 + 2
        assert meta["fps"] == 10 + i % 20
        for f, fr in enumerate(frames):
            v = (i * 37 + f * 31 + 42) % 200 + 20
            luma = fr if fr.ndim == 2 else fr[:, :, 0]
            assert (luma == v).all()


def test_video_frame_stats_distributed(spark):
    rows = synth_avi_rows(12)
    assets = spark.createDataFrame(
        rows + [("bad", b"NOTANAVI________")], "asset_id string, blob binary"
    )
    out = video_frame_stats(assets).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["asset_id"], []).append(r)
    assert len(by_id["v00000"]) == 2 and len(by_id["v00002"]) == 4
    r0 = sorted(by_id["v00003"], key=lambda r: r["frame_idx"])[0]
    assert r0["format"] == "mjpeg" and (r0["height"], r0["width"]) == (16, 24)
    assert r0["mean_luma"] == (3 * 37 + 42) % 200 + 20
    assert by_id["bad"][0]["format"] == "error"
    assert by_id["bad"][0]["frame_idx"] == -1

    # sampling: stride 2, cap 1
    sampled = video_frame_stats(assets, every_k=2, max_frames=1).collect()
    per = {}
    for r in sampled:
        per.setdefault(r["asset_id"], []).append(r["frame_idx"])
    assert per["v00002"] == [0]  # 4 frames -> stride 2 -> cap 1

    # identical output at different parallelism
    out2 = video_frame_stats(
        spark.createDataFrame(rows, "asset_id string, blob binary").repartition(5)
    ).collect()
    key = lambda r: (r["asset_id"], r["frame_idx"])
    assert sorted(map(key, out2)) == sorted(
        key(r) for r in out if r["asset_id"] != "bad"
    )
