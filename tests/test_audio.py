"""WAV codec (operators/audio.py) tests: encode/decode roundtrip,
two-way parity with the stdlib `wave` module, 8-bit and stereo paths,
chunk-walker robustness, feature formulas, and the distributed
audio_features operator (schema + determinism across parallelism)."""

import io
import struct
import wave

import numpy as np
import pytest

from trainable_entity_extractor_spark.operators.audio import (
    audio_features,
    square_wave,
    synth_wav_rows,
    wav_decode,
    wav_encode,
    wav_features,
)


def test_roundtrip_mono16():
    w = square_wave(4000, 5, 2560)
    frames, meta = wav_decode(wav_encode(w, 8000))
    assert meta == {
        "format": "pcm16",
        "sample_rate": 8000,
        "channels": 1,
        "n_frames": 4000,
    }
    assert (frames[:, 0] == w).all()


def test_roundtrip_stereo_and_8bit():
    w = square_wave(1000, 3, 1280)
    st = np.stack([w, (-w).astype(np.int16)], axis=1)
    frames, meta = wav_decode(wav_encode(st))
    assert meta["channels"] == 2 and (frames == st).all()

    u = ((w.astype(np.int32) >> 8) + 128).astype(np.uint8)
    frames8, meta8 = wav_decode(wav_encode(u, 8000))
    assert meta8["format"] == "pcm8"
    # 8-bit decode re-centers and left-shifts back to int16 scale
    assert (frames8[:, 0] == w).all()


def test_stdlib_wave_parity_both_ways():
    w = square_wave(500, 4, 999)
    # stdlib writes, our decoder reads
    buf = io.BytesIO()
    ww = wave.open(buf, "wb")
    ww.setnchannels(1)
    ww.setsampwidth(2)
    ww.setframerate(8000)
    ww.writeframes(w.tobytes())
    ww.close()
    frames, meta = wav_decode(buf.getvalue())
    assert (frames[:, 0] == w).all() and meta["sample_rate"] == 8000

    # our encoder writes, stdlib reads
    rd = wave.open(io.BytesIO(wav_encode(w, 8000)), "rb")
    assert rd.getnchannels() == 1
    assert rd.getframerate() == 8000
    assert rd.readframes(500) == w.tobytes()


def test_chunk_walker_skips_extra_and_padded_chunks():
    w = square_wave(9, 2, 300)
    payload = wav_encode(w)
    # splice an odd-sized LIST chunk between WAVE and fmt
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = payload[:12] + extra + payload[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    frames, meta = wav_decode(spliced)
    assert meta["n_frames"] == 9 and (frames[:, 0] == w).all()


def test_decode_errors():
    with pytest.raises(ValueError):
        wav_decode(b"JUNKJUNKJUNKJUNK")
    with pytest.raises(ValueError):
        wav_decode(b"")
    # float PCM (tag 3) rejected
    w = square_wave(10, 2, 100)
    payload = bytearray(wav_encode(w))
    payload[20] = 3  # format tag lives at offset 20 in our fixed layout
    with pytest.raises(ValueError):
        wav_decode(bytes(payload))
    with pytest.raises(ValueError):
        wav_encode(np.zeros(4, dtype=np.float32))


def test_feature_formulas():
    n, period, amp = 4000, 5, 2560
    m = wav_features(wav_encode(square_wave(n, period, amp)))
    assert m["peak"] == amp and m["rms"] == amp
    assert m["zero_crossings"] == (n - 1) // period
    # zeros don't inflate the crossing count
    z = np.array([100, 0, 0, -100, 0, 100], dtype=np.int16)
    assert wav_features(wav_encode(z))["zero_crossings"] == 2


def test_audio_features_distributed(spark):
    rows = synth_wav_rows(40)
    assets = spark.createDataFrame(rows, "asset_id string, blob binary")
    out = {r["asset_id"]: r for r in audio_features(assets).collect()}
    assert len(out) == 40
    for i in (0, 1, 7):
        period = (i * 7 + 42) % 11 + 2
        amp = ((i * 13 + 42) % 40 + 10) * 256
        length = 2000 + (i % 5) * 500
        r = out[f"a{i:05d}"]
        assert r["format"] == "pcm16"
        assert r["channels"] == (2 if i % 2 else 1)
        assert r["n_frames"] == length
        assert r["peak"] == amp and r["rms"] == amp
        assert r["zero_crossings"] == (length - 1) // period

    # identical output at different parallelism; corrupt rows degrade
    assets2 = spark.createDataFrame(
        rows + [("bad", b"NOTAWAV_________")], "asset_id string, blob binary"
    ).repartition(7)
    out2 = {r["asset_id"]: r for r in audio_features(assets2).collect()}
    assert out2["a00003"] == out["a00003"]
    assert out2["bad"]["format"] == "error" and out2["bad"]["peak"] == 0
