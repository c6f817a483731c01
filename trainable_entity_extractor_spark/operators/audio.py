"""From-scratch WAV (RIFF/PCM) audio codec + distributed audio features.

Round-5 companion to the PNG codec (multimodal.py) and the baseline JPEG
codec (jpeg.py): it retires the `deterministic_fake` gate for the audio
leg of the multimodal column family. Everything here is implemented from
the public RIFF/WAVE container layout and PCM sample encoding (the
Microsoft/IBM WAVE format: 'RIFF' size 'WAVE' followed by tagged chunks;
'fmt ' carries format-tag/channels/rate/bits, 'data' carries interleaved
little-endian PCM frames) — no media libraries.

Scope (mirrors the reference's "opaque binary column + typed metadata"
treatment of media, e.g. XmlFile/PdfImages handling in the reference
repo; there is no audio path in the reference — this is part of the
beyond-reference LLM-data-pipeline surface):

- PCM integer samples, 8-bit unsigned and 16-bit signed little-endian,
  any channel count. Float/ADPCM/extensible WAVE raise ValueError (the
  caller may then fall back to multimodal.py's deterministic fake).
- Chunk walker tolerates extra chunks (LIST/fact/cue) and odd-sized
  chunks (RIFF pads to even offsets).
- `audio_features` is the distributed operator: mapInPandas over a
  binary column, Arrow-batched, emitting a typed metadata/feature row
  per asset — the same plumbing shape as image_features, so the plan
  is a narrow map with no shuffle.

Scale notes: decode is O(bytes) per row with no cross-row state, so the
operator inherits the scan's partitioning; at 100 TB the only knob that
matters is `spark.sql.files.maxPartitionBytes` on the asset table.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

RIFF_SIG = b"RIFF"
_WAVE_ID = b"WAVE"


def wav_encode(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode PCM samples as a WAV byte string.

    `samples` is 1-D (mono) or 2-D (frames x channels). dtype int16 →
    16-bit signed PCM; uint8 → 8-bit unsigned PCM. Other dtypes raise.
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("samples must be 1-D or 2-D (frames x channels)")
    if arr.dtype == np.int16:
        bits = 16
    elif arr.dtype == np.uint8:
        bits = 8
    else:
        raise ValueError("supported sample dtypes: int16, uint8")
    n_frames, channels = arr.shape
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data = arr.astype("<i2" if bits == 16 else "u1").tobytes()  # interleaved
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    body = (
        _WAVE_ID
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) % 2:
        body += b"\x00"  # RIFF chunks are padded to even sizes
    return RIFF_SIG + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[np.ndarray, dict]:
    """Decode a RIFF/WAVE byte string to (frames x channels array, meta).

    Returns int16 samples for both bit depths (8-bit unsigned is centered
    to signed by subtracting 128 and left-shifted 8 so amplitude scales
    match). Raises ValueError on non-WAV, truncated, or non-integer-PCM
    payloads.
    """
    if len(payload) < 12 or payload[:4] != RIFF_SIG or payload[8:12] != _WAVE_ID:
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # skip pad byte of odd chunks
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate, _byte_rate, _block_align, bits = fmt
    if tag != 1 or bits not in (8, 16) or channels < 1:
        raise ValueError(f"unsupported WAVE encoding (tag={tag}, bits={bits})")
    if bits == 16:
        arr = np.frombuffer(data[: len(data) // (2 * channels) * 2 * channels], "<i2")
    else:
        raw = np.frombuffer(data[: len(data) // channels * channels], "u1")
        arr = (raw.astype(np.int16) - 128) << 8
    frames = arr.reshape(-1, channels)
    meta = {
        "format": f"pcm{bits}",
        "sample_rate": int(rate),
        "channels": int(channels),
        "n_frames": int(frames.shape[0]),
    }
    return frames, meta


def wav_features(payload: bytes) -> dict:
    """Decode + scalar features for one payload: container meta plus
    peak amplitude, RMS (rounded to int16 scale), and the zero-crossing
    count of channel 0 (strict sign flips; zero samples keep the previous
    sign, so silence doesn't inflate the count)."""
    frames, meta = wav_decode(payload)
    flat = frames.astype(np.float64)
    ch0 = frames[:, 0].astype(np.int32)
    sign = np.sign(ch0)
    # propagate the last nonzero sign through zero samples
    nz = sign != 0
    idx = np.where(nz, np.arange(sign.size), -1)
    np.maximum.accumulate(idx, out=idx)
    carried = np.where(idx >= 0, sign[np.maximum(idx, 0)], 0)
    crossings = int(np.count_nonzero(np.diff(carried) != 0)) if sign.size > 1 else 0
    meta.update(
        {
            "peak": int(np.max(np.abs(flat))) if flat.size else 0,
            "rms": int(round(float(np.sqrt(np.mean(flat**2))))) if flat.size else 0,
            "zero_crossings": crossings,
        }
    )
    return meta


AUDIO_FEATURE_SCHEMA = (
    "asset_id string, format string, sample_rate int, channels int, "
    "n_frames bigint, peak bigint, rms bigint, zero_crossings bigint"
)


def audio_features(
    assets: DataFrame, id_col: str = "asset_id", blob_col: str = "blob"
) -> DataFrame:
    """Distributed audio metadata/features over a binary column.

    Narrow mapInPandas (no shuffle): each Arrow batch of (id, blob) rows
    yields one feature row per asset. Undecodable payloads yield a row
    with format='error' and zeroed features rather than failing the job
    (the multimodal.py degradation contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for aid, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    m = wav_features(bytes(blob) if blob is not None else b"")
                except ValueError:
                    m = {
                        "format": "error",
                        "sample_rate": 0,
                        "channels": 0,
                        "n_frames": 0,
                        "peak": 0,
                        "rms": 0,
                        "zero_crossings": 0,
                    }
                recs.append({"asset_id": aid, **m})
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id",
                    "format",
                    "sample_rate",
                    "channels",
                    "n_frames",
                    "peak",
                    "rms",
                    "zero_crossings",
                ],
            )

    return assets.select(id_col, blob_col).mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def square_wave(n: int, period: int, amplitude: int) -> np.ndarray:
    """Deterministic test signal: +A for `period` samples, then -A, …
    Closed-form stats (peak=A, rms=A, zero_crossings=(n-1)//period) make
    it the construction for parser-independent oracles."""
    i = np.arange(n)
    return np.where((i // period) % 2 == 0, amplitude, -amplitude).astype(np.int16)


def synth_wav_rows(n: int, seed: int = 42) -> list[tuple[str, bytes]]:
    """Deterministic WAV corpus for tests: square waves with seed-derived
    period/amplitude/length, alternating mono/stereo."""
    rows = []
    for i in range(n):
        period = (i * 7 + seed) % 11 + 2
        amp = ((i * 13 + seed) % 40 + 10) * 256
        length = 2000 + (i % 5) * 500
        wave = square_wave(length, period, amp)
        if i % 2:
            wave = np.stack([wave, (-wave).astype(np.int16)], axis=1)
        rows.append((f"a{i:05d}", wav_encode(wave, sample_rate=8000)))
    return rows
