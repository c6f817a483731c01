"""From-scratch MJPEG-in-AVI video container + distributed frame stats.

Retires the deterministic-fake gate for the VIDEO leg of the multimodal
column family (operators/multimodal.py `sample_frames` slices raw bytes
as pseudo-frames; this module decodes REAL frames). Everything is built
from public specs only: the RIFF container layout shared with
operators/audio.py (Microsoft/IBM 'RIFF' form: tagged chunks, LIST
grouping, even-size padding) specialized to the 'AVI ' form — LIST
'hdrl' carrying the MainAVIHeader ('avih') and per-stream headers
('strh'/'strf'), LIST 'movi' carrying '%02ddc' compressed-frame chunks,
optional 'idx1' index — and Motion-JPEG as the frame codec, each chunk
a standalone baseline JFIF image decoded by the repo's own ITU-T T.81
codec (operators/jpeg.py, itself parity-tested against javax.imageio).

Scope: MJPEG video streams ('MJPG' handler, or any 'xxdc'/'xxdb' chunk
whose payload starts with a JPEG SOI); one video stream; audio streams
and other codecs raise ValueError so the caller can fall back to the
documented deterministic fake. Decode walks LIST structures tolerantly
(unknown chunks skipped, odd sizes padded) like the WAV chunk walker.

`video_frame_stats` is the distributed operator: mapInPandas over a
binary column (narrow, no shuffle — the same plumbing shape as
image_features/audio_features), emitting one typed row per SAMPLED
frame (stride `every_k`, cap `max_frames`). Undecodable payloads
degrade to a single format='error' row instead of failing the job (the
multimodal degradation contract).

Scale notes: decode is O(bytes) per row with no cross-row state; at
100 TB the operator inherits the scan's partitioning and the only knob
is `spark.sql.files.maxPartitionBytes`. The one-to-many frame fan-out
stays partition-preserving (no explode shuffle).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .jpeg import jpeg_decode, jpeg_encode

RIFF_SIG = b"RIFF"
_AVI_ID = b"AVI "


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def avi_encode(
    frames: list[np.ndarray], fps: int = 10, quality: int = 90
) -> bytes:
    """Encode frames (each HxW uint8 grayscale or HxWx3 RGB, all the
    same size) as an MJPEG AVI byte string with an idx1 index."""
    if not frames:
        raise ValueError("avi_encode needs at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one size")
    payloads = [jpeg_encode(f, quality=quality) for f in frames]
    max_size = max(len(p) for p in payloads)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(frames),
        0,  # dwInitialFrames
        1,  # dwStreams
        max_size,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids",
        b"MJPG",
        0,  # dwFlags
        0,  # wPriority
        0,  # wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate (rate/scale = fps)
        0,  # dwStart
        len(frames),  # dwLength
        max_size,  # dwSuggestedBufferSize
        0xFFFFFFFF,  # dwQuality (-1 default)
        0,  # dwSampleSize (0: varying frame sizes)
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b""
    index = b""
    for p in payloads:
        # idx1 offsets are from the 'movi' fourcc (list-type) position
        offset = 4 + len(movi_body)
        movi_body += _chunk(b"00dc", p)
        index += struct.pack("<4sII", b"00dc", 0x10, offset) + struct.pack(
            "<I", len(p)
        )
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(b"idx1", index)

    body = _AVI_ID + hdrl + movi + idx1
    return RIFF_SIG + struct.pack("<I", len(body)) + body


def _walk(payload: bytes, pos: int, end: int):
    """Yield (chunk_id, body_start, body_size) over a RIFF chunk range,
    honoring even-size padding and truncation."""
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        yield cid, pos + 8, min(size, end - pos - 8)
        pos += 8 + size + (size % 2)


def avi_decode(payload: bytes) -> tuple[list[np.ndarray], dict]:
    """Decode an MJPEG AVI byte string to (frames, meta).

    Frames come back exactly as jpeg_decode returns them (HxW grayscale
    or HxWx3). Raises ValueError on non-AVI payloads, missing headers,
    non-MJPEG compressed chunks, or zero decodable frames.
    """
    if len(payload) < 12 or payload[:4] != RIFF_SIG or payload[8:12] != _AVI_ID:
        raise ValueError("not a RIFF/AVI payload")
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    avih = None
    frames: list[np.ndarray] = []
    for cid, start, size in _walk(payload, 12, end):
        if cid != b"LIST":
            continue
        list_type = payload[start : start + 4]
        if list_type == b"hdrl":
            for sub_id, sub_start, sub_size in _walk(payload, start + 4, start + size):
                if sub_id == b"avih" and sub_size >= 40:
                    avih = struct.unpack(
                        "<10I", payload[sub_start : sub_start + 40]
                    )
        elif list_type == b"movi":
            for sub_id, sub_start, sub_size in _walk(payload, start + 4, start + size):
                if sub_id[2:4] in (b"dc", b"db"):
                    body = payload[sub_start : sub_start + sub_size]
                    if not body.startswith(b"\xff\xd8"):
                        raise ValueError("non-JPEG compressed frame (not MJPEG)")
                    arr, _ = jpeg_decode(body)
                    frames.append(arr)
    if avih is None:
        raise ValueError("AVI missing avih header")
    if not frames:
        raise ValueError("AVI contains no decodable frames")
    usec, _, _, _, total, _, _, _, width, height = avih
    meta = {
        "format": "mjpeg",
        "width": int(width),
        "height": int(height),
        "n_frames": int(len(frames)),
        "declared_frames": int(total),
        "fps": (1_000_000 // usec) if usec else 0,
    }
    return frames, meta


VIDEO_FRAME_SCHEMA = (
    "asset_id string, frame_idx int, format string, height int, width int, "
    "mean_luma bigint"
)


def video_frame_stats(
    assets: DataFrame,
    id_col: str = "asset_id",
    blob_col: str = "blob",
    every_k: int = 1,
    max_frames: int = 16,
) -> DataFrame:
    """Distributed frame sampling + per-frame stats over a binary video
    column: decode each AVI, keep every `every_k`-th frame up to
    `max_frames`, emit one typed row per sampled frame with the frame's
    rounded mean luma (channel 0 for color). Narrow mapInPandas, no
    shuffle; undecodable payloads yield one format='error' row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for aid, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    frames, meta = avi_decode(
                        bytes(blob) if blob is not None else b""
                    )
                    sampled = frames[::every_k][:max_frames]
                    for i, fr in enumerate(sampled):
                        luma = fr if fr.ndim == 2 else fr[:, :, 0]
                        recs.append(
                            {
                                "asset_id": aid,
                                "frame_idx": i * every_k,
                                "format": meta["format"],
                                "height": int(luma.shape[0]),
                                "width": int(luma.shape[1]),
                                "mean_luma": int(round(float(luma.mean()))),
                            }
                        )
                except ValueError:
                    recs.append(
                        {
                            "asset_id": aid,
                            "frame_idx": -1,
                            "format": "error",
                            "height": 0,
                            "width": 0,
                            "mean_luma": 0,
                        }
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id",
                    "frame_idx",
                    "format",
                    "height",
                    "width",
                    "mean_luma",
                ],
            )

    return assets.select(id_col, blob_col).mapInPandas(run, VIDEO_FRAME_SCHEMA)


def synth_avi_rows(n: int, seed: int = 42) -> list[tuple[str, bytes]]:
    """Deterministic AVI corpus for tests: uniform-luma frames (8x8-
    aligned constant blocks survive JPEG quantization exactly, so frame
    means are exact), seed-derived frame counts/values, alternating
    grayscale/color."""
    rows = []
    for i in range(n):
        n_frames = i % 3 + 2
        frames = []
        for f in range(n_frames):
            v = (i * 37 + f * 31 + seed) % 200 + 20
            if i % 2:
                fr = np.zeros((16, 24, 3), np.uint8)
                fr[:, :] = (v, (v + 40) % 256, (v + 80) % 256)
            else:
                fr = np.full((16, 24), v, dtype=np.uint8)
            frames.append(fr)
        rows.append((f"v{i:05d}", avi_encode(frames, fps=10 + i % 20)))
    return rows
