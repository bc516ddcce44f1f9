"""Multimodal (audio/video) stages — REAL Ray-side plumbing, STUBBED codecs.

Per the build brief: audio/video libraries are not in this container, so
the decode kernels are clearly-marked stubs (``NotImplementedError`` for
real formats, a deterministic fake codec for tests), while everything Ray
cares about — schemas, batch sizing, actor/task signatures, output layout —
is real and tested. Swap ``_decode_audio``/``_decode_video_frame`` for
ffmpeg/soundfile bindings in a full deployment; nothing else changes.

Fake formats (deterministic, self-describing):
- ``rawpcm``: header ``b"RAWPCM"`` + int32 sample_rate + int16 samples.
- ``rawvid``: header ``b"RAWVID"`` + int32 (n_frames, h, w) + uint8 RGB
  frames back to back.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

AUDIO_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("fmt", pa.string()),
        ("sample_rate", pa.int32()),
        ("caption", pa.string()),
    ]
)

VIDEO_SCHEMA = pa.schema(
    [
        ("video_id", pa.string()),
        ("bytes", pa.binary()),
        ("fmt", pa.string()),
        ("n_frames", pa.int32()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("caption", pa.string()),
    ]
)


def encode_rawpcm(samples: np.ndarray, sample_rate: int) -> bytes:
    s = np.asarray(samples, dtype=np.int16)
    return b"RAWPCM" + struct.pack("<i", sample_rate) + s.tobytes()


def encode_rawvid(frames: np.ndarray) -> bytes:
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, _ = f.shape
    return b"RAWVID" + struct.pack("<iii", n, h, w) + f.tobytes()


def _decode_audio(data, fmt: str) -> tuple[np.ndarray, int]:
    if fmt == "rawpcm" and bytes(data[:6]) == b"RAWPCM":
        (rate,) = struct.unpack("<i", data[6:10])
        return np.frombuffer(data[10:], dtype=np.int16), rate
    # STUB: real codecs (mp3/flac/wav via soundfile/ffmpeg) not available
    raise NotImplementedError(f"audio codec {fmt!r} requires soundfile/ffmpeg (not in container)")


def _decode_video_frame(data, fmt: str, frame_idx: int) -> np.ndarray:
    if fmt == "rawvid" and bytes(data[:6]) == b"RAWVID":
        n, h, w = struct.unpack("<iii", data[6:18])
        if not 0 <= frame_idx < n:
            raise IndexError(f"frame {frame_idx} of {n}")
        sz = h * w * 3
        off = 18 + frame_idx * sz
        return np.frombuffer(data[off : off + sz], dtype=np.uint8).reshape(h, w, 3)
    # STUB: real codecs (mp4/h264 via ffmpeg/pyav) not available
    raise NotImplementedError(f"video codec {fmt!r} requires ffmpeg/pyav (not in container)")


class AudioFeatures:
    """Actor/task stage: decode audio → loudness features. Wide binary rows
    → run with small ``batch_size``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        from ..arrow_utils import binary_views

        rms = np.full(n, np.nan)
        dur = np.full(n, np.nan)
        ok = np.zeros(n, dtype=bool)
        blobs = binary_views(batch["bytes"])
        fmts = batch["fmt"].to_pylist()
        for i in range(n):
            try:
                samples, rate = _decode_audio(blobs[i], fmts[i])
            except NotImplementedError:
                continue
            ok[i] = True
            x = samples.astype(np.float64) / 32768.0
            rms[i] = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
            dur[i] = len(x) / rate if rate else 0.0
        return (
            batch.drop_columns(["bytes"])
            .append_column("decoded_ok", pa.array(ok))
            .append_column("rms", pa.array(rms))
            .append_column("duration_s", pa.array(dur))
        )


class FrameSampler:
    """Actor/task stage: sample ``n_sample`` evenly-spaced frames per video
    and emit per-frame mean intensity (exploded: one row per sampled
    frame)."""

    def __init__(self, n_sample: int = 3):
        self.n_sample = n_sample

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..arrow_utils import binary_views

        vids, frames, means = [], [], []
        blobs = binary_views(batch["bytes"])
        fmts = batch["fmt"].to_pylist()
        ids = batch["video_id"].to_pylist()
        nf = np.asarray(batch["n_frames"])
        for i in range(batch.num_rows):
            take = np.unique(
                np.linspace(0, max(0, int(nf[i]) - 1), self.n_sample).astype(int)
            )
            for fi in take:
                try:
                    frame = _decode_video_frame(blobs[i], fmts[i], int(fi))
                except NotImplementedError:
                    continue
                vids.append(ids[i])
                frames.append(int(fi))
                means.append(float(frame.mean()))
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_idx": pa.array(frames, pa.int32()),
                "mean_intensity": pa.array(means, pa.float64()),
            }
        )
