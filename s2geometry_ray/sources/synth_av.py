"""Deterministic synthetic audio/video tables (multimodal plumbing).

Schemas follow the images table's shape — opaque ``binary`` payload +
typed metadata + a stamped verification key:

audio: (audio_id, bytes=WAV/PCM16, rate, n_samples, caption, rms)
video: (video_id, bytes=VID1, w, h, fps, n_frames, caption, phash0)

``rms`` / ``phash0`` are stamped from the SAME deterministic content at
synth time, so decode stages verify bit-exactly end-to-end (the decode
invariant the spec demands for images, extended to the other
modalities)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from s2geometry_ray.kernels import av
from s2geometry_ray.kernels.phash import phash64_i64
from s2geometry_ray.sources.synth import gen_pixels, _hash_u64

_RATES = [8000, 16000]


def gen_audio_row(row_id: int) -> dict:
    audio_id = f"aud{row_id:012d}"
    h = _hash_u64(audio_id, "av")
    rate = _RATES[h % 2]
    n = 1600 + int((h >> 2) % 6400)  # 0.1–1.0 s
    f0 = 100.0 + float((h >> 8) % 900)
    f1 = 1000.0 + float((h >> 16) % 2500)
    rng = np.random.default_rng(h % (1 << 32))
    t = np.arange(n) / rate
    x = (6000.0 * np.sin(2 * np.pi * f0 * t)
         + 2500.0 * np.sin(2 * np.pi * f1 * t)
         + rng.normal(0.0, 300.0, n))
    pcm = np.clip(np.round(x), -32768, 32767).astype(np.int16)
    feats = av.audio_features(pcm, rate)
    return {
        "audio_id": audio_id,
        "bytes": av.encode_wav(pcm, rate),
        "rate": np.int32(rate),
        "n_samples": np.int32(n),
        "caption": f"tone {int(f0)}Hz + {int(f1)}Hz",
        "rms": np.int64(feats["rms"]),
    }


def gen_video_row(row_id: int) -> dict:
    video_id = f"vid{row_id:012d}"
    h = _hash_u64(video_id, "av")
    n_frames = 6 + int(h % 12)
    fps = 4 + int((h >> 8) % 12)
    w = hgt = 32
    frames = [gen_pixels(f"{video_id}f{k}", w, hgt) for k in range(n_frames)]
    data = av.encode_video(frames, fps, fmt="qdct")
    # phash of the REFERENCE-DECODED first frame (qdct is lossy but
    # deterministic — same contract as the images table)
    first = av.sample_frames(data, every=n_frames + 1)[0][1]
    return {
        "video_id": video_id,
        "bytes": data,
        "w": np.int32(w),
        "h": np.int32(hgt),
        "fps": np.int32(fps),
        "n_frames": np.int32(n_frames),
        "caption": f"clip of {n_frames} frames at {fps} fps",
        "phash0": np.int64(phash64_i64(first)),
    }


AUDIO_SCHEMA = pa.schema([
    ("audio_id", pa.string()), ("bytes", pa.binary()), ("rate", pa.int32()),
    ("n_samples", pa.int32()), ("caption", pa.string()), ("rms", pa.int64()),
])

VIDEO_SCHEMA = pa.schema([
    ("video_id", pa.string()), ("bytes", pa.binary()), ("w", pa.int32()),
    ("h", pa.int32()), ("fps", pa.int32()), ("n_frames", pa.int32()),
    ("caption", pa.string()), ("phash0", pa.int64()),
])


def audio_table(n: int, start: int = 0) -> pa.Table:
    rows = [gen_audio_row(i) for i in range(start, start + n)]
    return pa.Table.from_pylist(rows, schema=AUDIO_SCHEMA)


def video_table(n: int, start: int = 0) -> pa.Table:
    rows = [gen_video_row(i) for i in range(start, start + n)]
    return pa.Table.from_pylist(rows, schema=VIDEO_SCHEMA)


def audio_dataset(n: int, parallelism: int | None = None):
    import ray.data as rd

    blocks = parallelism or max(1, n // 200)
    ds = rd.range(n, override_num_blocks=blocks)
    return ds.map_batches(
        lambda b: audio_table(len(b["id"]), start=int(b["id"][0])),
        batch_format="numpy", batch_size=256)


def video_dataset(n: int, parallelism: int | None = None):
    import ray.data as rd

    blocks = parallelism or max(1, n // 100)
    ds = rd.range(n, override_num_blocks=blocks)
    return ds.map_batches(
        lambda b: video_table(len(b["id"]), start=int(b["id"][0])),
        batch_format="numpy", batch_size=128)
