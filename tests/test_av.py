"""Audio/video multimodal plumbing: real from-scratch codecs (WAV PCM16
bit-exact, VID1 frame container), frame sampling without full decode,
deterministic resize, and the actor-pool stages end-to-end."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from s2geometry_ray.kernels import av
from s2geometry_ray.sources.synth_av import (
    audio_table,
    gen_audio_row,
    gen_video_row,
    video_table,
)


def test_wav_roundtrip_bit_exact():
    rng = np.random.default_rng(4)
    for ch in (1, 2):
        pcm = rng.integers(-32768, 32767, size=(1234, ch), dtype=np.int16)
        back, rate = av.decode_wav(av.encode_wav(pcm, 16000))
        assert rate == 16000
        assert back.shape == (1234, ch)
        assert (back == pcm).all()
    # mono 1-D input round-trips as (n, 1)
    mono = rng.integers(-1000, 1000, 500, dtype=np.int16)
    back, _ = av.decode_wav(av.encode_wav(mono, 8000))
    assert (back[:, 0] == mono).all()
    with pytest.raises(ValueError):
        av.decode_wav(b"nope" + b"\x00" * 50)


def test_audio_features_deterministic():
    row = gen_audio_row(7)
    pcm, rate = av.decode_wav(row["bytes"])
    f1 = av.audio_features(pcm, rate)
    f2 = av.audio_features(pcm, rate)
    assert f1 == f2
    assert f1["rms"] == row["rms"]
    assert f1["duration_ms"] == round(1000 * row["n_samples"] / row["rate"])
    assert f1["centroid_hz"] > 0


def test_video_container_roundtrip_and_sampling():
    row = gen_video_row(3)
    m = av.video_meta(row["bytes"])
    assert (m["w"], m["h"], m["n_frames"]) == (row["w"], row["h"], row["n_frames"])
    ranges = list(av.iter_frame_ranges(row["bytes"]))
    assert len(ranges) == row["n_frames"]
    # sampling every 3rd decodes exactly ceil(n/3) frames
    sampled = av.sample_frames(row["bytes"], every=3)
    assert [i for i, _ in sampled] == list(range(0, row["n_frames"], 3))
    for _, px in sampled:
        assert px.shape == (row["h"], row["w"], 3) and px.dtype == np.uint8
    # decode is deterministic
    a = av.sample_frames(row["bytes"], every=100)[0][1]
    b = av.sample_frames(row["bytes"], every=100)[0][1]
    assert (a == b).all()


def test_resize_area():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    th = av.resize_area(px, 8, 8)
    assert th.shape == (8, 8, 3) and th.dtype == np.uint8
    # exact box average for the integer-factor path
    want = px.astype(np.uint32).reshape(8, 4, 8, 4, 3).sum(axis=(1, 3)) // 16
    assert (th == want.astype(np.uint8)).all()
    # non-integer factor falls back to nearest (shape + determinism)
    odd = av.resize_area(px, 5, 7)
    assert odd.shape == (5, 7, 3)
    assert (odd == av.resize_area(px, 5, 7)).all()


def test_audio_stage_e2e(ray_session):
    import ray.data as rd

    from s2geometry_ray.stages.decode import audio_feature_stage

    ds = rd.from_arrow(audio_table(40))
    out = audio_feature_stage(ds, concurrency=2).to_pandas()
    assert len(out) == 40
    assert out["rms_ok"].all()  # stamped rms verifies bit-exactly
    assert (out["duration_ms"] > 0).all()


def test_video_stage_e2e(ray_session):
    import ray.data as rd

    from s2geometry_ray.stages.decode import video_sample_stage

    t = video_table(12)
    ds = rd.from_arrow(t)
    out = video_sample_stage(ds, every=4, concurrency=2).to_pandas()
    n_frames = t["n_frames"].to_numpy()
    want_rows = int(sum((n + 3) // 4 for n in n_frames))
    assert len(out) == want_rows
    assert out["phash0_ok"].all()  # frame-0 phash verifies bit-exactly
    assert set(out["video_id"]) == set(t["video_id"].to_pylist())
