"""Audio + video payload kernels (multimodal plumbing, round 2).

The task's multimodal contract: image/audio/video ride as opaque
``binary`` columns with typed metadata; decode / feature-extract /
resize / frame-sample are actor-pool map_batches stages.  No media
libraries exist in this sandbox, so the codecs here are from scratch —
and REAL, not stubs:

- WAV/PCM16: RIFF header + little-endian samples — full encode/decode
  round trip is bit-exact (pure header math + np.frombuffer).
- video: a from-scratch frame container ``VID1`` (magic, w, h, fps,
  frame count, then length-prefixed per-frame images encoded with the
  repo's own codecs — qdct by default).  Frame-sampling reads ONLY the
  selected frames' byte ranges (length-prefix walk, no full decode).
- resize: exact area-average for integer factors (reduceat over both
  axes), nearest-neighbor otherwise — deterministic integer output.

Feature extraction emits integers (duration_ms, rms, zero crossings,
spectral-centroid Hz) so outputs are bit-comparable across engines.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# WAV / PCM16
# ---------------------------------------------------------------------------


def encode_wav(pcm: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, ch) int16 → RIFF/WAVE bytes (PCM16 LE)."""
    pcm = np.asarray(pcm, dtype="<i2")
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    data = pcm.tobytes()
    byte_rate = rate * ch * 2
    hdr = (b"RIFF" + np.uint32(36 + len(data)).tobytes() + b"WAVE"
           + b"fmt " + np.uint32(16).tobytes()
           + np.uint16(1).tobytes() + np.uint16(ch).tobytes()
           + np.uint32(rate).tobytes() + np.uint32(byte_rate).tobytes()
           + np.uint16(ch * 2).tobytes() + np.uint16(16).tobytes()
           + b"data" + np.uint32(len(data)).tobytes())
    return hdr + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → ((n, ch) int16, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    rate = None
    ch = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        size = int(np.frombuffer(data[pos + 4 : pos + 8], dtype="<u4")[0])
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = int(np.frombuffer(body[0:2], dtype="<u2")[0])
            if fmt != 1:
                raise ValueError(f"unsupported WAV format {fmt}")
            ch = int(np.frombuffer(body[2:4], dtype="<u2")[0])
            rate = int(np.frombuffer(body[4:8], dtype="<u4")[0])
            bits = int(np.frombuffer(body[14:16], dtype="<u2")[0])
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits}")
        elif tag == b"data":
            pcm = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return pcm.reshape(-1, ch), rate


def audio_features(pcm: np.ndarray, rate: int) -> dict:
    """Deterministic integer features of a PCM16 signal."""
    x = np.asarray(pcm, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = x.shape[0]
    dur_ms = int(round(1000.0 * n / rate))
    rms = int(round(float(np.sqrt(np.mean(x * x))))) if n else 0
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    if n >= 8:
        spec = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(n, d=1.0 / rate)
        tot = float(spec.sum())
        centroid = int(round(float((spec * freqs).sum()) / tot)) if tot > 0 else 0
    else:
        centroid = 0
    return {"duration_ms": dur_ms, "rms": rms, "zero_crossings": zc,
            "centroid_hz": centroid}


# ---------------------------------------------------------------------------
# VID1 frame container
# ---------------------------------------------------------------------------

_VID_MAGIC = b"VID1"


def encode_video(frames: list[np.ndarray], fps: int, fmt: str = "qdct") -> bytes:
    """Frames (each (h, w, 3) uint8, same shape) → VID1 container bytes."""
    from s2geometry_ray.kernels import codecs

    h, w = frames[0].shape[:2]
    out = [_VID_MAGIC,
           np.array([w, h, fps, len(frames)], dtype="<u4").tobytes(),
           np.uint8(len(fmt)).tobytes(), fmt.encode()]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("frames must share one shape")
        enc = codecs.encode(f, fmt)
        out.append(np.uint32(len(enc)).tobytes())
        out.append(enc)
    return b"".join(out)


def video_meta(data: bytes) -> dict:
    if data[:4] != _VID_MAGIC:
        raise ValueError("not a VID1 stream")
    w, h, fps, n = np.frombuffer(data[4:20], dtype="<u4")
    flen = data[20]
    fmt = data[21 : 21 + flen].decode()
    return {"w": int(w), "h": int(h), "fps": int(fps), "n_frames": int(n),
            "fmt": fmt, "body_off": 21 + flen}


def iter_frame_ranges(data: bytes):
    """Yield (frame_idx, start, end) byte ranges WITHOUT decoding."""
    m = video_meta(data)
    pos = m["body_off"]
    for i in range(m["n_frames"]):
        ln = int(np.frombuffer(data[pos : pos + 4], dtype="<u4")[0])
        yield i, pos + 4, pos + 4 + ln
        pos += 4 + ln


def sample_frames(data: bytes, every: int = 4) -> list[tuple[int, np.ndarray]]:
    """Decode every ``every``-th frame only (byte-range walk → the
    non-selected frames' payloads are never decoded)."""
    from s2geometry_ray.kernels import codecs

    m = video_meta(data)
    out = []
    for i, s, e in iter_frame_ranges(data):
        if i % every == 0:
            out.append((i, codecs.decode(data[s:e], m["fmt"])))
    return out


# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------


def resize_area(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic resize: exact box average when both factors are
    integers (downscale), else nearest-neighbor.  uint8 in/out."""
    h, w = pixels.shape[:2]
    if h % out_h == 0 and w % out_w == 0:
        fh, fw = h // out_h, w // out_w
        x = pixels.astype(np.uint32).reshape(out_h, fh, out_w, fw, -1)
        return (x.sum(axis=(1, 3)) // (fh * fw)).astype(np.uint8)
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return pixels[yi[:, None], xi[None, :]]
