"""Pure-python image codecs: PPM (P6), BMP (24-bit), PNG (RGB8).

The sandbox has no Pillow/cv2 (SURVEY.md §0), so the decode actor's
codec state is implemented from the public format specs.  Encoders are
deliberately narrow (PNG writes filter-0 rows only); decoders handle
the full filter set (0–4) so an independent encoder's output would
still decode.  All formats here are lossless ⇒ the decode-stage
invariant is bit-exactness (PSNR = ∞; the ≥40 dB clause in
BASELINE.json:15 applies only if a lossy format is added later).

Pixels are (h, w, 3) uint8 RGB arrays throughout.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6 binary)
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
    return arr.reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, 24bpp, bottom-up, BGR)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    bgr = pixels[::-1, :, ::-1]  # bottom-up, BGR
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24bpp BMP supported")
    flip = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    arr = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = arr.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return (rgb[::-1] if flip else rgb).copy()


# ---------------------------------------------------------------------------
# PNG (8-bit RGB, all 5 filters on decode, filter 0 on encode)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = pixels.reshape(h, w * 3)  # filter byte 0 per row
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int = 3) -> np.ndarray:
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)].astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub: per-channel-lane prefix sum mod 256 —
            # uint8 cumsum wraps exactly as the spec's & 0xFF does
            cur = (line.astype(np.uint8).reshape(w, bpp)
                   .cumsum(axis=0, dtype=np.uint8).reshape(-1).astype(np.int32))
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average: sequential in x by definition; plain
            # Python ints beat numpy scalar boxing ~5× here
            cl = line.tolist()
            pl = prev.tolist()
            for x in range(stride):
                a = cl[x - bpp] if x >= bpp else 0
                cl[x] = (cl[x] + ((a + pl[x]) >> 1)) & 0xFF
            cur = np.asarray(cl, dtype=np.int32)
        elif ftype == 4:  # Paeth (same sequential structure as Average)
            cl = line.tolist()
            pl = prev.tolist()
            for x in range(stride):
                a = cl[x - bpp] if x >= bpp else 0
                b = pl[x]
                c = pl[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                cl[x] = (cl[x] + pred) & 0xFF
            cur = np.asarray(cl, dtype=np.int32)
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i = 8
    w = h = None
    idat = b""
    while i < len(data):
        (length,) = struct.unpack_from(">I", data, i)
        tag = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced RGB PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        i += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    return _unfilter(raw, h, w).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# qdct — from-scratch LOSSY codec (8×8 block DCT + JPEG-style quantization
# + zlib).  Exists to exercise the PSNR≥40dB decode clause for real: the
# sandbox has no Pillow/libjpeg, and every other codec here is lossless.
# Decode is deterministic, so phash(decode(encode(px))) is still a stable
# bit-exact verification key even though px itself is not recovered.
# ---------------------------------------------------------------------------

_QDCT_MAGIC = b"QDC1"

# standard JPEG luminance quantization table (public, ITU T.81 Annex K)
_JPEG_LUMA_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)


def _dct8_basis() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    c = np.where(k == 0, np.sqrt(1.0 / 8.0), np.sqrt(2.0 / 8.0))
    return c * np.cos((2 * n + 1) * k * np.pi / 16.0)


_DCT8 = _dct8_basis()


def _qdct_table(quality: int) -> np.ndarray:
    scale = (100 - quality) / 50.0 if quality >= 50 else 50.0 / quality
    return np.maximum(np.round(_JPEG_LUMA_Q * scale), 1.0)


def encode_qdct(pixels: np.ndarray, quality: int = 96) -> bytes:
    h, w = pixels.shape[:2]
    ph, pw = -h % 8, -w % 8
    x = np.pad(pixels.astype(np.float64) - 128.0,
               ((0, ph), (0, pw), (0, 0)), mode="edge")
    hh, ww = h + ph, w + pw
    blocks = x.reshape(hh // 8, 8, ww // 8, 8, 3).transpose(0, 2, 4, 1, 3)
    # D @ B @ D.T via broadcast matmul (einsum's per-call path search is
    # ~0.5 ms — dominates for small images)
    coeff = _DCT8 @ blocks @ _DCT8.T
    q = np.round(coeff / _qdct_table(quality)).astype(np.int16)
    header = _QDCT_MAGIC + np.array([w, h], dtype="<u4").tobytes() \
        + np.array([quality], dtype="<u2").tobytes()
    # level 1: int16 DCT coefficients barely benefit from deeper search
    # (measured 1.75 ms → 0.31 ms per 64² image for ~5% size)
    return header + zlib.compress(q.tobytes(), level=1)


def decode_qdct(data: bytes) -> np.ndarray:
    assert data[:4] == _QDCT_MAGIC
    w, h = np.frombuffer(data[4:12], dtype="<u4").astype(np.int64)
    quality = int(np.frombuffer(data[12:14], dtype="<u2")[0])
    hh, ww = h + (-h % 8), w + (-w % 8)
    q = np.frombuffer(zlib.decompress(data[14:]), dtype=np.int16)
    q = q.reshape(hh // 8, ww // 8, 3, 8, 8).astype(np.float64)
    coeff = q * _qdct_table(quality)
    blocks = _DCT8.T @ coeff @ _DCT8
    x = blocks.transpose(0, 3, 1, 4, 2).reshape(hh, ww, 3)
    return np.clip(np.round(x + 128.0), 0, 255).astype(np.uint8)[:h, :w]


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

ENCODERS = {"ppm": encode_ppm, "bmp": encode_bmp, "png": encode_png,
            "qdct": encode_qdct}
DECODERS = {"ppm": decode_ppm, "bmp": decode_bmp, "png": decode_png,
            "qdct": decode_qdct}
LOSSY_FMTS = {"qdct"}


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    return ENCODERS[fmt](pixels)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return DECODERS[fmt](data)


# Real JPEG is intentionally absent (no Pillow/libjpeg in the sandbox);
# qdct above fills the lossy slot behind the same encode/decode
# interface so the PSNR≥40dB decode check runs non-trivially.


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
