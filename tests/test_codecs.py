"""Codec + phash + synth-generator tests (SURVEY.md §6.2.3 decode stage:
lossless formats ⇒ bit-exact round trip asserted)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from s2geometry_ray.kernels import codecs
from s2geometry_ray.kernels.phash import phash64, phash64_i64
from s2geometry_ray.sources.synth import (
    derive_latlng,
    gen_image_row,
    gen_pixels,
    images_table,
)


@pytest.mark.parametrize("fmt", ["ppm", "bmp", "png"])
@pytest.mark.parametrize("shape", [(16, 16), (32, 64), (17, 23)])
def test_roundtrip_bit_exact(fmt, shape, rng):
    px = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    dec = codecs.decode(codecs.encode(px, fmt), fmt)
    assert np.array_equal(px, dec)
    assert codecs.psnr(px, dec) == float("inf")


def test_png_decoder_handles_all_filters(rng):
    """A foreign encoder may emit filters 1–4; our decoder must cope."""
    px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    stride = 24
    rows = []
    prev = np.zeros(stride, dtype=np.int32)
    for y, f in enumerate([0, 1, 2, 3, 4, 0, 2, 4]):
        cur = px[y].reshape(-1).astype(np.int32)
        enc = cur.copy()
        if f == 1:
            enc[3:] = (cur[3:] - cur[:-3]) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            for x in range(stride):
                a = cur[x - 3] if x >= 3 else 0
                enc[x] = (cur[x] - ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:
            for x in range(stride):
                a = cur[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                enc[x] = (cur[x] - pred) & 0xFF
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(tag, p):
        return struct.pack(">I", len(p)) + tag + p + struct.pack(
            ">I", zlib.crc32(tag + p) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(rows))) + chunk(b"IEND", b""))
    assert np.array_equal(codecs.decode_png(data), px)


def test_corrupt_inputs_raise():
    with pytest.raises(ValueError):
        codecs.decode_ppm(b"P5\n1 1\n255\nx")
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"XX" + b"\x00" * 60)
    with pytest.raises(ValueError):
        codecs.decode_png(b"\x89PNG\r\n\x1a\x00" + b"\x00" * 30)


def test_phash_properties():
    p1 = gen_pixels("imgA", 32, 32)
    assert phash64(p1) == phash64(p1.copy())  # deterministic
    p2 = np.clip(p1.astype(np.int32) + 1, 0, 255).astype(np.uint8)
    assert bin(phash64(p1) ^ phash64(p2)).count("1") <= 6  # robust to tiny change
    p3 = gen_pixels("imgB", 32, 32)
    assert bin(phash64(p1) ^ phash64(p3)).count("1") >= 10  # separates images


def test_synth_images_table():
    t = images_table(50)
    assert t.num_rows == 50
    assert t.schema.names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    # stamped phash matches a decode round trip
    for i in (0, 7, 23):
        row = {c: t[c][i].as_py() for c in t.schema.names}
        px = codecs.decode(row["bytes"], row["fmt"])
        assert (px.shape[1], px.shape[0]) == (row["w"], row["h"])
        assert int(phash64_i64(px)) == row["phash"]
        assert f"({derive_latlng(row['image_id'])[0]:.4f}" in row["caption"]


def test_synth_determinism():
    a = gen_image_row(123)
    b = gen_image_row(123)
    assert a == b


def test_qdct_lossy_psnr_contract():
    """The lossy qdct codec must land in 40 <= PSNR < inf on synth
    pixels: genuinely lossy (not bit-exact) but within the decode
    fidelity clause."""
    for i in range(8):
        px = gen_pixels(f"imgq{i}", [16, 32, 64, 60][i % 4], [32, 64, 24][i % 3])
        data = codecs.encode_qdct(px)
        back = codecs.decode_qdct(data)
        assert back.shape == px.shape and back.dtype == np.uint8
        p = codecs.psnr(px, back)
        assert 40.0 <= p < float("inf"), p
        assert (back != px).any()  # really lossy
        # decode is deterministic (the phash-verify contract for lossy)
        assert (codecs.decode_qdct(data) == back).all()


def test_qdct_in_synth_rotation():
    """Some synth rows use qdct, and their stored phash verifies
    bit-exactly against the (deterministic) decode."""
    rows = [gen_image_row(i) for i in range(40)]
    qd = [r for r in rows if r["fmt"] == "qdct"]
    assert qd, "rotation must include qdct"
    for r in qd[:3]:
        px = codecs.decode(r["bytes"], r["fmt"])
        assert int(phash64_i64(px)) == r["phash"]
        # and the decoded pixels are PSNR>=40 vs the pristine source
        from s2geometry_ray.sources.synth import gen_pixels as gp

        pristine = gp(r["image_id"], r["w"], r["h"])
        assert codecs.psnr(pristine, px) >= 40.0
