"""64-bit DCT perceptual hash (pHash) of RGB pixel arrays.

Grayscale → 32×32 area-mean resize → 2-D DCT-II (exact matmul against a
precomputed cosine basis — no scipy in the sandbox) → top-left 8×8
low-frequency block (skipping DC) → median threshold → 64 bits.
Deterministic; used both by the synthetic generator (to stamp the
``phash`` column) and by the decode stage (to verify it).
"""

from __future__ import annotations

import numpy as np

_N = 32


def _dct_basis(n: int = _N) -> np.ndarray:
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    basis = np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    basis[0] *= 1.0 / np.sqrt(2.0)
    return basis * np.sqrt(2.0 / n)


_BASIS = _dct_basis()


def _to_gray(pixels: np.ndarray) -> np.ndarray:
    p = pixels.astype(np.float64)
    return 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]


def _resize_area(gray: np.ndarray, n: int = _N) -> np.ndarray:
    """Box/area resampling to (n, n) via block averaging over an n·k grid
    (inputs are generated at multiples of 16/32/64 so k is integral;
    otherwise fall back to index sampling)."""
    h, w = gray.shape
    if h % n == 0 and w % n == 0:
        return gray.reshape(n, h // n, n, w // n).mean(axis=(1, 3))
    yi = (np.arange(n) * h) // n
    xi = (np.arange(n) * w) // n
    return gray[yi][:, xi]


def phash64(pixels: np.ndarray) -> int:
    gray = _resize_area(_to_gray(pixels))
    dct = _BASIS @ gray @ _BASIS.T
    block = dct[:8, :8].flatten()
    vals = block[1:]  # skip DC term
    med = np.median(vals)
    bits = vals > med
    out = 0
    for b in bits:  # 63 bits; bit 63 left zero
        out = (out << 1) | int(b)
    return out


def phash64_i64(pixels: np.ndarray) -> np.int64:
    """phash as int64 (the images-table column type)."""
    return np.int64(np.uint64(phash64(pixels)))
