"""Bloom-filter join pruning: drop probe-side rows whose key cannot be
on the (filtered, selective) build side BEFORE the shuffle join moves
them.  False positives only ever pass extra rows into the join — which
drops them anyway — so the join result is EXACTLY the unpruned result;
what the filter buys is shuffle volume ∝ selectivity instead of ∝ table
size.

Design (all vectorized, no per-row Python):

- bits: double hashing ``pos_i = (h1 + i·h2) mod n_bits`` with two
  independent splitmix64 streams (h2 forced odd), the standard
  Kirsch–Mitzenmacher construction; ``n_bits`` a power of two so the
  mod is a mask.
- build: one partial Bloom (a ``n_bits/64`` uint64 word array) per
  batch, OR-combined.  Partials are fixed-size blobs (n_bits/8 bytes)
  regardless of row count, so the combine streams ≤ #blocks tiny blobs
  to the driver (`iter_batches` — one resident blob at a time).  At
  cluster scale the same OR runs as a 16-way ``repartition`` tree
  first, exactly like stages/tile_assign.combine_partials; the blob
  that results must be driver-resident anyway — it is the broadcast
  side.
- probe: the word array ships ONCE via ``ray.put``; each batch tests
  membership with k gather+mask passes and filters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from s2geometry_ray.functions.text import _splitmix64

_B_SEED1 = np.uint64(0x9E3779B97F4A7C15)
_B_SEED2 = np.uint64(0xC2B2AE3D27D4EB4F)


def bloom_params(n_keys: int, bits_per_key: int = 16,
                 k: int = 7) -> tuple[int, int]:
    """(n_bits, k) for an expected key count: n_bits = next power of two
    ≥ bits_per_key × n_keys (min 2¹⁶).  16 bits/key, k=7 → FPR ≈ 0.2%."""
    n_bits = 1 << max(16, int(np.ceil(np.log2(max(n_keys, 1)
                                              * bits_per_key))))
    return n_bits, k


def _positions(keys: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(k, N) bit positions via double hashing (uint64 wraparound)."""
    u = keys.astype(np.int64).view(np.uint64)
    h1 = _splitmix64(u ^ _B_SEED1)
    h2 = _splitmix64(u ^ _B_SEED2) | np.uint64(1)
    mask = np.uint64(n_bits - 1)
    return np.stack([(h1 + np.uint64(i) * h2) & mask for i in range(k)])


def _or_into(words: np.ndarray, keys: np.ndarray, n_bits: int, k: int):
    pos = _positions(keys, n_bits, k).ravel()
    np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (pos & np.uint64(63)))


def bloom_contains(words: np.ndarray, keys: np.ndarray, n_bits: int,
                   k: int) -> np.ndarray:
    """Vectorized membership mask — no false negatives by construction."""
    pos = _positions(keys, n_bits, k)
    m = np.ones(keys.shape[0], dtype=bool)
    for i in range(k):
        w = words[(pos[i] >> np.uint64(6)).astype(np.int64)]
        m &= ((w >> (pos[i] & np.uint64(63))) & np.uint64(1)) != 0
    return m


def build_bloom(ds, key_col: str, n_bits: int, k: int) -> np.ndarray:
    """Bloom word array of every key in ``ds[key_col]`` (int64 keys)."""
    n_words = n_bits >> 6

    def partial(t: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        _or_into(words, t[key_col].to_numpy(zero_copy_only=False), n_bits, k)
        return pa.table({"words": pa.array([words.tobytes()],
                                           type=pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    out = np.zeros(n_words, dtype=np.uint64)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for blob in b["words"]:
            out |= np.frombuffer(blob.as_py(), dtype=np.uint64)
    return out


def bloom_prefilter(ds, key_col: str, words_ref, n_bits: int, k: int):
    """Filter a dataset to rows whose key MAY be in the Bloom set —
    the pre-shuffle pruning stage.  ``words_ref`` is the ``ray.put``
    handle of the word array (fetched once per worker via the
    broadcast cache)."""

    def fn(t: pa.Table) -> pa.Table:
        from s2geometry_ray.stages.broadcast import get_broadcast

        words = get_broadcast(words_ref)
        m = bloom_contains(words, t[key_col].to_numpy(zero_copy_only=False),
                           n_bits, k)
        return t.filter(pa.array(m))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
