"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

SURVEY.md §3.4 O9/O10 + the training-data-pipeline ops the engine is
graded on.  All are expressed as Ray Data primitives:

- exact:   fingerprint (map_batches) → groupby(fp) → keep min key.
  The shuffle moves only (fp, key) pairs, never payloads.
- minhash: shingle→minhash signature per batch (vectorized), explode to
  (band_id, band_hash) rows, groupby band buckets → candidate pairs →
  verified Jaccard.  Band rows are fixed-width; hot buckets are bounded
  by band width choice.
- simhash: 64-bit hyperplane sign sketch of token multiset; near-dup =
  hamming distance ≤ r via multi-index banding (exact-match any of the
  r+1 bands, then verify).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from s2geometry_ray.functions.text import fingerprint_batch

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, width: int = 5) -> np.ndarray:
    """Hashes of character shingles (word-agnostic, robust)."""
    t = text.lower()
    if len(t) < width:
        t = t.ljust(width, "_")
    views = [t[i : i + width] for i in range(len(t) - width + 1)]
    out = np.fromiter(
        (int.from_bytes(hashlib.blake2b(v.encode(), digest_size=8).digest(), "big")
         for v in views),
        dtype=np.uint64,
        count=len(views),
    )
    return np.unique(out)


class MinHasher:
    """Per-actor state: the (num_perm,) affine permutation parameters."""

    def __init__(self, num_perm: int = 64, bands: int = 16, seed: int = 1234,
                 shingle_width: int = 5, text_col: str = "text", key_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_width = shingle_width
        self.text_col = text_col
        self.key_col = key_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle_width)
        # (S, P) affine hash → column min; 61-bit Mersenne modulus
        v = (sh[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return v.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Emit (key, band_id, band_hash) rows — the LSH explode."""
        texts = batch[self.text_col].to_pylist()
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        n = len(texts)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = self.signature(t)
        r = self.rows_per_band
        band_hash = np.empty((n, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            block = sigs[:, b * r : (b + 1) * r]
            h = np.zeros(n, dtype=np.uint64)
            for c in range(r):
                h = h * np.uint64(0x100000001B3) + block[:, c]
            band_hash[:, b] = h
        return pa.table({
            self.key_col: pa.array(np.repeat(keys, self.bands)),
            "band_id": pa.array(np.tile(np.arange(self.bands, dtype=np.int64), n)),
            # int64 bit-view: band_hash is a groupby key (uint64 keys hit a
            # slow overflow fallback in Ray's aggregate — SURVEY.md §7.3.2)
            "band_hash": pa.array(band_hash.reshape(-1).view(np.int64), type=pa.int64()),
        })


def exact_dedup_groups(ds, text_col: str = "text", key_col: str = "doc_id"):
    """→ Dataset (key_col = min key per distinct text, n_copies)."""
    from ray.data.aggregate import Count, Min

    fp = ds.map_batches(lambda b: fingerprint_batch(b, text_col),
                        batch_format="pyarrow").select_columns([key_col, "fp64"])
    out = fp.groupby("fp64").aggregate(
        Min(key_col, alias_name=key_col), Count(alias_name="n_copies")
    )
    return out.select_columns([key_col, "n_copies"])


def minhash_candidate_pairs(ds, num_perm=64, bands=16, text_col="text",
                            key_col="doc_id", concurrency=4):
    """→ Dataset of candidate near-dup pairs (key_a < key_b) from LSH
    band buckets (unverified)."""
    band_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                   text_col=text_col, key_col=key_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        keys = np.sort(g[key_col].to_numpy())
        if len(keys) < 2:
            return pd.DataFrame({"key_a": [], "key_b": []})
        a, b = np.triu_indices(len(keys), k=1)
        return pd.DataFrame({"key_a": keys[a], "key_b": keys[b]})

    pairs = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # distinct pairs (a pair can match in several bands)
    return pairs.groupby(["key_a", "key_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def ngram_jaccard(texts_a: list[str], texts_b: list[str], width: int = 5) -> np.ndarray:
    """Verified Jaccard similarity for candidate pairs (vectorized set ops
    per pair over hashed shingles)."""
    out = np.empty(len(texts_a))
    for i, (ta, tb) in enumerate(zip(texts_a, texts_b)):
        sa = _shingle_hashes(ta, width)
        sb = _shingle_hashes(tb, width)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        out[i] = inter / union if union else 1.0
    return out


class SimHasher:
    """64-bit SimHash over hashed tokens; callable-class map_batches stage."""

    def __init__(self, text_col="text", key_col="doc_id"):
        import re

        self.token_re = re.compile(r"\w+")
        self.text_col = text_col
        self.key_col = key_col

    def simhash(self, text: str) -> np.uint64:
        toks = self.token_re.findall(text.lower())
        if not toks:
            return np.uint64(0)
        hs = np.fromiter(
            (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
             for t in toks),
            dtype=np.uint64,
            count=len(toks),
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
        score = bits.sum(axis=0) * 2 - len(toks)  # (+1/-1 vote per token)
        v = np.where(score > 0, 1, 0).astype(np.uint64)
        return (v << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sh = np.fromiter((self.simhash(t) for t in texts), dtype=np.uint64,
                         count=len(texts))
        return pa.table({
            self.key_col: batch[self.key_col],
            "simhash": pa.array(sh, type=pa.uint64()),
        })


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    # vectorized popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
