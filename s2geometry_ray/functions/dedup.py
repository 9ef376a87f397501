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


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _shingle_hashes(text: str, width: int = 5) -> np.ndarray:
    """Hashes of character shingles, fully vectorized: the 5-byte window
    is packed into a uint64 (exact shingle identity — no collisions)
    then splitmix64-mixed to spread over the 64-bit space for the
    affine min-hash permutations."""
    b = np.frombuffer(text.lower().encode("utf-8", "surrogatepass"),
                      dtype=np.uint8)
    if b.size < width:
        b = np.pad(b, (0, width - b.size), constant_values=ord("_"))
    n = b.size - width + 1
    h = np.zeros(n, dtype=np.uint64)
    for k in range(width):
        h = (h << np.uint64(8)) | b[k : k + n].astype(np.uint64)
    return np.unique(_splitmix64(h))


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

    # Partition by band-hash prefix (few, large groups) and pair WITHIN a
    # partition using vectorized run detection — one pandas/numpy call per
    # partition instead of one map_groups call per bucket (640k buckets ⇒
    # minutes of per-group overhead, measured).
    num_parts = 32
    max_bucket = 256  # degenerate buckets (constant bands) are truncated

    def add_part(t: pa.Table) -> pa.Table:
        bh = t["band_hash"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array((bh % num_parts).astype(np.int64)))

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band_id", "band_hash", key_col], kind="mergesort")
        bid = g["band_id"].to_numpy()
        bh = g["band_hash"].to_numpy()
        keys = g[key_col].to_numpy()
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(g))
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            kk = keys[s : min(e, s + max_bucket)]
            a, b = np.triu_indices(len(kk), k=1)
            out_a.append(kk[a])
            out_b.append(kk[b])
        if not out_a:
            return pd.DataFrame({"key_a": np.array([], dtype=keys.dtype),
                                 "key_b": np.array([], dtype=keys.dtype)})
        return pd.DataFrame({"key_a": np.concatenate(out_a),
                             "key_b": np.concatenate(out_b)})

    pairs = band_rows.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(partition_pairs, batch_format="pandas")

    # distinct pairs (a pair can match in several bands): candidate pairs
    # are bounded by LSH design (buckets are near-duplicate groups), so a
    # per-block dedup + single bounded reduce beats a second full shuffle.
    def dedup_block(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["key_a", "key_b"])

    pairs = pairs.map_batches(dedup_block, batch_format="pandas", batch_size=None)
    return pairs.repartition(1).map_batches(dedup_block, batch_format="pandas",
                                            batch_size=None)


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
