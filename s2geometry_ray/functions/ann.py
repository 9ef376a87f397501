"""Similarity search over the embeddings table (list<float> column).

- ``brute_topk``: exact cosine top-k per batch against a broadcast
  query matrix (one matmul per batch, partial top-k rows out, tiny
  groupby merge) — the baseline and the verification oracle.
- ``ivf_topk``: IVF-style scale path — a k-means-lite coarse quantizer
  (trained on a sample, broadcast) assigns each row to a centroid
  bucket; queries probe the ``nprobe`` nearest buckets only.  Recall is
  measured against brute on fixtures, not assumed.
- ``cosine_neardup_pairs``: embedding near-duplicate pairs via the same
  bucket structure (pairs within a bucket with cosine ≥ τ).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _stack_embeddings(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if arr.num_chunks == 1:
        chunk = arr.chunk(0)
    else:
        chunk = arr.combine_chunks()
    flat = chunk.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = chunk.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    assert (widths == widths[0]).all(), "ragged embedding column"
    return flat.reshape(len(chunk), int(widths[0]))


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteCosineActor:
    """Partial top-k per batch: emits (query_idx, key, sim) rows."""

    def __init__(self, queries_ref, k: int, key_col: str, emb_col: str):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = _normalize_rows(np.asarray(q, dtype=np.float64))
        self.k = k
        self.key_col = key_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize_rows(_stack_embeddings(batch, self.emb_col))
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        sims = emb @ self.q.T  # (B, Q)
        kk = min(self.k, emb.shape[0])
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        nq = self.q.shape[0]
        qs, ks, ss = [], [], []
        for qi in range(nq):
            rows = part[:, qi]
            qs.append(np.full(kk, qi, dtype=np.int64))
            ks.append(keys[rows])
            ss.append(sims[rows, qi])
        return pa.table({
            "query_idx": pa.array(np.concatenate(qs)),
            self.key_col: pa.array(np.concatenate(ks)),
            "sim": pa.array(np.concatenate(ss), type=pa.float64()),
        })


def brute_topk(ds, query_matrix: np.ndarray, k: int, key_col="vec_id",
               emb_col="embedding", concurrency=(1, 4)):
    """Exact cosine top-k for each query row; → (query_idx, key, sim)."""
    import ray

    qref = ray.put(np.asarray(query_matrix, dtype=np.float64))
    partials = ds.map_batches(
        BruteCosineActor,
        fn_constructor_args=(qref, k, key_col, emb_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def merge_all(batch: pd.DataFrame) -> pd.DataFrame:
        # bounded single reduce (≤ Q·k rows per upstream block)
        batch = batch.sort_values(["query_idx", "sim", key_col],
                                  ascending=[True, False, True], kind="mergesort")
        return batch.groupby("query_idx", as_index=False, sort=False).head(k)

    return partials.repartition(1).map_batches(merge_all, batch_format="pandas",
                                               batch_size=None)


def train_centroids(ds, emb_col="embedding", n_centroids=16, iters=8,
                    sample_fraction=0.25, seed=3) -> np.ndarray:
    """k-means-lite on a driver-side sample (the quantizer is tiny and
    broadcast; training data never exceeds the sample)."""
    sample = ds.random_sample(sample_fraction, seed=seed).take_all()
    x = _normalize_rows(np.asarray([r[emb_col] for r in sample], dtype=np.float64))
    rng = np.random.default_rng(seed)
    c = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(c.shape[0]):
            m = assign == j
            if m.any():
                c[j] = x[m].mean(axis=0)
        c = _normalize_rows(c)
    return c


class IvfAssignActor:
    def __init__(self, centroids_ref, key_col: str, emb_col: str):
        import ray

        self.c = ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) else centroids_ref
        self.key_col = key_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize_rows(_stack_embeddings(batch, self.emb_col))
        bucket = np.argmax(emb @ self.c.T, axis=1).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket))


def ivf_topk(ds, query_matrix: np.ndarray, k: int, key_col="vec_id",
             emb_col="embedding", n_centroids=16, nprobe=4, concurrency=(1, 4)):
    """IVF approximate top-k: assign buckets, prune batches to rows whose
    bucket is probed by ≥1 query, then brute within survivors."""
    import ray

    c = train_centroids(ds, emb_col, n_centroids)
    q = _normalize_rows(np.asarray(query_matrix, dtype=np.float64))
    probe = np.argsort(-(q @ c.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    probed = np.unique(probe)
    cref = ray.put(c)
    assigned = ds.map_batches(IvfAssignActor, fn_constructor_args=(cref, key_col, emb_col),
                              batch_format="pyarrow", concurrency=concurrency)
    probed_list = probed.tolist()

    def prune(batch: pa.Table) -> pa.Table:
        mask = np.isin(batch["bucket"].to_numpy(zero_copy_only=False), probed_list)
        return batch.filter(pa.array(mask))

    pruned = assigned.map_batches(prune, batch_format="pyarrow")
    return brute_topk(pruned, query_matrix, k, key_col, emb_col, concurrency)


def cosine_neardup_pairs(ds, tau=0.95, key_col="vec_id", emb_col="embedding",
                         n_centroids=16, concurrency=(1, 4)):
    """Near-duplicate embedding pairs (cosine ≥ τ) within IVF buckets.
    Misses cross-bucket pairs by design (documented recall trade-off);
    fixtures measure recall vs the brute O(N²) oracle."""
    import ray

    c = train_centroids(ds, emb_col, n_centroids)
    cref = ray.put(c)
    assigned = ds.map_batches(IvfAssignActor, fn_constructor_args=(cref, key_col, emb_col),
                              batch_format="pyarrow", concurrency=concurrency)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        emb = _normalize_rows(np.asarray(g[emb_col].tolist(), dtype=np.float64))
        keys = g[key_col].to_numpy()
        sims = emb @ emb.T
        a, b = np.nonzero(np.triu(sims >= tau, k=1))
        order = np.argsort(keys)
        return pd.DataFrame({
            "key_a": np.minimum(keys[a], keys[b]),
            "key_b": np.maximum(keys[a], keys[b]),
            "sim": sims[a, b],
        })

    return assigned.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
