"""Distributed top-k merge for partial-top-k streams (kNN / ANN).

Round-2 verdict item 1: the previous merge was ``repartition(1)`` into a
single reducer plus a driver-side pandas completeness guard.  Partials
are ≤ Q·k rows per upstream *block*, so the reduce input grows linearly
with block count — B·Q·k rows into one process at 100-TB block counts.

The replacement is a two-stage distributed merge:

1. **map-side combine**: a per-block top-k pass (``map_batches`` with
   ``batch_size=None``) collapses each block's partials back to ≤ Q·k
   rows before any exchange;
2. **hash-partitioned reduce**: rows shuffle by ``hash(group) % P``
   (one ``groupby(qpart).map_groups``) and each partition resolves the
   final top-k for its queries with one vectorized sort — no single
   reducer, no driver materialization.  P scales with the query count.

The completeness guard for the cell-pruned kNN plan runs INSIDE the
reduce (an ``incomplete`` flag column per query, computed against the
broadcast per-query bound), so the driver only ever collects the ≤ Q
ids that need the brute fallback — never the merged rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _num_parts_for_queries(nq: int) -> int:
    """One partition per handful of queries, capped: with P partitions
    the per-partition reduce input is ~B·k·(Q/P) rows."""
    return int(np.clip(nq, 1, 256))


def topk_merge(partials, k: int, group_col: str, val_col: str, key_col: str,
               ascending: bool = True, num_parts: int | None = None,
               nq_hint: int | None = None, bound_fn=None):
    """Partial-top-k rows → exact per-group top-k, fully distributed.

    ``partials`` rows: (group_col, key_col, val_col).  Result keeps the
    best ``k`` rows per group by ``val_col`` (ties break on ``key_col``);
    when ``bound_fn`` is given (vectorized: group ids → admissible
    bound), the output gains an ``incomplete`` bool column per row —
    True iff the group has < k rows or its kth value fails the bound.
    """
    if num_parts is None:
        num_parts = _num_parts_for_queries(nq_hint if nq_hint else 64)
    sort_cols = [group_col, val_col, key_col]
    sort_asc = [True, ascending, True]

    def local_merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
        df = df.groupby(group_col, as_index=False, sort=False).head(k)
        g = df[group_col].to_numpy()
        if g.dtype.kind in "iu":
            h = g.astype(np.uint64)
        else:  # non-integer group ids: deterministic siphash
            h = pd.util.hash_array(g.astype(object), categorize=False)
        df["qpart"] = (h % np.uint64(num_parts)).astype(np.int64)
        return df

    def final_merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
        top = df.groupby(group_col, as_index=False, sort=False).head(k).copy()
        top.drop(columns=["qpart"], inplace=True)
        if bound_fn is not None:
            grp = top.groupby(group_col, sort=False)[val_col]
            kth = grp.transform("max") if ascending else grp.transform("min")
            cnt = grp.transform("size")
            qb = bound_fn(top[group_col].to_numpy())
            bad = (cnt.to_numpy() < k) | (
                kth.to_numpy() >= qb if ascending else kth.to_numpy() <= qb)
            top["incomplete"] = bad
        return top

    return (partials
            .map_batches(local_merge, batch_format="pandas", batch_size=None)
            .groupby("qpart")
            .map_groups(final_merge, batch_format="pandas"))


def make_bound_fn(group_ids: np.ndarray, bounds: np.ndarray):
    """Vectorized group-id → bound lookup (sorted ids + searchsorted),
    picklable for the reduce stage."""
    order = np.argsort(group_ids)
    sorted_ids = np.ascontiguousarray(group_ids[order])
    sorted_bounds = np.ascontiguousarray(bounds[order])

    def fn(g: np.ndarray) -> np.ndarray:
        idx = np.minimum(np.searchsorted(sorted_ids, g),
                         max(sorted_ids.size - 1, 0))
        # ids not in the table would yield a silently-wrong bound (or an
        # IndexError past the end) — fail loudly instead (ADVICE r3)
        if sorted_ids.size == 0 or not np.array_equal(sorted_ids[idx], g):
            missing = g if sorted_ids.size == 0 else g[sorted_ids[idx] != g]
            raise KeyError(f"bound lookup: unknown group ids {missing[:5]!r}")
        return sorted_bounds[idx]

    return fn
