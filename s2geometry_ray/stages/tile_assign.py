"""O6/O7 tile assignment: grouped aggregates with pre-aggregation + salting.

The wide step of the engine (SURVEY.md §4.1).  Two building blocks:

- ``partial_group_agg``: a ``map_batches`` combiner that collapses each
  batch to one row per key (count / sum / min / max) BEFORE the
  shuffle, so the ``groupby`` exchanges #keys·#batches rows instead of
  the full table.  For algebraic aggregates this removes skew entirely
  — a hot key costs one row per batch regardless of its row count.
- ``salted_map_groups``: for non-algebraic per-group logic, appends
  ``salt = hash64(row_key) % S`` and runs
  ``groupby(key, salt).map_groups`` then a second tiny
  ``groupby(key)`` merge — no reducer ever sees more than
  ~target_rows_per_group rows (SURVEY.md §7.3.4 skew policy).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def partial_group_agg(key_col: str, value_col: str | None = None):
    """Batch combiner: one output row per distinct key per batch with
    columns n (count) and, when value_col given, s/mn/mx partials."""

    def _fn(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        if keys.dtype == np.uint64:
            # bijective int64 bit-view: Ray's aggregate hashes int64 natively
            # but falls into a slow (and overflowing) Python-int path on
            # uint64 keys (SURVEY.md §7.3.2 pitfall).
            keys = keys.view(np.int64)
        uniq, inv = np.unique(keys, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq))
        cols = {key_col: pa.array(uniq), "n": pa.array(n.astype(np.int64))}
        if value_col is not None:
            vals = batch[value_col].to_numpy(zero_copy_only=False)
            s = np.bincount(inv, weights=vals, minlength=len(uniq))
            mn = np.full(len(uniq), np.inf)
            np.minimum.at(mn, inv, vals)
            mx = np.full(len(uniq), -np.inf)
            np.maximum.at(mx, inv, vals)
            cols.update({"s": pa.array(s), "mn": pa.array(mn), "mx": pa.array(mx)})
        return pa.table(cols)

    return _fn


def combine_partials(partials, key_cols, agg_how: dict[str, str]):
    """Combine per-batch partial aggregates without Ray's groupby
    machinery (which costs ~10 s of fixed actor/partition overhead per
    call): combine within each block, MATERIALIZE the tiny partial set
    (bounded by #blocks × #keys — this is the contract of map-side
    pre-aggregation; materializing mid-pipeline is safe precisely
    because it is small), then one bounded reduce.  The materialize also
    prevents a measured Ray pitfall: a lazy AllToAll (repartition) on
    the tail re-executes the whole upstream pipeline (~2× wall time).

    Scale contract: the final reduce holds ≤ (#blocks × #distinct keys)
    rows — for bounded-cardinality keys (S2 prefix levels have ≤ 6·4^K
    cells; enum-ish dimensions).  For unbounded keys use
    ``ds.groupby(...).aggregate(...)`` instead."""
    keys = key_cols if isinstance(key_cols, list) else [key_cols]

    def combine(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(keys, as_index=False).agg(
            **{c: (c, how) for c, how in agg_how.items()})
        return pa.Table.from_pandas(g, preserve_index=False)

    out = partials.map_batches(combine, batch_format="pyarrow", batch_size=None)
    out = out.materialize()  # tiny by contract (see docstring)
    if out.num_blocks() > 64:
        # two-level tree: fan the per-block partials into ≤16 combiners
        # first so the final reduce input is bounded by 16 × #keys
        # regardless of upstream block count
        out = (out.repartition(16)
               .map_batches(combine, batch_format="pyarrow", batch_size=None)
               .materialize())
    return out.repartition(1).map_batches(combine, batch_format="pyarrow",
                                          batch_size=None)


def grouped_stats(ds, key_col: str, value_col: str | None = None):
    """count/sum/min/max per key with map-side pre-aggregation; only
    per-batch partials move between stages (SURVEY.md §3.5)."""
    partial = ds.map_batches(partial_group_agg(key_col, value_col),
                             batch_format="pyarrow", batch_size=None)
    how = {"n": "sum"}
    if value_col is not None:
        how.update({"s": "sum", "mn": "min", "mx": "max"})
    return combine_partials(partial, key_col, how)


def _hash64(arr: np.ndarray) -> np.ndarray:
    """Deterministic splitmix64 over int64/uint64 keys (salt hashing)."""
    x = arr.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def add_salt(ds, key_col: str, salt_per_key: dict, row_key_col: str,
             salt_col: str = "salt"):
    """Append a bounded salt column: hash64(row_key) % S(key), S from a
    count sketch (1 for cold keys).  Hot-key lookup is a vectorized
    searchsorted over the (sorted) hot-key array — no per-row dict."""
    hot_keys = np.sort(np.array(list(salt_per_key), dtype=np.int64))
    hot_s = np.array([salt_per_key[k] for k in hot_keys.tolist()], dtype=np.uint64)

    def _fn(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        if keys.dtype == np.uint64:
            # salt_plan's counts came through partial_group_agg, which
            # ships uint64 keys as int64 bit-views — match that here or
            # hot-key lookups silently miss.
            keys = keys.view(np.int64)
        svals = np.ones(len(keys), dtype=np.uint64)
        if hot_keys.size:
            idx = np.searchsorted(hot_keys, keys)
            idx_c = np.minimum(idx, hot_keys.size - 1)
            hit = hot_keys[idx_c] == keys
            svals[hit] = hot_s[idx_c[hit]]
        h = _hash64(batch[row_key_col].to_numpy(zero_copy_only=False))
        return batch.append_column(salt_col, pa.array((h % svals).astype(np.int64)))

    return ds.map_batches(_fn, batch_format="pyarrow")


def salt_plan(ds, key_col: str, target_rows_per_group: int,
              sample_fraction: float = 0.05, seed: int = 7) -> dict:
    """Count-sketch pass (sampled, pre-aggregated) → {hot_key: S}."""
    sample = ds.random_sample(sample_fraction, seed=seed) if sample_fraction < 1.0 else ds
    counts = grouped_stats(sample, key_col).to_pandas()
    est = counts["n"] / max(sample_fraction, 1e-9)
    hot = counts[est > target_rows_per_group]
    return {
        k: int(np.ceil(e / target_rows_per_group))
        for k, e in zip(hot[key_col].tolist(), est[hot.index].tolist())
    }


def salted_map_groups(ds, key_col: str, row_key_col: str, partial_fn, merge_fn,
                      target_rows_per_group: int = 100_000,
                      sample_fraction: float = 0.05):
    """groupby(key).map_groups with hot keys split across salted
    sub-groups:  partial_fn runs per (key, salt) group, merge_fn per key
    over the partials.  Both are pandas→pandas."""
    plan = salt_plan(ds, key_col, target_rows_per_group, sample_fraction)
    salted = add_salt(ds, key_col, plan, row_key_col)
    partials = salted.groupby([key_col, "salt"]).map_groups(partial_fn,
                                                            batch_format="pandas")
    return partials.groupby(key_col).map_groups(merge_fn, batch_format="pandas")
