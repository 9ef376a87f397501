"""O61 exact heavy hitters: top-N most frequent keys WITHOUT a full
key shuffle — the "top domains / top users / hottest tokens" question a
100-TB curation pipeline asks constantly, where a plain
``groupby(key).count()`` would exchange every row.

Two passes, both map-only + bounded combine (the engine's sketch
pattern — HLL, Bloom, quantile histograms):

1. **Counter-sketch partials**: each batch emits its EXACT per-key
   counts truncated to its top-``k`` keys (deterministic tie-break:
   count desc, key asc) plus one bound row carrying ``u`` = the largest
   count it dropped.  Summaries merge by summation — for any key, the
   merged ``s`` is a LOWER bound on its true total, undershooting by at
   most ``U = Σ u`` (a key missed in a batch contributed ≤ that batch's
   ``u``).  This is the Misra-Gries/SpaceSaving guarantee re-expressed
   on exact batch counts, which makes the bound deterministic and
   replayable on any block layout.
2. **Exact verification**: the top candidates by ``s`` (a small
   broadcast set) are exact-counted in a second map-only pass.  The
   result is PROVABLY the true top-N iff the N-th exact count exceeds
   ``U`` plus the best lower bound among unverified candidates — any
   key outside the candidate set has true count ≤ U.  The operator
   RAISES when the certificate fails (raise ``k`` or ``verify_factor``)
   instead of returning a silently-approximate answer, so the SQL twin
   (plain GROUP BY / ORDER BY / LIMIT) is value-exact whenever the
   operator returns at all.

Scale notes: raw keys never shuffle — only (key, partial-count) rows ≤
k per block move, the combine is bounded by the distinct keys that ever
made a batch top-k, and the verify pass ships one broadcast array.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_BOUND_KIND = np.int64(1)


def heavy_hitters(ds, key_col: str, topn: int = 10, k: int = 256,
                  verify_factor: int = 4):
    """→ pyarrow.Table (key_col, n) of the EXACT top-``topn`` keys by
    frequency, count desc then key asc — or raise if exactness cannot
    be certified at this ``k``.  The result is a driver-side table
    (≤ topn rows)."""
    import ray

    from s2geometry_ray.stages.broadcast import get_broadcast
    from s2geometry_ray.stages.tile_assign import combine_partials

    def partial(t: pa.Table) -> pa.Table:
        keys, counts = np.unique(np.asarray(t[key_col]), return_counts=True)
        if keys.size == 0:
            return pa.table({key_col: t[key_col], "s": pa.array(
                [], type=pa.int64()), "kind": pa.array([], type=pa.int64())})
        u = 0
        if keys.size > k:
            order = np.lexsort((keys, -counts))
            dropped = order[k:]
            u = int(counts[dropped].max())
            keep = np.sort(order[:k])
            keys, counts = keys[keep], counts[keep]
        # the bound row reuses keys[0] as its (ignored) key — kind=1
        # separates it, and a null key would be DROPPED by the pandas
        # groupby inside combine_partials
        return pa.table({
            key_col: pa.array(np.append(keys, keys[:1])),
            "s": pa.array(np.append(counts.astype(np.int64), u)),
            "kind": pa.array(np.append(np.zeros(keys.size, np.int64),
                                       _BOUND_KIND)),
        })

    merged = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["kind", key_col], {"s": "sum"}).to_pandas()
    ub = int(merged.loc[merged["kind"] == 1, "s"].sum())
    cand = merged[merged["kind"] == 0].sort_values(
        ["s", key_col], ascending=[False, True], kind="mergesort")
    n_verify = min(len(cand), max(topn * verify_factor, topn))
    chosen = cand.head(n_verify)
    s_excluded = int(cand["s"].iloc[n_verify]) if len(cand) > n_verify else 0

    if ub == 0:
        # nothing was ever dropped: the merged sums ARE the exact counts
        exact = chosen
    else:
        vkeys = np.sort(chosen[key_col].to_numpy())
        vref = ray.put(vkeys)

        def count_candidates(t: pa.Table) -> pa.Table:
            vk = get_broadcast(vref)
            col = np.asarray(t[key_col])
            sel = col[np.isin(col, vk)]
            keys, counts = np.unique(sel, return_counts=True)
            return pa.table({key_col: pa.array(keys),
                             "s": pa.array(counts.astype(np.int64))})

        exact = combine_partials(
            ds.map_batches(count_candidates, batch_format="pyarrow",
                           batch_size=None),
            key_col, {"s": "sum"}).to_pandas().sort_values(
                ["s", key_col], ascending=[False, True], kind="mergesort")

    top = exact.head(topn)
    if len(top) < topn:
        raise ValueError(f"heavy_hitters: only {len(top)} candidate keys "
                         f"for topn={topn}")
    nth = int(top["s"].iloc[topn - 1])
    # certificate: an unverified candidate totals ≤ its lower bound + U;
    # a key outside every batch top-k totals ≤ U
    if nth <= s_excluded + ub:
        raise ValueError(
            f"heavy_hitters: cannot certify exactness (nth count {nth} <= "
            f"excluded-candidate bound {s_excluded} + drop bound {ub}) — "
            f"raise k (={k}) or verify_factor (={verify_factor})")
    return pa.table({key_col: pa.array(top[key_col].to_numpy()),
                     "n": pa.array(top["s"].to_numpy(), type=pa.int64())})


def heavy_hitters_sql(key_col: str = "user_id", topn: int = 10,
                      table: str = "events") -> str:
    """Twin: the certified-exact operator equals the brute GROUP BY."""
    return f"""
SELECT CAST({key_col} AS BIGINT) AS {key_col},
       CAST(count(*) AS BIGINT) AS n
FROM {table}
GROUP BY {key_col}
ORDER BY n DESC, {key_col}
LIMIT {topn}
"""
