"""O57 cell-union overlap join: distributed A2 interval algebra.

For every (tile_a, tile_b) pair whose coverings intersect, the EXACT
number of shared leaf cells — `Σ min(hi) − max(lo) + 1` over
overlapping Hilbert ranges (all-uint64 arithmetic, so the result is a
bit-exact area proxy, not a float estimate).  This is the reference's
`S2CellUnion.intersect` re-expressed as a Dataset operator: the big
side's exploded covering streams through `map_batches`, the small side
is broadcast ONCE as per-tile sorted range arrays, and each batch
resolves its overlaps with two `searchsorted` probes per small-side
tile (a tile's own covering is disjoint + sorted — the R6 invariant —
so every overlap run is contiguous).  Only (pair, partial-sum) rows
leave the task; the bounded combine finishes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from s2geometry_ray.kernels import cellid as vk
from s2geometry_ray.kernels.covering import get_covering, normalize_cell_union


def exploded_covering(tiles, max_cells: int = 64, max_level: int = 14):
    """[(tile_key:int, region)] → (tile_key, cell_id, lo, hi) arrays —
    the exploded covering table (§2.2), normalized per tile."""
    keys, cells = [], []
    for k, region in tiles:
        cov = np.asarray(normalize_cell_union(
            get_covering(region, max_cells=max_cells, max_level=max_level)),
            dtype=np.uint64)
        keys.append(np.full(cov.size, int(k), dtype=np.int64))
        cells.append(cov)
    key = np.concatenate(keys) if keys else np.empty(0, np.int64)
    cell = np.concatenate(cells) if cells else np.empty(0, np.uint64)
    return key, cell, vk.range_min(cell), vk.range_max(cell)


def _small_side(tiles_b, max_cells, max_level):
    """Per-tile sorted (lo, hi) arrays for the broadcast side."""
    out = []
    for k, region in tiles_b:
        cov = np.asarray(normalize_cell_union(
            get_covering(region, max_cells=max_cells, max_level=max_level)),
            dtype=np.uint64)
        lo, hi = vk.range_min(cov), vk.range_max(cov)
        order = np.argsort(lo)
        out.append((int(k), lo[order], hi[order]))
    return out


def covering_overlap(cov_a_ds, tiles_b, max_cells: int = 64,
                     max_level: int = 14):
    """``cov_a_ds`` streams exploded covering rows (tile_key, lo, hi —
    int64 bit-views); ``tiles_b`` is the small broadcast side.  Returns
    (tile_a, tile_b, overlap_leafs) for intersecting pairs."""
    import ray

    from s2geometry_ray.stages.broadcast import get_broadcast
    from s2geometry_ray.stages.tile_assign import combine_partials

    b_ref = ray.put(_small_side(tiles_b, max_cells, max_level))

    def partial(t: pa.Table) -> pa.Table:
        side_b = get_broadcast(b_ref)
        ka = t["tile_key"].to_numpy(zero_copy_only=False)
        lo_a = t["lo"].to_numpy(zero_copy_only=False).view(np.uint64)
        hi_a = t["hi"].to_numpy(zero_copy_only=False).view(np.uint64)
        pair_a, pair_b, sums = [], [], []
        for kb, lo_b, hi_b in side_b:
            # overlap run per a-range: b with hi >= lo_a and lo <= hi_a
            i0 = np.searchsorted(hi_b, lo_a, side="left")
            i1 = np.searchsorted(lo_b, hi_a, side="right")
            cnt = np.maximum(i1 - i0, 0)
            tot = int(cnt.sum())
            if not tot:
                continue
            a_rep = np.repeat(np.arange(ka.size), cnt)
            first = np.cumsum(cnt) - cnt
            b_idx = (np.arange(tot) - np.repeat(first, cnt)
                     + np.repeat(i0, cnt))
            ov = (np.minimum(hi_a[a_rep], hi_b[b_idx])
                  - np.maximum(lo_a[a_rep], lo_b[b_idx]) + np.uint64(1))
            df_keys = ka[a_rep]
            # per-batch partial sum per tile_a (tile_b fixed in this loop)
            uk = np.unique(df_keys)
            s = np.zeros(uk.size, dtype=np.uint64)
            np.add.at(s, np.searchsorted(uk, df_keys), ov)
            if np.any(s >= np.uint64(1 << 63)):
                raise ValueError("overlap count exceeds int64")
            pair_a.append(uk)
            pair_b.append(np.full(uk.size, kb, dtype=np.int64))
            sums.append(s.astype(np.int64))
        if not pair_a:
            return pa.table({
                "tile_a": pa.array([], type=pa.int64()),
                "tile_b": pa.array([], type=pa.int64()),
                "overlap_leafs": pa.array([], type=pa.int64()),
            })
        return pa.table({
            "tile_a": pa.array(np.concatenate(pair_a)),
            "tile_b": pa.array(np.concatenate(pair_b)),
            "overlap_leafs": pa.array(np.concatenate(sums)),
        })

    partials = cov_a_ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=None)
    return combine_partials(partials, ["tile_a", "tile_b"],
                            {"overlap_leafs": "sum"})


def covering_values_sql(key, lo, hi, alias: str) -> str:
    """Exploded covering pinned as a VALUES table with UBIGINT ranges."""
    rows = ", ".join(
        f"({int(k)}, CAST({int(l)} AS UBIGINT), CAST({int(h)} AS UBIGINT))"
        for k, l, h in zip(key, lo, hi))
    return f"(VALUES {rows}) AS {alias}(tile, lo, hi)"
