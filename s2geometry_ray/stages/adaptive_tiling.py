"""O50 adaptive tiling: density-driven quadtree refinement.

Given a point stream, emit the unique multi-level S2 cell set in which
every output cell holds at most ``cap`` points (except at ``max_level``,
where refinement stops) and every strict ancestor holds MORE than
``cap`` — i.e. the coarsest refinement that respects the cap.  This is
the balanced-partition builder for a 100-TB table: the output cells ARE
the shuffle partitions of a downstream job (Hilbert ranges → contiguous
key ranges), and the attached counts let a planner bin-pack them onto
workers.

Selection rule (deterministic; per-cell counts are monotone up the
quadtree, so checking the immediate parent suffices for the whole
ancestor chain): a level-``L`` cell ``c`` with ``n(c) > 0`` is OUTPUT
iff::

    (L == min_level  OR  n(parent(c, L-1)) > cap)
    AND (n(c) <= cap  OR  L == max_level)

Plan shape (scale posture): read → cell-assign (map) → per-batch
partial counts of the ancestor at EVERY level in ``[min, max]`` (map —
a (level, cell) pair IS the ancestor id, so one uint64 key carries
both; levels can never collide because the level is encoded in the
id's lsb position) → bounded combine (map-side pre-aggregation
contract: ≤ (max−min+1) · min(6·4^max, N_points) distinct keys) → one
vectorized selection pass.  Only (cell, count) pairs ever move between
stages; the points themselves are never shuffled.

Two selection paths share one kernel:

- default: the combined counts table is a single tiny block by the
  pre-agg contract (``max_level`` ≤ ~12), selected in one
  ``map_batches`` pass;
- ``partitioned=True``: counts are hash-partitioned by the
  ``min_level`` ancestor — every subtree lands in exactly one group, so
  per-group selection is complete — for deep refinements whose counts
  table outgrows a block.  Both paths are pinned equal by pytest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from s2geometry_ray.kernels import cellid as vk
from s2geometry_ray.scale import derive_num_parts


def _partial_level_counts(levels: tuple[int, ...]):
    """Per-batch partial: one (ancestor_id, n) row per distinct ancestor
    of each point at each requested level.  Ancestor ids ride as the
    int64 bit-view (the documented Ray uint64-shuffle-key pitfall)."""

    def _fn(batch: pa.Table) -> pa.Table:
        cid = batch["cell_id"].to_numpy(zero_copy_only=False).view(np.uint64)
        anc = np.concatenate([vk.parent(cid, lv) for lv in levels])
        cells, counts = np.unique(anc, return_counts=True)
        return pa.table({
            "cell_bits": pa.array(cells.view(np.int64), type=pa.int64()),
            "n": pa.array(counts.astype(np.int64), type=pa.int64()),
        })

    return _fn


def _select_cells(tbl: pa.Table, min_level: int, max_level: int,
                  cap: int) -> pa.Table:
    """Vectorized selection over a COMPLETE (cell, n) subtree table:
    the caller guarantees that for every non-min_level cell present its
    parent row is present too (true for the single-block path, and for
    the per-subtree groups of the partitioned path)."""
    cells = tbl["cell_bits"].to_numpy(zero_copy_only=False).view(np.uint64)
    n = tbl["n"].to_numpy(zero_copy_only=False)
    lvl = vk.level(cells)
    # parent lookup via searchsorted on the sorted cell set
    order = np.argsort(cells, kind="stable")
    sc, sn = cells[order], n[order]
    is_min = lvl == min_level
    nm = ~is_min
    # vk.parent takes a scalar level; compute per level present (par is
    # only ever read at non-min rows)
    par = np.zeros_like(cells)
    for lv in np.unique(lvl[nm]):
        m = lvl == lv
        par[m] = vk.parent(cells[m], int(lv) - 1)
    idx = np.searchsorted(sc, par[nm])
    # every parent must be present (completeness contract) — fail loudly
    if idx.size and (np.any(idx >= sc.size) or np.any(sc[np.minimum(idx, sc.size - 1)] != par[nm])):
        raise ValueError("adaptive_tiling: parent row missing — counts "
                         "table split across blocks without subtree "
                         "partitioning (use partitioned=True)")
    parent_hot = np.zeros(cells.size, dtype=bool)
    parent_hot[nm] = sn[np.minimum(idx, sc.size - 1)] > cap
    keep = (is_min | parent_hot) & ((n <= cap) | (lvl == max_level))
    return pa.table({
        "cell_id": pa.array(cells[keep], type=pa.uint64()),
        "level": pa.array(lvl[keep], type=pa.int64()),
        "n_points": pa.array(n[keep].astype(np.int64), type=pa.int64()),
    })


def adaptive_tiling(points_ds, min_level: int, max_level: int, cap: int,
                    partitioned: bool = False, n_rows_hint: int | None = None):
    """``points_ds`` must carry a leaf ``cell_id`` uint64 column (from
    stages.cell_assign).  Returns a Dataset of (cell_id uint64, level,
    n_points) — the refined tiling."""
    if not (0 <= min_level <= max_level <= vk.MAX_LEVEL):
        raise ValueError("level bounds out of range")
    levels = tuple(range(min_level, max_level + 1))
    from s2geometry_ray.stages.tile_assign import combine_partials

    partials = points_ds.map_batches(_partial_level_counts(levels),
                                     batch_format="pyarrow", batch_size=None)
    combined = combine_partials(partials, "cell_bits", {"n": "sum"})

    if not partitioned:
        return combined.map_batches(
            lambda t: _select_cells(t, min_level, max_level, cap),
            batch_format="pyarrow", batch_size=None)

    # scale path: co-locate each min_level subtree (the repo's standard
    # explicit-partition pattern: a derived `part` column hashed from
    # the subtree ROOT only, so one partition = whole subtrees, and the
    # per-group selection kernel sees complete parent chains)
    nparts = derive_num_parts(n_rows_hint, rows_per_part=200_000)

    def add_part(t: pa.Table) -> pa.Table:
        cells = t["cell_bits"].to_numpy(zero_copy_only=False).view(np.uint64)
        root = vk.parent(cells, min_level)
        part = ((root * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
                ).astype(np.int64) % nparts
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        out = _select_cells(
            pa.Table.from_pandas(df.drop(columns=["part"]),
                                 preserve_index=False),
            min_level, max_level, cap)
        return out.to_pandas()

    return (combined.map_batches(add_part, batch_format="pyarrow",
                                 batch_size=None)
            .groupby("part")
            .map_groups(per_group, batch_format="pandas"))


def adaptive_tiling_sql(lat_expr: str, lng_expr: str, min_level: int,
                        max_level: int, cap: int, key: str = "event_id",
                        table: str = "events") -> str:
    """DuckDB twin: recomputes the leaf cell with the pure-SQL S2 kernel
    (functions/cellid_sql.py), per-level ancestor counts as GROUP BYs,
    and the selection rule as one parent join per level."""
    from s2geometry_ray.functions.cellid_sql import cell_id_ctes, parent_sql

    ctes = cell_id_ctes(lat_expr, lng_expr, key=key, table=table)
    parts = []
    for lv in range(min_level, max_level + 1):
        parts.append(f"""
lv{lv} AS (
  SELECT {parent_sql('cell_id', lv)} AS cell,
         CAST(count(*) AS BIGINT) AS n
  FROM cell GROUP BY 1)""")
    sels = [f"""
SELECT cell AS cell_id, CAST({min_level} AS BIGINT) AS level, n AS n_points
FROM lv{min_level}
WHERE n <= {cap} OR {min_level} = {max_level}"""]
    for lv in range(min_level + 1, max_level + 1):
        sels.append(f"""
SELECT c.cell AS cell_id, CAST({lv} AS BIGINT) AS level, c.n AS n_points
FROM lv{lv} c JOIN lv{lv - 1} p ON p.cell = {parent_sql('c.cell', lv - 1)}
WHERE p.n > {cap} AND (c.n <= {cap} OR {lv} = {max_level})""")
    return ctes + "," + ",".join(parts) + " UNION ALL ".join(sels)
