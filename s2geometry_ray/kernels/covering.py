"""S2RegionCoverer: approximate a region by a small set of cells.

Best-first refinement over the cell quadtree, matching the family's
algorithm shape (SURVEY.md §3.3 A4): a priority queue of candidate
cells ordered by (level, #intersecting children, #terminal children);
candidates whose children are all terminal collapse to a single cell;
the search stops once expanding would exceed ``max_cells``.  Seeding
uses the 6 face cells — always sound, and cheap because only
intersecting candidates are expanded (tiles here are small; the extra
descent from level 0 costs ≤ max_level·4 predicate calls).

Correctness contract (property-tested in tests/test_covering.py):
- exterior covering ⊇ region (given a sound ``may_intersect_cell``),
- ≤ max(max_cells, 6) cells, levels within [min_level, max_level],
- output is a normalized cell union (sorted, no contained pairs).

The coverer runs per tile; at large tile counts it is executed inside
``map_batches`` over the tiles table (embarrassingly parallel), not on
the driver — see stages/spatial_join.py.
"""

from __future__ import annotations

import heapq
import itertools

import numpy as np

from s2geometry_ray.kernels.regions import Region
from s2geometry_ray.oracle import s2 as _s2


def get_covering(
    region: Region,
    max_cells: int = 8,
    min_level: int = 0,
    max_level: int = 30,
    level_mod: int = 1,
) -> list[int]:
    """Exterior covering of ``region`` as a normalized list of cell ids."""
    del level_mod  # v0 supports level_mod=1 only (documented deviation)
    result: list[int] = []
    pq: list = []
    counter = itertools.count()

    def make_candidate(cell_id: int):
        if not region.may_intersect_cell(cell_id):
            return None
        lvl = _s2.level(cell_id)
        is_terminal = lvl >= max_level or (lvl >= min_level and region.contains_cell(cell_id))
        return [cell_id, is_terminal]

    def add_candidate(cand) -> None:
        if cand is None:
            return
        cell_id, is_terminal = cand
        lvl = _s2.level(cell_id)
        if is_terminal:
            result.append(cell_id)
            return
        children = []
        num_terminals = 0
        for ch in _s2.children(cell_id):
            c = make_candidate(ch)
            if c is not None:
                children.append(c)
                if c[1]:
                    num_terminals += 1
        if not children:
            return
        if num_terminals == 4 and lvl >= min_level:
            # all four children terminal → the parent is effectively terminal
            result.append(cell_id)
            return
        # min-heap: expand lowest level first, then fewest children/terminals
        # (the family uses the same key negated in a max-heap)
        priority = ((lvl << 2) + len(children) << 2) + num_terminals
        heapq.heappush(pq, (priority, next(counter), cell_id, children))

    for face in range(6):
        face_cell = (face << 61) | (1 << 60)
        add_candidate(make_candidate(face_cell))

    while pq:
        _, _, cell_id, children = heapq.heappop(pq)
        lvl = _s2.level(cell_id)
        if lvl < min_level or len(children) == 1 or len(result) + len(pq) + len(children) <= max_cells:
            for c in children:
                add_candidate(c)
        else:
            result.append(cell_id)
    return normalize_cell_union(result)


def get_interior_covering(
    region: Region,
    max_cells: int = 8,
    min_level: int = 0,
    max_level: int = 30,
) -> list[int]:
    """Cells provably inside the region (⊆ region); may be empty."""
    result: list[int] = []
    stack = [(face << 61) | (1 << 60) for face in range(6)]
    while stack and len(result) < max_cells:
        cell_id = stack.pop()
        if not region.may_intersect_cell(cell_id):
            continue
        lvl = _s2.level(cell_id)
        if lvl >= min_level and region.contains_cell(cell_id):
            result.append(cell_id)
        elif lvl < max_level:
            stack.extend(_s2.children(cell_id))
    return normalize_cell_union(result)


def normalize_cell_union(cell_ids) -> list[int]:
    """S2CellUnion.normalize (SURVEY.md §3.3 A1): sort, drop cells contained
    in others, merge any four complete siblings into their parent."""
    ids = sorted(int(c) for c in cell_ids)
    out: list[int] = []
    for cid in ids:
        # drop if contained in the last kept cell
        if out and _s2.range_min(out[-1]) <= cid <= _s2.range_max(out[-1]):
            continue
        # merge complete sibling groups (may cascade)
        while len(out) >= 3 and _are_siblings(out[-3], out[-2], out[-1], cid):
            cid = _s2.parent(cid, _s2.level(cid) - 1)
            out = out[:-3]
        out.append(cid)
    return out


def _are_siblings(a: int, b: int, c: int, d: int) -> bool:
    """True if a,b,c,d are the four children of one parent (a<b<c<d sorted)."""
    if (a ^ b ^ c) != d:
        return False
    lsb_d = d & (~d + 1) & ((1 << 64) - 1)
    if _s2.level(d) == 0:
        return False
    mask = (lsb_d << 1) & ((1 << 64) - 1)
    mask = ~(mask + (mask << 1)) & ((1 << 64) - 1)
    return (d & mask) == (a & mask) and (b & mask) == (a & mask) and (c & mask) == (a & mask) \
        and _s2.level(a) == _s2.level(b) == _s2.level(c) == _s2.level(d)


def covering_table(
    tiles: list[tuple[str, Region]],
    max_cells: int = 64,
    max_level: int = 16,
) -> dict[str, np.ndarray]:
    """Build the exploded covering table (SURVEY.md §2.2) for a list of
    (tile_id, region): columns tile_id, cell_id, range_min, range_max,
    level, interior.  This is the broadcast side of the spatial join."""
    tile_ids: list[str] = []
    cell_ids: list[int] = []
    interiors: list[bool] = []
    for tid, region in tiles:
        for cid in get_covering(region, max_cells=max_cells, max_level=max_level):
            tile_ids.append(tid)
            cell_ids.append(cid)
            interiors.append(region.contains_cell(cid))
    cells = np.asarray(cell_ids, dtype=np.uint64)
    lsb = cells & (~cells + np.uint64(1))
    return {
        "tile_id": np.asarray(tile_ids, dtype=object),
        "cell_id": cells,
        "range_min": cells - (lsb - np.uint64(1)),
        "range_max": cells + (lsb - np.uint64(1)),
        "level": np.asarray([_s2.level(c) for c in cell_ids], dtype=np.int64),
        "interior": np.asarray(interiors, dtype=bool),
    }
