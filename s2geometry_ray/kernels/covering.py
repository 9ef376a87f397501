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
    """Exterior covering of ``region`` as a normalized list of cell ids.

    ``level_mod`` ∈ {1,2,3}: output cells at levels ≥ min_level sit on
    the (min_level + k·level_mod) grid — candidates below min_level
    descend one level at a time, candidates at/above it descend
    ``level_mod`` levels per expansion (the family's semantics).  With
    level_mod > 1 the sibling-merge normalization is skipped (merging
    would leave the level grid); output is still sorted + containment-
    free.
    """
    if level_mod not in (1, 2, 3):
        raise ValueError("level_mod must be 1, 2 or 3")
    result: list[int] = []
    pq: list = []
    counter = itertools.count()

    def _descend(lvl: int) -> int:
        """Levels to descend from a candidate at ``lvl`` in one step."""
        if lvl < min_level:
            return min(1, max_level - lvl) if lvl < max_level else 0
        return level_mod if lvl + level_mod <= max_level else 0

    def make_candidate(cell_id: int):
        if not region.may_intersect_cell(cell_id):
            return None
        lvl = _s2.level(cell_id)
        on_grid = lvl >= min_level and (lvl - min_level) % level_mod == 0
        is_terminal = (_descend(lvl) == 0) or (on_grid and region.contains_cell(cell_id))
        return [cell_id, is_terminal]

    def _expand(cell_id: int, depth: int) -> list[int]:
        cells = [cell_id]
        for _ in range(depth):
            cells = [g for c in cells for g in _s2.children(c)]
        return cells

    def add_candidate(cand) -> None:
        if cand is None:
            return
        cell_id, is_terminal = cand
        lvl = _s2.level(cell_id)
        if is_terminal:
            result.append(cell_id)
            return
        depth = _descend(lvl)
        children = []
        num_terminals = 0
        for ch in _expand(cell_id, depth):
            c = make_candidate(ch)
            if c is not None:
                children.append(c)
                if c[1]:
                    num_terminals += 1
        if not children:
            return
        if num_terminals == len(children) == 4 ** depth and lvl >= min_level \
                and (lvl - min_level) % level_mod == 0:
            # every child terminal → the (on-grid) parent is terminal
            result.append(cell_id)
            return
        # min-heap: expand lowest level first, then fewest children/terminals
        # (the family uses the same key negated in a max-heap).  Field width
        # must hold up to 4**level_mod children (+1 for the ==4**level_mod
        # edge), so shift by 2*level_mod + 1.
        shift = 2 * level_mod + 1
        priority = (((lvl << shift) + len(children)) << shift) + num_terminals
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
    if level_mod == 1:
        return normalize_cell_union(result)
    # sorted + drop-contained only (merges would break the level grid)
    ids = sorted(result)
    out: list[int] = []
    for cid in ids:
        if out and _s2.range_min(out[-1]) <= cid <= _s2.range_max(out[-1]):
            continue
        cmin = _s2.range_min(cid)
        while out and cmin <= out[-1] <= _s2.range_max(cid):
            out.pop()
        out.append(cid)
    return out


def get_interior_covering(
    region: Region,
    max_cells: int = 8,
    min_level: int = 0,
    max_level: int = 30,
    level_mod: int = 1,
) -> list[int]:
    """Cells provably inside the region (⊆ region); may be empty.

    Best-first: candidates pop shallowest-first so the budget is spent
    on the LARGEST provably-interior cells (a DFS budget would burn
    max_cells on deep cells in one corner).  ``level_mod`` restricts
    emitted cells to the (min_level + k·level_mod) grid, mirroring the
    exterior coverer's semantics."""
    if level_mod not in (1, 2, 3):
        raise ValueError("level_mod must be 1, 2 or 3")
    result: list[int] = []
    pq: list = []
    counter = itertools.count()

    def push(cell_id: int) -> None:
        if region.may_intersect_cell(cell_id):
            heapq.heappush(pq, (_s2.level(cell_id), next(counter), cell_id))

    for face in range(6):
        push((face << 61) | (1 << 60))
    while pq and len(result) < max_cells:
        lvl, _, cell_id = heapq.heappop(pq)
        on_grid = lvl >= min_level and (lvl - min_level) % level_mod == 0
        if on_grid and region.contains_cell(cell_id):
            result.append(cell_id)
        elif lvl < max_level:
            for ch in _s2.children(cell_id):
                push(ch)
    if level_mod == 1:
        return normalize_cell_union(result)
    ids = sorted(result)
    out: list[int] = []
    for cid in ids:
        if out and _s2.range_min(out[-1]) <= cid <= _s2.range_max(out[-1]):
            continue
        cmin = _s2.range_min(cid)
        while out and cmin <= out[-1] <= _s2.range_max(cid):
            out.pop()
        out.append(cid)
    return out


def normalize_cell_union(cell_ids) -> list[int]:
    """S2CellUnion.normalize (SURVEY.md §3.3 A1): sort, drop cells contained
    in others, merge any four complete siblings into their parent."""
    ids = sorted(int(c) for c in cell_ids)
    out: list[int] = []
    for cid in ids:
        # drop if contained in the last kept cell
        if out and _s2.range_min(out[-1]) <= cid <= _s2.range_max(out[-1]):
            continue
        # drop previously-kept cells contained by cid: a descendant in the
        # parent's first quadrants sorts BEFORE the parent, so pop trailing
        # entries that fall inside cid's range (family Normalize semantics)
        cmin = _s2.range_min(cid)
        while out and cmin <= out[-1] <= _s2.range_max(cid):
            out.pop()
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


# ---------------------------------------------------------------------------
# Cell-union set algebra (SURVEY.md §3.3 A2/A3) — sorted-interval merges
# ---------------------------------------------------------------------------


def union_contains_id(union: list[int], cell_id: int) -> bool:
    """R6 on a normalized union: binary search over disjoint ranges."""
    import bisect

    mins = [_s2.range_min(c) for c in union]
    k = bisect.bisect_right(mins, cell_id) - 1
    return k >= 0 and cell_id <= _s2.range_max(union[k])


def union_union(a: list[int], b: list[int]) -> list[int]:
    """Union of two cell unions (normalize of the concatenation)."""
    return normalize_cell_union(list(a) + list(b))


def union_intersection(a: list[int], b: list[int]) -> list[int]:
    """Intersection: for each overlapping pair keep the deeper cell
    (Hilbert ranges nest-or-disjoint, so overlap ⇒ containment)."""
    out = []
    i = j = 0
    while i < len(a) and j < len(b):
        amin, amax = _s2.range_min(a[i]), _s2.range_max(a[i])
        bmin, bmax = _s2.range_min(b[j]), _s2.range_max(b[j])
        if amax < bmin:
            i += 1
        elif bmax < amin:
            j += 1
        else:
            # overlap ⇒ containment (Hilbert ranges nest-or-disjoint): keep
            # the deeper (contained) cell.  On a range_min tie the deeper
            # cell is the one with the smaller range_max.
            if amin > bmin:
                out.append(a[i])
            elif bmin > amin:
                out.append(b[j])
            else:
                out.append(a[i] if amax <= bmax else b[j])
            if amax <= bmax:
                i += 1
            else:
                j += 1
    return normalize_cell_union(out)


def union_difference(a: list[int], b: list[int]) -> list[int]:
    """a \\ b by recursive subdivision of cells that partially overlap b."""
    out: list[int] = []

    def emit(cell: int) -> None:
        cmin, cmax = _s2.range_min(cell), _s2.range_max(cell)
        # fast reject / accept against b
        overlapping = [c for c in b
                       if _s2.range_min(c) <= cmax and _s2.range_max(c) >= cmin]
        if not overlapping:
            out.append(cell)
            return
        if any(_s2.range_min(c) <= cmin and cmax <= _s2.range_max(c)
               for c in overlapping):
            return  # fully covered by b
        for ch in _s2.children(cell):
            emit(ch)

    for cell in a:
        emit(cell)
    return normalize_cell_union(out)


def union_expand(union: list[int], level: int) -> list[int]:
    """A3: buffer a union by adding all neighbors at ``level`` of each
    cell (cells below ``level`` are first promoted to their parent)."""
    grown = []
    for c in union:
        base = _s2.parent(c, level) if _s2.level(c) > level else c
        grown.append(base)
        grown.extend(_s2.all_neighbors(base, max(level, _s2.level(base))))
    return normalize_cell_union(grown)
