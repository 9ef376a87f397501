"""A5 PolygonBuilder + A6 polygon booleans (SURVEY.md §3.3).

From-scratch spherical polygon overlay in the family's shape:

- ``PolygonBuilder``: collects directed great-circle edges, snaps
  vertices within ``snap_radius``, and assembles closed loops by
  leftmost-turn walking (interior-on-the-left convention) — the
  edge-snap builder the reference exposes as S2PolygonBuilder.
- ``loop_union / loop_intersection / loop_difference``: boundary
  overlay of two simple loops: split each loop's edges at crossings
  with the other loop, keep the sub-edges that lie on the result's
  boundary (classified by midpoint containment), then stitch.
  Difference emits the B-side edges REVERSED so holes come out CW.
- ``loops_to_polygon``: package assembled loops as a PolygonRegion
  (signed spherical excess > 2π ⇒ the loop is a hole; its vertices are
  re-reversed for the hole's LoopRegion).

Collinear / shared-boundary inputs ARE supported (round-2 verdict item
7 lifted the v1 general-position restriction): edges additionally split
at the OTHER loop's vertices lying on them, so overlapping collinear
runs decompose into vertex-aligned sub-edges; each sub-edge is then
classified by the result-membership of points offset ``_CLASSIFY_EPS``
to its LEFT and RIGHT (instead of the on-boundary-ambiguous midpoint),
and emitted in whichever direction keeps the result interior on the
left.  Seam segments (interiors on both sides, or neither) cancel;
same-direction shared segments dedup to one copy in the builder.
Remaining contract: simple loops, arcs shorter than a hemisphere, and
features wider than ``_CLASSIFY_EPS`` (≈6 mm on Earth).  Exactly-
degenerate contacts follow the strict-crossing policy by default;
``perturb=True`` (threaded to :func:`robust_crossing`) resolves them by
symbolic perturbation instead — the reference family's
CrossingSign/ExpensiveSign parity (verdict r3 task 5).

These run per tile-pair inside map_batches at pipeline level (see
pipelines/extras.polygon_overlay_tiles); nothing here touches Ray.
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_ray.kernels.geometry import robust_crossing
from s2geometry_ray.kernels.regions import LoopRegion, PolygonRegion
from s2geometry_ray.oracle.s2 import loop_area


def arc_intersection(a, b, c, d) -> np.ndarray:
    """Intersection point of strictly-crossing arcs AB and CD (unit)."""
    x = np.cross(np.cross(a, b), np.cross(c, d))
    x = x / np.linalg.norm(x)
    # the crossing point lies strictly inside both arcs; ±x — pick the
    # candidate on the same side as both arc midpoints
    if float(np.dot(x, a + b)) < 0:
        x = -x
    return x


class PolygonBuilder:
    """Directed-edge collector with vertex snapping and loop assembly."""

    def __init__(self, snap_radius: float = 1e-12):
        self.snap_radius = snap_radius
        self._verts: list[np.ndarray] = []
        self._grid: dict[tuple, list[int]] = {}
        self._edges: list[tuple[int, int]] = []
        self._edge_set: set[tuple[int, int]] = set()
        self._parent: list[int] = []

    def _find(self, i: int) -> int:
        while self._parent[i] != i:
            self._parent[i] = self._parent[self._parent[i]]
            i = self._parent[i]
        return i

    def _snap(self, p: np.ndarray) -> int:
        """Snap ``p`` to an existing vertex within ``snap_radius``.

        Collects ALL in-radius hits and unions them: a point lying
        within radius of two vertices that are themselves just over the
        radius apart (crossing-point noise around a jitter-shared
        corner) BRIDGES the clusters — first-fit snapping would pick one
        and leave the edge cycle broken at the other."""
        p = np.asarray(p, dtype=np.float64)
        q = tuple(np.floor(p / max(self.snap_radius, 1e-15)).astype(np.int64))
        hits: list[int] = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    for vid in self._grid.get((q[0] + dx, q[1] + dy, q[2] + dz), ()):
                        if float(np.linalg.norm(self._verts[vid] - p)) <= self.snap_radius:
                            hits.append(vid)
        if hits:
            roots = sorted({self._find(v) for v in hits})
            for r in roots[1:]:
                self._parent[r] = roots[0]
            return roots[0]
        vid = len(self._verts)
        self._verts.append(p)
        self._parent.append(vid)
        self._grid.setdefault(q, []).append(vid)
        return vid

    def add_edge(self, a, b) -> None:
        ia, ib = self._snap(a), self._snap(b)
        if ia != ib and (ia, ib) not in self._edge_set:
            # dedup identical directed edges: same-direction shared
            # boundary runs are emitted once per source loop
            self._edge_set.add((ia, ib))
            self._edges.append((ia, ib))

    def merge_vertices(self, a, b) -> None:
        """Identify two points as one site (used to CONTRACT sub-edges
        too short to classify laterally — see _overlay): edges already
        or later recorded against either id resolve to the merged
        representative at assembly."""
        ra, rb = self._find(self._snap(a)), self._find(self._snap(b))
        if ra != rb:
            self._parent[max(ra, rb)] = min(ra, rb)

    def _tangent(self, v: np.ndarray, toward: np.ndarray) -> np.ndarray:
        t = np.cross(np.cross(v, toward), v)
        n = np.linalg.norm(t)
        return t / n if n > 0 else t

    def _merge_sites(self) -> list[tuple[int, int]]:
        """Edges remapped through the union-find: a vertex id recorded
        in an edge may later have been merged into another cluster by a
        bridging snap (see ``_snap``), so assembly resolves every
        endpoint to its final representative; self-loops and duplicates
        produced by the merge are dropped."""
        merged: list[tuple[int, int]] = []
        seen: set[tuple[int, int]] = set()
        for ia, ib in self._edges:
            e = (self._find(ia), self._find(ib))
            if e[0] != e[1] and e not in seen:
                seen.add(e)
                merged.append(e)
        return merged

    def assemble_loops(self) -> list[np.ndarray]:
        """Stitch directed edges into closed loops (leftmost turn at
        multi-degree vertices keeps the interior on the left).

        Inputs must be in general position (no collinear-overlapping
        edges — the reference resolves those by snap rounding + symbolic
        perturbation; v1 policy documented in the module docstring).  A
        walk that dead-ends (degenerate input) abandons its edges
        instead of raising, so callers degrade to partial output."""
        out: dict[int, list[int]] = {}
        for ia, ib in self._merge_sites():
            out.setdefault(ia, []).append(ib)
        loops: list[np.ndarray] = []
        while any(out.values()):
            start = next(k for k, v in out.items() if v)
            path = [start]
            cur = start
            prev = None
            dead = False
            while True:
                cands = out.get(cur)
                if not cands:
                    dead = True  # degenerate input: abandon this walk
                    break
                if prev is None or len(cands) == 1:
                    nxt = cands[0]
                else:
                    # leftmost turn: max CCW angle from the arrival direction
                    v = self._verts[cur]
                    t_in = self._tangent(v, self._verts[prev])  # points BACK
                    best, best_ang = None, -math.inf
                    for w in cands:
                        t_out = self._tangent(v, self._verts[w])
                        ang = math.atan2(float(np.dot(v, np.cross(t_in, t_out))),
                                         float(np.dot(t_in, t_out)))
                        # angle from reversed-arrival; CCW-most = leftmost
                        if ang <= 1e-15:
                            ang += 2 * math.pi
                        if ang > best_ang:
                            best, best_ang = w, ang
                    nxt = best
                cands.remove(nxt)
                prev, cur = cur, nxt
                if cur == start:
                    break
                path.append(cur)
            if not dead and len(path) >= 3:
                loops.append(np.asarray([self._verts[i] for i in path]))
        return loops


# on-edge vertex tolerance (distance to the edge's great circle) and
# lateral classification offset.  _ON_EDGE_EPS bounds snap rounding;
# _CLASSIFY_EPS must exceed it comfortably yet stay far below feature
# size (1e-9 rad ≈ 6 mm on Earth).
_ON_EDGE_EPS = 1e-12
_CLASSIFY_EPS = 1e-9
# minimum EXTENT of an overlay OUTPUT loop (max chord between vertices).
# Near-coincident vertex clusters (inputs touching within ≲1e-6 rad of
# each other, e.g. jitter-shared corners) produce crossing points from
# nearly-parallel edge normals — catastrophic cancellation makes the
# micro-loop's winding unreliable (loop_area cannot tell CCW from CW at
# 1e-7 scale, so a noise loop can masquerade as a whole-sphere shell).
# Loops below this extent are snap-scale noise and are dropped — the
# family's snap-rounding erases sub-snap features the same way.
_MIN_LOOP_EXTENT = 1e-6
# crossing points computed within this distance of an edge ENDPOINT
# clamp onto the endpoint (the family's builder has vertex sites absorb
# nearby crossings).  arc_intersection of edges meeting near a shared /
# jitter-shared vertex carries ~1e-12 cancellation error — more than
# the 1e-12 snap radius can absorb — so without the clamp the cut point
# and the true corner become distinct builder vertices and the boundary
# cycle dead-ends.  1e-10 is ≫ the observed error and still below the
# documented feature-size contract (_CLASSIFY_EPS).
_ENDPOINT_SNAP_EPS = 1e-10
# overlay sub-edges SHORTER than this are contracted (endpoints merged
# as one builder site) instead of classified: the left/right probes sit
# _CLASSIFY_EPS off the edge, so for an edge not much longer than that
# the probes sample containment in the corner cluster the edge lives in
# and the emitted direction is a coin flip — a backwards micro-edge
# orphans the boundary walk.  Contraction displaces the boundary by
# < 1e-7, far below the 1e-6 minimum output feature size.
_MICRO_EDGE_EPS = 1e-7


def _split_edges(A: np.ndarray, B: np.ndarray, perturb: bool = False):
    """Sub-edges of loop A's boundary split at strict crossings with B's
    edges AND at B's vertices lying on the edge (so collinear-overlap
    runs decompose into vertex-aligned sub-edges), in traversal order.
    ``perturb`` resolves exactly-degenerate crossings by symbolic
    perturbation (robust_crossing docstring)."""
    nb = len(B)
    for k in range(len(A)):
        a, b = A[k], A[(k + 1) % len(A)]
        n = np.cross(a, b)
        nn = np.linalg.norm(n)
        cuts = []
        for e in range(nb):
            c, d = B[e], B[(e + 1) % nb]
            if robust_crossing(tuple(a), tuple(b), tuple(c), tuple(d),
                               perturb=perturb):
                x = arc_intersection(a, b, c, d)
                # endpoint absorption: a crossing essentially AT a or b
                # contributes no interior cut (the chain already starts /
                # ends there); keeping the noisy computed point would
                # split off a sub-snap-radius vertex that breaks the cycle
                if (float(np.linalg.norm(x - a)) <= _ENDPOINT_SNAP_EPS
                        or float(np.linalg.norm(x - b)) <= _ENDPOINT_SNAP_EPS):
                    continue
                cuts.append((float(np.dot(x, a)), x))  # larger dot = closer to a
        if nn > 0:
            dot_ab = float(np.dot(a, b))
            for e in range(nb):
                v = B[e]
                # on the edge's great circle, strictly between a and b
                if (abs(float(np.dot(n, v))) <= _ON_EDGE_EPS * nn
                        and float(np.dot(v, a)) > dot_ab + _ON_EDGE_EPS
                        and float(np.dot(v, b)) > dot_ab + _ON_EDGE_EPS
                        and float(np.linalg.norm(v - a)) > _ON_EDGE_EPS
                        and float(np.linalg.norm(v - b)) > _ON_EDGE_EPS):
                    cuts.append((float(np.dot(v, a)), v))
        cuts.sort(key=lambda t: -t[0])
        chain = [a] + [x for _, x in cuts] + [b]
        for i in range(len(chain) - 1):
            yield chain[i], chain[i + 1]


def _overlay(A: LoopRegion, B: LoopRegion, in_result,
             perturb: bool = False) -> list[np.ndarray]:
    """Generic boundary overlay: every sub-edge (from either loop) is
    classified by whether the points offset _CLASSIFY_EPS to its left
    and right are inside the RESULT (``in_result(in_a, in_b)``), and
    emitted in the direction that keeps the result interior on the left.
    Interior edges (both sides in) and seam edges (neither side in, or
    opposite-interior) cancel; this single rule subsumes the former
    per-operation midpoint tests and the difference's reverse_b flag,
    and is well-defined on shared/collinear boundaries where the
    midpoint itself sits ON the other loop."""
    builder = PolygonBuilder()

    def classify(p: np.ndarray, q: np.ndarray) -> None:
        if float(np.linalg.norm(q - p)) < _MICRO_EDGE_EPS:
            builder.merge_vertices(p, q)  # too short to classify: contract
            return
        n = np.cross(p, q)  # points LEFT of p→q
        nn = np.linalg.norm(n)
        if nn == 0:
            return
        n = n / nn
        mid = p + q
        mid = mid / np.linalg.norm(mid)
        ml = mid + _CLASSIFY_EPS * n
        mr = mid - _CLASSIFY_EPS * n
        pts = np.stack([ml / np.linalg.norm(ml), mr / np.linalg.norm(mr)])
        in_a = A.contains_points(pts)
        in_b = B.contains_points(pts)
        left_in = in_result(bool(in_a[0]), bool(in_b[0]))
        right_in = in_result(bool(in_a[1]), bool(in_b[1]))
        if left_in and not right_in:
            builder.add_edge(p, q)
        elif right_in and not left_in:
            builder.add_edge(q, p)

    for p, q in _split_edges(A.vertices, B.vertices, perturb):
        classify(p, q)
    for p, q in _split_edges(B.vertices, A.vertices, perturb):
        classify(p, q)
    loops = builder.assemble_loops()
    return [v for v in loops if _loop_is_feature(v)]


def _loop_is_feature(v: np.ndarray) -> bool:
    """Output-loop noise filter: drop loops below _MIN_LOOP_EXTENT (max
    chord) AND loops whose mean WIDTH (spherical area / extent) is below
    the same threshold.  A jitter-shared corner can emit a genuine but
    sliver-thin intersection loop (extent ~1e-6, width ~1e-7) whose
    width sits UNDER LoopRegion's 1e-7 witness displacement — its
    containment parity then inverts globally and the sliver masquerades
    as a whole-sphere shell.  The family's snap rounding erases
    sub-snap features the same way; both cutoffs are the documented
    minimum feature size."""
    ext = float(np.linalg.norm(v - v[0], axis=1).max())
    if ext < _MIN_LOOP_EXTENT:
        return False
    a = float(loop_area([tuple(p) for p in v]))
    width = min(a, 4 * math.pi - a) / ext
    return width >= _MIN_LOOP_EXTENT


def loop_union(A: LoopRegion, B: LoopRegion,
               perturb: bool = False) -> list[np.ndarray]:
    """Boundary loops of A ∪ B (shells CCW; disjoint inputs → both)."""
    return _overlay(A, B, lambda ia, ib: ia or ib, perturb)


def loop_intersection(A: LoopRegion, B: LoopRegion,
                      perturb: bool = False) -> list[np.ndarray]:
    """Boundary loops of A ∩ B (empty list when disjoint)."""
    return _overlay(A, B, lambda ia, ib: ia and ib, perturb)


def loop_difference(A: LoopRegion, B: LoopRegion,
                    perturb: bool = False) -> list[np.ndarray]:
    """Boundary loops of A \\ B; fully-nested B emerges as a CW hole."""
    return _overlay(A, B, lambda ia, ib: ia and not ib, perturb)


def loops_to_polygon(loops: list[np.ndarray]) -> PolygonRegion | None:
    """Package overlay output as a PolygonRegion: signed area > 2π ⇒ the
    loop is a hole (CW); single-shell-with-holes semantics (the tiles
    schema's representation)."""
    if not loops:
        return None
    shells, holes = [], []
    for v in loops:
        area = loop_area([tuple(p) for p in v])
        if area > 2 * math.pi:
            holes.append(LoopRegion(v[::-1]))  # re-reverse for the hole's disk
        else:
            shells.append(LoopRegion(v))
    if not shells:
        return None
    if len(shells) == 1:
        return PolygonRegion(shells[0], holes)
    # multiple disjoint shells: wrap as shell+siblings via a composite
    return _MultiPolygon(shells, holes)


class _MultiPolygon(PolygonRegion):
    """Union-of-shells minus holes (overlay of disjoint results)."""

    def __init__(self, shells: list[LoopRegion], holes: list[LoopRegion]):
        super().__init__(shells[0], holes)
        self._shells = shells

    def contains_points(self, xyz: np.ndarray) -> np.ndarray:
        inside = np.zeros(len(xyz), dtype=bool)
        for s in self._shells:
            inside |= s.contains_points(xyz)
        for h in self.holes:
            inside &= ~h.contains_points(xyz)
        return inside

    def may_intersect_cell(self, cell_id: int) -> bool:
        if any(s.may_intersect_cell(cell_id) for s in self._shells):
            return not any(h.contains_cell(cell_id) for h in self.holes)
        return False

    def contains_cell(self, cell_id: int) -> bool:
        return any(s.contains_cell(cell_id) for s in self._shells) and \
            all(not h.may_intersect_cell(cell_id) for h in self.holes)
