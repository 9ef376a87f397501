"""Edge index for large loops — the reference family's S2EdgeIndex /
S2ShapeIndex role (round-1 verdict "missing" item 5).

``LoopRegion.contains_points`` tests every query point against EVERY
edge (O(N·V) per batch) — fine for tile-sized loops, quadratic pain
for 100k-vertex coastlines.  ``IndexedLoop`` restores O(N·local) with
the ShapeIndex trick:

1. cover each edge with index cells at a fixed ``level`` by sampling
   along the arc at sub-cell spacing and adding each sample cell plus
   its 8-neighborhood (dense enough that every cell the edge touches
   is included); bucket edge ids by cell;
2. precompute the containment state of every indexed cell's CENTER
   with the plain O(V) parity test — once, at build;
3. a query point classifies as state(center) XOR parity of the SHORT
   arc center→point counted against only the edges bucketed in its
   cell.  S2 cells are spherically convex (4 great-circle edges), so
   the arc stays inside the cell and every edge it can cross is
   bucketed there — the count is complete, not approximate.
4. a point whose cell holds no edges lies in a boundary-free cell →
   uniform state, resolved by a lazily-cached center test: per
   level-8 ancestor when no indexed descendant exists under it, else
   per index cell.

The crossing test is the same robust_crossing (float triage + exact
rational fallback) as the direct path; tests pin IndexedLoop ==
LoopRegion on random, clustered, and near-edge points.
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_ray.kernels import cellid as vk
from s2geometry_ray.kernels.geometry import robust_crossing
from s2geometry_ray.kernels.regions import LoopRegion
from s2geometry_ray.oracle import s2 as _s2


def _cells_of(points: np.ndarray, level: int) -> np.ndarray:
    la, ln = vk.xyz_to_latlng(points)
    return vk.parent(vk.from_latlng(la, ln), level)


class IndexedLoop:
    """Point-containment accelerator wrapping a LoopRegion."""

    def __init__(self, loop: LoopRegion, level: int | None = None):
        self.loop = loop
        v = loop.vertices
        nv = len(v)
        self._edges_a = v
        self._edges_b = np.roll(v, -1, axis=0)
        self._cd = np.cross(self._edges_a, self._edges_b)
        if level is None:
            # pick cell size ≈ mean edge length: few edges AND few
            # sample cells per edge, whatever the loop density
            cr = np.einsum("ij,ij->i", self._edges_a, self._edges_b)
            mean_edge = float(np.mean(np.arccos(np.clip(cr, -1, 1))))
            level = int(np.clip(math.log2((math.pi / 2)
                                          / max(mean_edge, 1e-12)), 4, 18))
        self.level = level
        cell_rad = (math.pi / 2) / (1 << level)  # ~face-edge / 2^level
        buckets: dict[int, list[int]] = {}
        for e in range(nv):
            a, b = self._edges_a[e], self._edges_b[e]
            ang = math.atan2(float(np.linalg.norm(np.cross(a, b))),
                             float(np.dot(a, b)))
            steps = max(1, int(math.ceil(ang / (0.2 * cell_rad))))
            ts = np.linspace(0.0, 1.0, steps + 1)
            pts = a[None, :] * (1 - ts)[:, None] + b[None, :] * ts[:, None]
            pts /= np.linalg.norm(pts, axis=1, keepdims=True)
            sample_cells = np.unique(_cells_of(pts, level))
            cells: set[int] = set()
            for c in sample_cells.tolist():
                cells.add(int(c))
                cells.update(int(x) for x in _s2.all_neighbors(int(c), level))
            for c in cells:
                buckets.setdefault(c, []).append(e)
        self._buckets = {c: np.asarray(es, dtype=np.int64)
                         for c, es in buckets.items()}
        cells_arr = np.fromiter(self._buckets, dtype=np.uint64,
                                count=len(self._buckets))
        centers = vk.to_center_xyz(cells_arr)
        states = loop.contains_points(centers)
        self._center_state = dict(zip(cells_arr.tolist(), states.tolist()))
        self._centers = {int(c): centers[i]
                         for i, c in enumerate(cells_arr.tolist())}
        self._coarse_level = min(8, level)
        self._coarse_have = {int(x) for x in
                             vk.parent(cells_arr, self._coarse_level).tolist()}
        self._empty_state: dict[int, bool] = {}
        # (point, edge) crossing tests performed — lets tests assert the
        # indexed path is sublinear in V (direct path would be N·V)
        self.edges_tested = 0

    def contains_points(self, xyz: np.ndarray) -> np.ndarray:
        from s2geometry_ray.kernels.geometry import K_MAX_DET_ERROR

        p = np.asarray(xyz, dtype=np.float64)
        cells = _cells_of(p, self.level)
        out = np.empty(len(p), dtype=bool)
        uniq, inv = np.unique(cells, return_inverse=True)
        # resolve boundary-free cells in ONE vectorized batch: one cache
        # key per level cell (or its level-8 ancestor when that whole
        # subtree is unindexed)
        empty_keys: list[int] = []
        empty_sel: list[np.ndarray] = []
        for u_idx, c in enumerate(uniq.tolist()):
            c = int(c)
            sel = np.nonzero(inv == u_idx)[0]
            edges = self._buckets.get(c)
            if edges is None:
                c8 = int(vk.parent(np.array([c], dtype=np.uint64),
                                   self._coarse_level)[0])
                empty_keys.append(c if c8 in self._coarse_have else c8)
                empty_sel.append(sel)
                continue
            # vectorized short-arc parity: witness = this cell's center,
            # same crossing algebra as LoopRegion.contains_points but
            # restricted to the locally-bucketed edges
            ctr = self._centers[c]
            self.edges_tested += len(edges) * sel.size
            ea = self._edges_a[edges]
            eb = self._edges_b[edges]
            cd = self._cd[edges]
            pts = p[sel]
            ab = np.cross(np.broadcast_to(ctr, pts.shape), pts)
            acb = -(ab @ ea.T)
            bda = ab @ eb.T
            cbd = -(pts @ cd.T)
            dac = cd @ ctr
            crossing = (acb * bda > 0) & (acb * cbd > 0) & (acb * dac[None, :] > 0)
            eps = K_MAX_DET_ERROR
            suspect = ((np.abs(acb) <= eps) | (np.abs(bda) <= eps)
                       | (np.abs(cbd) <= eps) | (np.abs(dac)[None, :] <= eps))
            if suspect.any():
                for n_, e_ in zip(*np.nonzero(suspect)):
                    crossing[n_, e_] = robust_crossing(
                        tuple(ctr), tuple(pts[n_]),
                        tuple(ea[e_]), tuple(eb[e_]))
            parity = crossing.sum(axis=1) & 1
            out[sel] = bool(self._center_state[c]) ^ (parity == 1)
        if empty_keys:
            need = [k for k in set(empty_keys) if k not in self._empty_state]
            if need:
                ctrs = vk.to_center_xyz(np.asarray(need, dtype=np.uint64))
                states = self.loop.contains_points(ctrs)
                self._empty_state.update(zip(need, states.tolist()))
            for k, sel in zip(empty_keys, empty_sel):
                out[sel] = self._empty_state[k]
        return out
