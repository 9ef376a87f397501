"""S2Polyline beyond distance/projection: interpolation, suffix, and
vertex subsampling (simplification) — SURVEY.md §3.1 S23's remaining
surface (the family exposes these as S2Polyline.interpolate /
getSuffix / subsampleVertices; the buffered-distance half already
lives in regions.PolylineRegion).

All kernels are vectorized numpy over unit xyz vertex arrays; none
touch Ray — pipelines call them inside ``map_batches`` and the gate
oracle calls the same functions driver-side for a recompute pin, so
both sides share one implementation.
"""

from __future__ import annotations

import numpy as np


def _unit(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def arc_lengths(vertices: np.ndarray) -> np.ndarray:
    """(N,3) unit vertices → (N-1,) per-edge angular lengths, radians.

    atan2(‖a×b‖, a·b) — accurate for both tiny and near-π arcs where
    plain arccos of the dot loses bits.
    """
    a = vertices[:-1]
    b = vertices[1:]
    cr = np.cross(a, b)
    return np.arctan2(np.linalg.norm(cr, axis=1), np.einsum("ij,ij->i", a, b))


def total_length(vertices: np.ndarray) -> float:
    return float(arc_lengths(vertices).sum())


def interpolate(vertices: np.ndarray, fractions) -> np.ndarray:
    """Points at the given fractions of the polyline's total length.

    (N,3) unit vertices, fractions scalar or (M,) in [0,1] (clamped) →
    (M,3) unit points.  Fraction 0 is the first vertex, 1 the last;
    within an edge the point follows the great-circle slerp — the
    family's S2Polyline.interpolate contract.
    """
    v = np.asarray(vertices, dtype=np.float64)
    f = np.atleast_1d(np.asarray(fractions, dtype=np.float64))
    seg = arc_lengths(v)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = cum[-1]
    target = np.clip(f, 0.0, 1.0) * total
    # edge k spans [cum[k], cum[k+1]); right-edge targets clamp to last
    k = np.clip(np.searchsorted(cum, target, side="right") - 1,
                0, len(seg) - 1 if len(seg) else 0)
    if len(seg) == 0:
        return np.repeat(v[:1], len(f), axis=0)
    rem = target - cum[k]
    ang = seg[k]
    a = v[k]
    b = v[k + 1]
    with np.errstate(invalid="ignore"):
        t = np.where(ang > 0, rem / np.where(ang > 0, ang, 1.0), 0.0)
        # slerp numerator; the sin(ang) denominator is a positive scalar
        # per row and cancels in the final normalization
        wa = np.where(ang > 0, np.sin((1.0 - t) * ang), 1.0 - t)
        wb = np.where(ang > 0, np.sin(t * ang), t)
    return _unit(a * wa[:, None] + b * wb[:, None])


def suffix(vertices: np.ndarray, fraction: float) -> np.ndarray:
    """The polyline from the point at ``fraction`` to the end (the
    family's getSuffix): interpolated split point followed by every
    original vertex strictly after it."""
    v = np.asarray(vertices, dtype=np.float64)
    seg = arc_lengths(v)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = cum[-1]
    target = float(np.clip(fraction, 0.0, 1.0)) * total
    p = interpolate(v, [fraction])[0]
    k = int(np.clip(np.searchsorted(cum, target, side="right") - 1,
                    0, max(len(seg) - 1, 0)))
    rest = v[k + 1:]
    if rest.shape[0] and float(np.linalg.norm(rest[0] - p)) < 1e-15:
        return rest
    return np.concatenate([p[None, :], rest], axis=0)


def project(vertices: np.ndarray, points: np.ndarray):
    """Closest point on the polyline for each query point.

    (N,3) vertices, (M,3) unit points → (closest (M,3), next_vertex
    (M,) int64, dist (M,) radians).  ``next_vertex`` is the index of
    the edge's END vertex, matching the family's S2Polyline.project
    return; clamped projection per edge, min over edges.
    """
    v = np.asarray(vertices, dtype=np.float64)
    p = np.asarray(points, dtype=np.float64)
    a = v[:-1]
    b = v[1:]
    n = np.cross(a, b)
    nn = np.linalg.norm(n, axis=1)
    na = np.cross(n, a)
    nb = np.cross(n, b)
    best_d = np.full(p.shape[0], np.inf)
    best_pt = np.repeat(v[:1], p.shape[0], axis=0)
    best_next = np.zeros(p.shape[0], dtype=np.int64)
    for k in range(a.shape[0]):
        da = np.arccos(np.clip(p @ a[k], -1, 1))
        db = np.arccos(np.clip(p @ b[k], -1, 1))
        end_pt = np.where((da <= db)[:, None], a[k], b[k])
        d = np.minimum(da, db)
        pt = end_pt
        if nn[k] > 0:
            inside = (p @ na[k] > 0) & (p @ nb[k] < 0)
            # foot of the great-circle projection: p minus its normal
            # component, renormalized
            nk = n[k] / nn[k]
            comp = p @ nk
            foot = p - comp[:, None] * nk
            fn = np.linalg.norm(foot, axis=1)
            ok = inside & (fn > 0)
            foot = np.where(ok[:, None], foot / np.where(fn > 0, fn, 1.0)[:, None], pt)
            d_gc = np.arcsin(np.clip(np.abs(comp), -1, 1))
            d = np.where(ok, d_gc, d)
            pt = foot
        better = d < best_d
        best_d = np.where(better, d, best_d)
        best_pt = np.where(better[:, None], pt, best_pt)
        best_next = np.where(better, k + 1, best_next)
    return best_pt, best_next, best_d


def _max_dist_to_arc(mid: np.ndarray, a: np.ndarray, b: np.ndarray) -> float:
    """Max clamped-projection distance of the (K,3) points to arc a→b."""
    if mid.shape[0] == 0:
        return 0.0
    n = np.cross(a, b)
    nn = float(np.linalg.norm(n))
    da = np.arccos(np.clip(mid @ a, -1, 1))
    db = np.arccos(np.clip(mid @ b, -1, 1))
    d = np.minimum(da, db)
    if nn > 0:
        na = np.cross(n, a)
        nb = np.cross(n, b)
        inside = (mid @ na > 0) & (mid @ nb < 0)
        d_gc = np.arcsin(np.clip(np.abs(mid @ (n / nn)), -1, 1))
        d = np.where(inside, d_gc, d)
    return float(d.max())


def subsample_vertices(vertices: np.ndarray, tolerance: float) -> np.ndarray:
    """Indices of a vertex subsequence whose polyline stays within
    ``tolerance`` radians of the original — the family's
    S2Polyline.subsampleVertices greedy scan: keep the current vertex,
    extend the candidate edge to the furthest vertex for which every
    skipped vertex lies within tolerance of the edge, repeat from
    there.  Always keeps the first and last vertex; tolerance ≤ 0
    keeps everything.  Returns int64 indices into ``vertices``."""
    v = np.asarray(vertices, dtype=np.float64)
    nv = v.shape[0]
    if nv <= 2:
        return np.arange(nv, dtype=np.int64)
    if tolerance <= 0:
        return np.arange(nv, dtype=np.int64)
    kept = [0]
    cur = 0
    while cur < nv - 1:
        end = cur + 1
        # greedy: furthest end such that v[cur+1:end] all fit
        for cand in range(cur + 2, nv):
            if _max_dist_to_arc(v[cur + 1:cand], v[cur], v[cand]) <= tolerance:
                end = cand
            else:
                break
        kept.append(end)
        cur = end
    return np.asarray(kept, dtype=np.int64)
