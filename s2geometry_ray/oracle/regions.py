"""Scalar region-containment oracle — independent algorithms.

Used by the pytest oracle to brute-force point-in-region joins
(SURVEY.md §6.2.2 "join output == brute-force O(N·T) PIP").  The
implementations deliberately differ from the engine's:

- loop PIP here = stereographic projection from a FIXED center (the
  antipode of the loop centroid) + planar even-odd ray casting,
  parity-anchored by an interior witness — vs the engine's great-circle
  crossing parity;
- cap here compares the exact angle, vs the engine's chord test;
- rect here compares degrees directly.
"""

from __future__ import annotations

import math

from s2geometry_ray.oracle import s2 as _s2


def cap_contains(center_xyz, radius_rad: float, p_xyz) -> bool:
    return _s2.angle(center_xyz, p_xyz) <= radius_rad


def rect_contains(lat_lo: float, lat_hi: float, lng_lo: float, lng_hi: float,
                  lat: float, lng: float) -> bool:
    if not (lat_lo <= lat <= lat_hi):
        return False
    if lng_lo <= lng_hi:
        return lng_lo <= lng <= lng_hi
    return lng >= lng_lo or lng <= lng_hi  # wraps ±180


def _norm3(v):
    n = math.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
    return (v[0] / n, v[1] / n, v[2] / n)


def _basis_at(p):
    """Orthonormal basis (e1, e2, p)."""
    up = (1.0, 0.0, 0.0) if abs(p[0]) < 0.9 else (0.0, 1.0, 0.0)
    e1 = _norm3((
        up[1] * p[2] - up[2] * p[1],
        up[2] * p[0] - up[0] * p[2],
        up[0] * p[1] - up[1] * p[0],
    ))
    e2 = (
        p[1] * e1[2] - p[2] * e1[1],
        p[2] * e1[0] - p[0] * e1[2],
        p[0] * e1[1] - p[1] * e1[0],
    )
    return e1, e2, p


def _project(basis_center, basis, q) -> tuple[float, float]:
    """Stereographic projection of q from the antipode of basis_center."""
    del basis_center
    e1, e2, e3 = basis
    qx = q[0] * e1[0] + q[1] * e1[1] + q[2] * e1[2]
    qy = q[0] * e2[0] + q[1] * e2[1] + q[2] * e2[2]
    qz = q[0] * e3[0] + q[1] * e3[1] + q[2] * e3[2]
    denom = 1.0 + qz
    if abs(denom) < 1e-12:
        denom = 1e-12
    return (qx / denom, qy / denom)


def _ray_cast(poly2d, origin) -> int:
    """Crossings of the +x ray from ``origin`` with the closed polyline."""
    ox, oy = origin
    crossings = 0
    m = len(poly2d)
    for k in range(m):
        x1, y1 = poly2d[k]
        x2, y2 = poly2d[(k + 1) % m]
        if (y1 > oy) != (y2 > oy):
            xc = x1 + (oy - y1) * (x2 - x1) / (y2 - y1)
            if xc > ox:
                crossings += 1
    return crossings


def _interior_witness(vertices_xyz):
    """Midpoint of edge 0 nudged to the interior (left-of-travel) side."""
    a, b = vertices_xyz[0], vertices_xyz[1]
    mid = _norm3(tuple((a[i] + b[i]) / 2 for i in range(3)))
    dot_bm = sum(b[j] * mid[j] for j in range(3))
    t = _norm3(tuple(b[i] - mid[i] * dot_bm for i in range(3)))
    left = (
        mid[1] * t[2] - mid[2] * t[1],
        mid[2] * t[0] - mid[0] * t[2],
        mid[0] * t[1] - mid[1] * t[0],
    )
    # nudge must exceed the chord-subdivision error of the projected
    # polygon (~(step)^2/8) while staying far below loop feature size
    return _norm3(tuple(mid[i] + 1e-4 * left[i] for i in range(3)))


def _projected_loop(vertices_xyz, basis):
    """Chord-subdivided projection of the loop's edges (arcs are far from
    the projection antipode by construction, so distortion is bounded)."""
    pts2d = []
    nv = len(vertices_xyz)
    for k in range(nv):
        a = vertices_xyz[k]
        b = vertices_xyz[(k + 1) % nv]
        steps = max(2, int(_s2.angle(tuple(a), tuple(b)) / 0.002) + 1)
        for s in range(steps):
            t = s / steps
            q = _norm3(tuple(a[i] * (1 - t) + b[i] * t for i in range(3)))
            pts2d.append(_project(None, basis, q))
    return pts2d


def loop_contains(vertices_xyz, p_xyz) -> bool:
    """Planar even-odd test in a stereographic chart centered on the loop
    centroid (projection FROM its antipode, which stays far from every
    edge).  Parity is anchored by an interior witness, so the method is
    orientation-correct for complement (reversed) loops too."""
    centroid = _norm3(tuple(
        sum(v[i] for v in vertices_xyz) for i in range(3)))
    basis = _basis_at(centroid)
    poly2d = _projected_loop(vertices_xyz, basis)
    w = _interior_witness(vertices_xyz)
    pw = _project(None, basis, w)
    parity_w = _ray_cast(poly2d, pw) % 2
    pp = _project(None, basis, p_xyz)
    parity_p = _ray_cast(poly2d, pp) % 2
    return parity_p == parity_w
