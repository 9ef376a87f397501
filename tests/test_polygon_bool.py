"""A5/A6 polygon-boolean property tests: membership in the overlay
result must equal the boolean of the input memberships for sample
points away from boundaries."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_ray.kernels.polygon_build import (
    PolygonBuilder,
    loop_difference,
    loop_intersection,
    loop_union,
    loops_to_polygon,
)
from s2geometry_ray.kernels.regions import LoopRegion


def _sq(lat0, lat1, lng0, lng1):
    return LoopRegion.from_latlng_degrees(
        [(lat0, lng0), (lat0, lng1), (lat1, lng1), (lat1, lng0)])


def _sample(rng, n=4000):
    lat = rng.uniform(-45, 45, n)
    lng = rng.uniform(-60, 60, n)
    phi, th = np.radians(lat), np.radians(lng)
    return np.stack([np.cos(phi) * np.cos(th), np.cos(phi) * np.sin(th),
                     np.sin(phi)], axis=1)


def _check(op_fn, np_op, A, B, rng, min_agree=1.0):
    res = loops_to_polygon(op_fn(A, B))
    pts = _sample(rng)
    ina = A.contains_points(pts)
    inb = B.contains_points(pts)
    want = np_op(ina, inb)
    got = (np.zeros(len(pts), dtype=bool) if res is None
           else res.contains_points(pts))
    # exclude points within ~0.02 deg of either boundary (midpoint
    # classification is exact; sampling near edges is not the contract)
    margin = np.ones(len(pts), dtype=bool)
    for loop in (A, B):
        v = loop.vertices
        for k in range(len(v)):
            a, b = v[k], v[(k + 1) % len(v)]
            n = np.cross(a, b)
            n = n / np.linalg.norm(n)
            margin &= np.abs(pts @ n) > 4e-4
    agree = np.mean(got[margin] == want[margin])
    assert agree >= min_agree, f"agree={agree:.4f}"
    return res


def test_union_intersection_overlapping_squares():
    rng = np.random.default_rng(2)
    A = _sq(0, 20, 0, 20)
    B = _sq(10, 30, 10, 30)
    u = _check(loop_union, np.logical_or, A, B, rng)
    i = _check(loop_intersection, np.logical_and, A, B, rng)
    d = _check(loop_difference, lambda a, b: a & ~b, A, B, rng)
    assert u is not None and i is not None and d is not None


def test_disjoint_squares():
    rng = np.random.default_rng(3)
    A = _sq(0, 10, 0, 10)
    B = _sq(20, 30, 20, 30)
    _check(loop_union, np.logical_or, A, B, rng)
    res_i = loops_to_polygon(loop_intersection(A, B))
    assert res_i is None  # empty intersection
    _check(loop_difference, lambda a, b: a & ~b, A, B, rng)


def test_nested_squares_difference_has_hole():
    rng = np.random.default_rng(4)
    A = _sq(-20, 20, -20, 20)
    B = _sq(-5, 5, -5, 5)
    u = _check(loop_union, np.logical_or, A, B, rng)
    _check(loop_intersection, np.logical_and, A, B, rng)
    d = _check(loop_difference, lambda a, b: a & ~b, A, B, rng)
    assert len(d.holes) == 1  # B emerges as a hole


def test_builder_snaps_and_closes():
    b = PolygonBuilder(snap_radius=1e-9)
    sq = _sq(0, 10, 0, 10).vertices
    for k in range(len(sq)):
        # perturb endpoints within snap radius; builder must still close
        a = sq[k] + 3e-10
        c = sq[(k + 1) % len(sq)]
        b.add_edge(a / np.linalg.norm(a), c)
    loops = b.assemble_loops()
    assert len(loops) == 1 and len(loops[0]) == 4


def test_collinear_overlap_degrades_gracefully():
    """Same-meridian rects (collinear overlapping edges) are outside the
    v1 general-position contract: the overlay must not crash (dead-end
    walks are abandoned, partial loops returned)."""
    A = _sq(-20, -10, 0, 10)
    B = _sq(-12, -2, 0, 10)  # shares both meridian segments with A
    for fn in (loop_union, loop_intersection, loop_difference):
        loops = fn(A, B)  # no exception is the contract
        for v in loops:
            assert len(v) >= 3


def test_triangle_overlay():
    rng = np.random.default_rng(5)
    A = LoopRegion.from_latlng_degrees([(0, 0), (0, 25), (22, 12)])
    B = LoopRegion.from_latlng_degrees([(10, -5), (10, 20), (30, 8)])
    _check(loop_union, np.logical_or, A, B, rng)
    _check(loop_intersection, np.logical_and, A, B, rng)
    _check(loop_difference, lambda a, b: a & ~b, A, B, rng)
