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


def test_collinear_overlap_is_correct():
    """Same-meridian rects (collinear overlapping boundary runs) — the
    round-2 general-position restriction is lifted: overlay results must
    be CORRECT, not merely non-crashing."""
    rng = np.random.default_rng(6)
    A = _sq(-20, -10, 0, 10)
    B = _sq(-12, -2, 0, 10)  # shares both meridian lines with A
    _check(loop_union, np.logical_or, A, B, rng)
    _check(loop_intersection, np.logical_and, A, B, rng)
    _check(loop_difference, lambda a, b: a & ~b, A, B, rng)


def test_shared_edge_rects():
    """Rects sharing one full edge: union is the combined rect,
    intersection is empty (measure zero), difference is A."""
    rng = np.random.default_rng(7)
    A = _sq(0, 10, 0, 10)
    B = _sq(0, 10, 10, 20)
    u = _check(loop_union, np.logical_or, A, B, rng)
    assert u is not None
    res_i = loops_to_polygon(loop_intersection(A, B))
    if res_i is not None:  # a seam-only sliver would be area ~0
        pts = _sample(rng)
        assert not res_i.contains_points(pts).any()
    _check(loop_difference, lambda a, b: a & ~b, A, B, rng)


def test_shared_edge_subrect_difference():
    """Removing an aligned sub-rect that shares an edge with its parent:
    A \\ B must be the remaining strip (three shared boundary lines)."""
    rng = np.random.default_rng(8)
    A = _sq(0, 10, 0, 10)
    B = _sq(0, 10, 5, 10)
    d = _check(loop_difference, lambda a, b: a & ~b, A, B, rng)
    assert d is not None
    _check(loop_union, np.logical_or, A, B, rng)
    _check(loop_intersection, np.logical_and, A, B, rng)


def test_corner_touching_rects():
    """Rects sharing ONLY a corner vertex (measure-zero contact): the
    lateral-offset classification handles vertex tangency without
    symbolic perturbation — union keeps both, intersection is empty."""
    rng = np.random.default_rng(13)
    A = _sq(0, 10, 0, 10)
    B = _sq(-10, 0, -10, 0)
    _check(loop_union, np.logical_or, A, B, rng)
    res_i = loops_to_polygon(loop_intersection(A, B))
    if res_i is not None:
        assert not res_i.contains_points(_sample(rng)).any()
    _check(loop_difference, lambda a, b: a & ~b, A, B, rng)


def test_identical_rects():
    """A == B: union and intersection are A; difference is empty."""
    rng = np.random.default_rng(9)
    A = _sq(0, 15, 0, 15)
    B = _sq(0, 15, 0, 15)
    _check(loop_union, np.logical_or, A, B, rng)
    _check(loop_intersection, np.logical_and, A, B, rng)
    res_d = loops_to_polygon(loop_difference(A, B))
    if res_d is not None:
        pts = _sample(rng)
        assert not res_d.contains_points(pts).any()


def test_triangle_overlay():
    rng = np.random.default_rng(5)
    A = LoopRegion.from_latlng_degrees([(0, 0), (0, 25), (22, 12)])
    B = LoopRegion.from_latlng_degrees([(10, -5), (10, 20), (30, 8)])
    _check(loop_union, np.logical_or, A, B, rng)
    _check(loop_intersection, np.logical_and, A, B, rng)
    _check(loop_difference, lambda a, b: a & ~b, A, B, rng)


def _star(rng, clat, clng, rmin=4.0, rmax=16.0, nv=None):
    """Random star-shaped (hence simple) loop around (clat, clng):
    sorted angles + jittered radii, CCW."""
    nv = nv or int(rng.integers(5, 11))
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    # keep angular gaps away from degenerate near-collinear spacing
    while np.min(np.diff(np.append(ang, ang[0] + 2 * np.pi))) < 0.08:
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    r = rng.uniform(rmin, rmax, nv)
    pts = [(clat + ri * np.sin(a), clng + ri * np.cos(a))
           for a, ri in zip(ang, r)]
    return LoopRegion.from_latlng_degrees(pts)


@pytest.mark.parametrize("seed", range(6))
def test_random_star_polygon_overlay_sweep(seed):
    """Randomized widening of the crafted overlay fixtures (round-5
    backlog): random star polygons with random overlap offsets, all
    three boolean ops checked by membership parity away from
    boundaries."""
    rng = np.random.default_rng(100 + seed)
    A = _star(rng, 0.0, 0.0)
    # offset B from fully-overlapping to barely-touching to disjoint
    off = float(rng.uniform(0, 28))
    B = _star(rng, off * 0.4, off)
    _check(loop_union, np.logical_or, A, B, rng)
    _check(loop_intersection, np.logical_and, A, B, rng)
    _check(loop_difference, lambda a, b: a & ~b, A, B, rng)
    _check(loop_difference, lambda a, b: a & ~b, B, A, rng)
