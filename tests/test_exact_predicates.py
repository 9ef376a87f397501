"""S21 exact-predicate slow path: ε-degenerate geometries the round-1
fixtures excluded (points within float-rounding distance of loop edges,
exactly-coplanar axis triples).  The float fast path alone cannot decide
these; the Fraction fallback must."""

from __future__ import annotations

import math
from fractions import Fraction as F

import numpy as np
import pytest

from s2geometry_ray.kernels.geometry import (
    K_MAX_DET_ERROR,
    exact_det_sign,
    robust_crossing,
    sign,
)
from s2geometry_ray.kernels.regions import LoopRegion


def _exact_side(a, b, p) -> int:
    """Reference: exact sign of det[a, b, p] via Fractions."""
    return exact_det_sign(tuple(a), tuple(b), tuple(p))


def test_exact_sign_axis_triples():
    ex, ey, ez = (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)
    assert sign(ex, ey, ez) == 1
    assert sign(ey, ex, ez) == -1
    # truly coplanar: three points on the equator
    eq = (math.sqrt(0.5), math.sqrt(0.5), 0.0)
    assert exact_det_sign(ex, ey, eq) == 0
    assert sign(ex, ey, eq) == 0


def test_sign_decides_inside_rounding_band():
    """Points displaced off a great circle by far less than the float
    det error bound: sign() must match the exact Fraction reference."""
    rng = np.random.default_rng(5)
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    for k in range(200):
        t = rng.uniform(0.1, 0.9)
        base = a * math.cos(t) + b * math.sin(t)  # near the a-b circle
        delta = rng.choice([-1.0, 1.0]) * 10.0 ** rng.uniform(-18, -14)
        p = base + np.array([0.0, 0.0, delta])
        p = tuple(p / np.linalg.norm(p))
        got = sign(tuple(a), tuple(b), p)
        want = _exact_side(a, b, p)
        assert got == want, (k, delta, got, want)


def test_robust_crossing_degenerate_contacts():
    ex, ey, ez = (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)
    mid = tuple(np.array([1.0, 1.0, 0.0]) / math.sqrt(2))
    # proper crossing still detected
    p = tuple(np.array([1.0, 1.0, 1.0]) / math.sqrt(3))
    q = tuple(np.array([1.0, 1.0, -1.0]) / math.sqrt(3))
    assert robust_crossing(p, q, ex, ey)
    # shared vertex → strict policy: no crossing
    assert not robust_crossing(ex, ez, ex, ey)
    # endpoint exactly ON the other arc (det exactly 0) → no crossing
    assert not robust_crossing(mid, ez, ex, ey)
    # arcs that merely touch at a tangent-ish sliver below the float band
    eps_pt = np.array([mid[0], mid[1], 1e-17])
    eps_pt = tuple(eps_pt / np.linalg.norm(eps_pt))
    want = _exact_side(np.array(ex), np.array(ey), np.array(eps_pt))
    got = robust_crossing(eps_pt, ez, ex, ey)
    # crossing iff the perturbed endpoint is strictly BELOW the a-b circle
    assert got == (want < 0)


def test_loop_pip_sliver_points_match_exact_reference():
    """Vectorized crossing-parity containment with points displaced
    1e-18..1e-15 rad off a loop edge must classify by the TRUE side
    (cross-checked per point against the Fraction determinant)."""
    loop = LoopRegion.from_latlng_degrees(
        [(10.0, 10.0), (10.0, 20.0), (20.0, 20.0), (20.0, 10.0)])
    a = loop.vertices[0]
    b = loop.vertices[1]
    n = np.cross(a, b)
    n = n / np.linalg.norm(n)  # normal; interior is on one fixed side
    # a point safely inside tells us which normal direction is interior
    inside_probe = np.array(
        [math.cos(math.radians(15)) * math.cos(math.radians(15)),
         math.cos(math.radians(15)) * math.sin(math.radians(15)),
         math.sin(math.radians(15))])
    interior_sign = np.sign(float(n @ inside_probe))
    rng = np.random.default_rng(11)
    pts, want = [], []
    for _ in range(150):
        t = rng.uniform(0.15, 0.85)
        base = a * (1 - t) + b * t
        base = base / np.linalg.norm(base)
        delta = rng.choice([-1.0, 1.0]) * 10.0 ** rng.uniform(-18, -15)
        p = base + delta * n
        p = p / np.linalg.norm(p)
        s = _exact_side(a, b, p)
        if s == 0:
            continue  # landed exactly on the circle after normalize
        pts.append(p)
        want.append(s == interior_sign)
    got = loop.contains_points(np.asarray(pts))
    mismatches = int(np.sum(got != np.asarray(want)))
    assert mismatches == 0, f"{mismatches}/{len(pts)} sliver points misclassified"


def test_loop_pip_far_points_unaffected():
    """The exact fallback must not change classification of ordinary
    points (regression guard on the fast path)."""
    loop = LoopRegion.from_latlng_degrees(
        [(10.0, 10.0), (10.0, 20.0), (20.0, 20.0), (20.0, 10.0)])
    rng = np.random.default_rng(3)
    lat = rng.uniform(-60, 60, 2000)
    lng = rng.uniform(-180, 180, 2000)
    phi, th = np.radians(lat), np.radians(lng)
    pts = np.stack([np.cos(phi) * np.cos(th), np.cos(phi) * np.sin(th),
                    np.sin(phi)], axis=1)
    got = loop.contains_points(pts)
    # rectangle-ish loop: compare against lat/lng box membership away
    # from edges (1e-6 deg margin keeps the comparison unambiguous)
    margin = 1e-6
    clear = ((np.abs(lat - 10) > margin) & (np.abs(lat - 20) > margin)
             & (np.abs(lng - 10) > margin) & (np.abs(lng - 20) > margin))
    approx = (lat > 10) & (lat < 20) & (lng > 10) & (lng < 20)
    agree = got[clear] == approx[clear]
    # geodesic edges bow relative to the lat/lng box; only assert on
    # points far from the boundary band
    far = clear & ((np.minimum.reduce([np.abs(lat - 10), np.abs(lat - 20),
                                       np.abs(lng - 10), np.abs(lng - 20)]) > 0.5)
                   | (~((lat > 9) & (lat < 21) & (lng > 9) & (lng < 21))))
    assert (got[far] == approx[far]).all()


class TestSymbolicPerturbation:
    """S21 symbolic perturbation: never-zero, antisymmetric, cyclic,
    and agreeing with the exact sign wherever that sign is nonzero."""

    def test_agrees_with_exact_when_nonzero(self):
        from s2geometry_ray.kernels.geometry import (exact_det_sign,
                                                     symbolic_sign)
        rng = np.random.default_rng(5)
        for _ in range(200):
            a, b, c = rng.normal(size=(3, 3))
            a, b, c = (tuple(v / np.linalg.norm(v)) for v in (a, b, c))
            e = exact_det_sign(a, b, c)
            if e != 0:
                assert symbolic_sign(a, b, c) == e

    def test_never_zero_on_degenerate(self):
        from s2geometry_ray.kernels.geometry import symbolic_sign
        s3 = 1.0 / np.sqrt(3.0)
        cases = [
            # collinear on the equator (det exactly 0)
            ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (-1.0, 0.0, 0.0)),
            # c on the arc through a,b (coplanar with origin)
            ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0),
             (np.sqrt(0.5), np.sqrt(0.5), 0.0)),
            # shared-coordinate slivers
            ((s3, s3, s3), (s3, s3, -s3), (s3, s3, 0.0)),
            ((0.0, 0.0, 1.0), (0.0, 1.0, 0.0), (0.0, np.sqrt(0.5), np.sqrt(0.5))),
        ]
        for a, b, c in cases:
            s = symbolic_sign(a, b, c)
            assert s in (-1, 1), (a, b, c, s)

    def test_antisymmetric_and_cyclic(self):
        from s2geometry_ray.kernels.geometry import symbolic_sign
        rng = np.random.default_rng(9)
        cases = [((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (-1.0, 0.0, 0.0)),
                 ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                  (np.sqrt(0.5), np.sqrt(0.5), 0.0))]
        for _ in range(50):
            v = rng.normal(size=(3, 3))
            cases.append(tuple(tuple(r / np.linalg.norm(r)) for r in v))
        for a, b, c in cases:
            s = symbolic_sign(a, b, c)
            assert symbolic_sign(b, c, a) == s          # cyclic
            assert symbolic_sign(c, b, a) == -s         # swap
            assert symbolic_sign(a, c, b) == -s

    def test_sign_perturb_flag(self):
        from s2geometry_ray.kernels.geometry import sign
        a, b, c = (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (-1.0, 0.0, 0.0)
        assert sign(a, b, c) == 0                      # documented policy
        assert sign(a, b, c, perturb=True) in (-1, 1)  # S21 complete

    def test_identical_points_raise(self):
        import pytest
        from s2geometry_ray.kernels.geometry import symbolic_sign
        p = (1.0, 0.0, 0.0)
        with pytest.raises(ValueError):
            symbolic_sign(p, p, (0.0, 1.0, 0.0))


class TestPerturbedCrossing:
    """S22 with perturbation (verdict r3 task 5): exactly-degenerate arc
    contacts resolve to a well-defined crossing parity."""

    # quarter arc on the equator (z = 0 plane): exact coordinates
    A = (1.0, 0.0, 0.0)
    B = (0.0, 1.0, 0.0)
    # point EXACTLY on the equator plane, strictly inside arc AB's span
    S = float(np.sqrt(0.5))

    def test_endpoint_on_arc_parity(self):
        """An arc ENDING exactly on AB crosses on exactly one of its two
        continuations (up vs down) under perturbation; default mode
        keeps the strict-crossing False for both."""
        from s2geometry_ray.kernels.geometry import robust_crossing
        v = (self.S, self.S, 0.0)
        up = (0.5, 0.5, 0.7)
        down = (0.5, 0.5, -0.7)
        assert not robust_crossing(self.A, self.B, v, up)
        assert not robust_crossing(self.A, self.B, v, down)
        r_up = robust_crossing(self.A, self.B, v, up, perturb=True)
        r_down = robust_crossing(self.A, self.B, v, down, perturb=True)
        assert r_up != r_down  # exactly one side crosses

    def test_chain_through_point_crosses_once(self):
        """A 2-segment chain c→v→d passing exactly THROUGH a point v on
        AB crosses exactly once when c,d are on opposite sides, and an
        even number of times when on the same side."""
        from s2geometry_ray.kernels.geometry import robust_crossing
        v = (self.S, self.S, 0.0)
        up = (0.5, 0.5, 0.7)
        down = (0.5, 0.5, -0.7)
        n = sum([robust_crossing(self.A, self.B, up, v, perturb=True),
                 robust_crossing(self.A, self.B, v, down, perturb=True)])
        assert n == 1, n
        up2 = (0.55, 0.45, 0.7)
        n_same = sum([robust_crossing(self.A, self.B, up, v, perturb=True),
                      robust_crossing(self.A, self.B, v, up2, perturb=True)])
        assert n_same in (0, 2), n_same

    def test_shared_vertex_stays_false(self):
        """Arcs sharing a vertex return False in BOTH modes (vertex
        crossings are positional in the overlay, per the docstring)."""
        from s2geometry_ray.kernels.geometry import robust_crossing
        c = (0.0, 0.0, 1.0)
        assert not robust_crossing(self.A, self.B, self.A, c)
        assert not robust_crossing(self.A, self.B, self.A, c, perturb=True)

    def test_nondegenerate_unchanged(self):
        """perturb must not change any non-degenerate answer."""
        from s2geometry_ray.kernels.geometry import robust_crossing
        rng = np.random.default_rng(11)
        for _ in range(200):
            a, b, c, d = (tuple(v / np.linalg.norm(v))
                          for v in rng.normal(size=(4, 3)))
            assert robust_crossing(a, b, c, d) == \
                robust_crossing(a, b, c, d, perturb=True)


def test_overlay_vertex_through_edge_both_modes():
    """Overlay with an EXACTLY-degenerate contact: B has a vertex lying
    exactly on A's edge plane (z=0).  Union/intersection/difference
    membership must match the boolean of inputs in BOTH the default
    strict-crossing mode and the perturbed mode (gate-compatible)."""
    from s2geometry_ray.kernels.polygon_build import (
        loop_difference, loop_intersection, loop_union, loops_to_polygon)
    from s2geometry_ray.kernels.regions import LoopRegion

    s = float(np.sqrt(0.5))
    # A: spherical square straddling the equator (z = 0 plane edge-free:
    # its edges are meridian-ish arcs and two z=const arcs — use raw xyz)
    A = LoopRegion(np.array([
        [0.9, -0.3, -0.3], [0.9, 0.3, -0.3], [0.9, 0.3, 0.3],
        [0.9, -0.3, 0.3]]) / np.linalg.norm([0.9, 0.3, 0.3]))
    # B: triangle with one vertex EXACTLY on A's bottom edge plane
    # (the plane through (0.9,-0.3,-0.3),(0.9,0.3,-0.3) and the origin)
    # pick the midpoint direction of that edge, exactly coplanar:
    vmid = np.array([0.9, 0.0, -0.3])
    vmid = vmid / np.linalg.norm(vmid)
    B = LoopRegion(np.stack([
        vmid,
        np.array([0.9, -0.12, -0.55]) / np.linalg.norm([0.9, -0.12, -0.55]),
        np.array([0.9, 0.12, -0.55]) / np.linalg.norm([0.9, 0.12, -0.55]),
    ]))
    rng = np.random.default_rng(21)
    v = rng.normal(size=(5000, 3))
    pts = v / np.linalg.norm(v, axis=1, keepdims=True)
    ina = A.contains_points(pts)
    inb = B.contains_points(pts)
    # exclude points near either boundary (classification contract)
    margin = np.ones(len(pts), dtype=bool)
    for loop in (A, B):
        vv = loop.vertices
        for k in range(len(vv)):
            p0, p1 = vv[k], vv[(k + 1) % len(vv)]
            n = np.cross(p0, p1)
            n = n / np.linalg.norm(n)
            margin &= np.abs(pts @ n) > 2e-3
    for perturb in (False, True):
        for op, ref in ((loop_union, ina | inb),
                        (loop_intersection, ina & inb),
                        (loop_difference, ina & ~inb)):
            res = loops_to_polygon(op(A, B, perturb=perturb))
            got = (np.zeros(len(pts), dtype=bool) if res is None
                   else res.contains_points(pts))
            agree = (got[margin] == ref[margin]).mean()
            assert agree == 1.0, (op.__name__, perturb, agree)
