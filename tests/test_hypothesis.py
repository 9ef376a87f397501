"""Hypothesis property tests over the core S2 invariants: arbitrary
float inputs (poles, dateline, subnormals) must keep the dual
implementations in bit-exact agreement and preserve the Hilbert
invariants the engine rests on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from s2geometry_ray.kernels import cellid as vk
from s2geometry_ray.oracle import s2 as o

lat_st = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
lng_st = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
level_st = st.integers(min_value=0, max_value=30)


@settings(max_examples=300, deadline=None)
@given(lat_st, lng_st)
def test_dual_implementation_agreement(lat, lng):
    sca = o.from_lat_lng(lat, lng)
    vec = int(vk.from_latlng(np.array([lat]), np.array([lng]))[0])
    assert sca == vec
    assert o.is_valid(sca) and o.is_leaf(sca)


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st, level_st)
def test_parent_range_token_invariants(lat, lng, level):
    leaf = o.from_lat_lng(lat, lng)
    p = o.parent(leaf, level)
    assert o.level(p) == level
    assert o.range_min(p) <= leaf <= o.range_max(p)
    assert o.from_token(o.token(p)) == p
    # vectorized agreement
    assert int(vk.parent(np.array([leaf], dtype=np.uint64), level)[0]) == p
    # ancestors nest
    if level > 0:
        gp = o.parent(leaf, level - 1)
        assert o.contains(gp, p)
        assert o.range_min(gp) <= o.range_min(p)
        assert o.range_max(gp) >= o.range_max(p)


@settings(max_examples=150, deadline=None)
@given(lat_st, lng_st)
def test_center_roundtrip_property(lat, lng):
    leaf = o.from_lat_lng(lat, lng)
    assert o.from_point(*o.to_point(leaf)) == leaf


@settings(max_examples=150, deadline=None)
@given(lat_st, lng_st, st.integers(min_value=1, max_value=29))
def test_neighbor_properties(lat, lng, level):
    cid = o.parent(o.from_lat_lng(lat, lng), level)
    nbrs = o.edge_neighbors(cid)
    assert len(nbrs) == 4
    for n in nbrs:
        assert n != cid
        assert o.level(n) == level
        assert o.is_valid(n)
        assert cid in o.edge_neighbors(n)  # symmetry


@settings(max_examples=100, deadline=None)
@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_st_uv_bijection(s):
    u = o.st_to_uv(s)
    assert -1.0 <= u <= 1.0
    assert abs(o.uv_to_st(u) - s) < 1e-14
    assert float(vk.st_to_uv(np.array([s]))[0]) == u


# --- polygon boolean properties (round 2) ---------------------------------


@settings(max_examples=40, deadline=None)
@given(st.floats(-30, 30), st.floats(-60, 60), st.floats(4, 14),
       st.floats(-8, 8), st.floats(-8, 8), st.integers(0, 2**32 - 1))
def test_polygon_boolean_membership_property(lat0, lng0, size, dlat, dlng, seed):
    """Union/intersection membership equals the boolean of input
    memberships for random overlapping convex quads (sampled points a
    safe distance from both boundaries)."""
    from s2geometry_ray.kernels.polygon_build import (
        loop_intersection, loop_union, loops_to_polygon)
    from s2geometry_ray.kernels.regions import LoopRegion

    def quad(la, ln, s):
        return LoopRegion.from_latlng_degrees(
            [(la, ln), (la, ln + s), (la + s, ln + s), (la + s, ln)])

    A = quad(lat0, lng0, size)
    B = quad(lat0 + dlat + 0.37, lng0 + dlng + 0.73, size * 0.9)
    rng = np.random.default_rng(seed)
    lat = lat0 + rng.uniform(-1.5, 1.5, 600) * size
    lng = lng0 + rng.uniform(-1.5, 1.5, 600) * size
    phi, th = np.radians(lat), np.radians(lng)
    pts = np.stack([np.cos(phi) * np.cos(th), np.cos(phi) * np.sin(th),
                    np.sin(phi)], axis=1)
    margin = np.ones(len(pts), dtype=bool)
    for loop in (A, B):
        v = loop.vertices
        for k in range(len(v)):
            n = np.cross(v[k], v[(k + 1) % len(v)])
            n = n / np.linalg.norm(n)
            margin &= np.abs(pts @ n) > 5e-4
    ina, inb = A.contains_points(pts), B.contains_points(pts)
    for fn, op in ((loop_union, np.logical_or),
                   (loop_intersection, np.logical_and)):
        res = loops_to_polygon(fn(A, B))
        got = (np.zeros(len(pts), dtype=bool) if res is None
               else res.contains_points(pts))
        want = op(ina, inb)
        assert (got[margin] == want[margin]).all()


@settings(max_examples=30, deadline=None)
@given(st.floats(-35, 35), st.floats(-70, 70), st.integers(0, 2**32 - 1))
def test_polygon_boolean_random_star_shapes(lat0, lng0, seed):
    """Round-3 TODO: overlay membership algebra under random NON-axis-
    aligned simple loops (angle-sorted star shapes with random radii —
    arbitrary edge orientations), including difference."""
    from s2geometry_ray.kernels.polygon_build import (
        loop_difference, loop_intersection, loop_union, loops_to_polygon)
    from s2geometry_ray.kernels.regions import LoopRegion

    rng = np.random.default_rng(seed)

    def star(la, ln, r):
        # one vertex per angular sector, jittered INSIDE its sector:
        # angles strictly increasing and covering the full circle, so
        # the center is interior and the angle-sorted polygon is simple.
        # (A plain uniform draw can put every angle in one half-plane —
        # center outside the hull — where angular sort does NOT imply
        # simplicity; that generated self-intersecting fixtures, which
        # the overlay's simple-loop contract excludes.)
        k = int(rng.integers(5, 9))
        step = 2 * np.pi / k
        ang = (np.arange(k) + rng.uniform(0.15, 0.85, k)) * step
        rad = r * rng.uniform(0.55, 1.0, k)
        lat = la + rad * np.sin(ang)
        lng = ln + rad * np.cos(ang) / np.cos(np.radians(la))
        return LoopRegion.from_latlng_degrees(list(zip(lat, lng)))

    size = float(rng.uniform(5, 12))
    A = star(lat0, lng0, size)
    B = star(lat0 + rng.uniform(-0.6, 0.6) * size,
             lng0 + rng.uniform(-0.6, 0.6) * size, size * 0.85)
    lat = lat0 + rng.uniform(-1.8, 1.8, 600) * size
    lng = lng0 + rng.uniform(-1.8, 1.8, 600) * size
    phi, th = np.radians(lat), np.radians(lng)
    pts = np.stack([np.cos(phi) * np.cos(th), np.cos(phi) * np.sin(th),
                    np.sin(phi)], axis=1)
    margin = np.ones(len(pts), dtype=bool)
    for loop in (A, B):
        v = loop.vertices
        for k in range(len(v)):
            n = np.cross(v[k], v[(k + 1) % len(v)])
            n = n / np.linalg.norm(n)
            margin &= np.abs(pts @ n) > 5e-4
    ina, inb = A.contains_points(pts), B.contains_points(pts)
    for fn, op in ((loop_union, np.logical_or),
                   (loop_intersection, np.logical_and),
                   (loop_difference, lambda a, b: a & ~b)):
        res = loops_to_polygon(fn(A, B))
        got = (np.zeros(len(pts), dtype=bool) if res is None
               else res.contains_points(pts))
        want = op(ina, inb)
        assert (got[margin] == want[margin]).all()


@settings(max_examples=200, deadline=None)
@given(st.floats(-30, 30), st.floats(-60, 60), st.floats(4, 10),
       st.sampled_from([0.0, 1e-15, 1e-13, 1e-7]),
       st.integers(0, 3), st.booleans(), st.integers(0, 2**32 - 1))
def test_polygon_boolean_shared_vertex_jitter(lat0, lng0, size, eps,
                                              shared_idx, perturb, seed):
    """Verdict r3 task 8: overlay membership algebra when B SHARES a
    vertex of A — exactly (eps=0: the degenerate-contact path, strict
    policy and symbolic perturbation both), jittered below the builder
    snap radius (1e-15/1e-13: float triage fails over to exact
    arithmetic, sliver snaps away), or jittered above _CLASSIFY_EPS
    (1e-7: a real feature).  The band AROUND _CLASSIFY_EPS (≈1e-9) is
    outside the overlay's documented feature-size contract and is
    deliberately not generated.  Runs with perturb False AND True."""
    from s2geometry_ray.kernels.polygon_build import (
        loop_difference, loop_intersection, loop_union, loops_to_polygon)
    from s2geometry_ray.kernels.regions import LoopRegion

    def quad(la, ln, s):
        return LoopRegion.from_latlng_degrees(
            [(la, ln), (la, ln + s), (la + s, ln + s), (la + s, ln)])

    A = quad(lat0, lng0, size)
    rng = np.random.default_rng(seed)
    # B: a quad one of whose vertices is A's vertex `shared_idx`
    # (ε-jittered in xyz), the rest offset outward so the loops overlap
    # transversally elsewhere
    av = A.vertices[shared_idx].copy()
    if eps:
        av = av + rng.normal(0.0, eps, 3)
        av = av / np.linalg.norm(av)
    s2 = size * 0.8
    blat = lat0 + size * 0.45 + rng.uniform(-0.2, 0.2) * size
    blng = lng0 + size * 0.45 + rng.uniform(-0.2, 0.2) * size
    Bq = quad(blat, blng, s2)
    bv = Bq.vertices.copy()
    bv[0] = av
    B = LoopRegion(bv)
    lat = lat0 + rng.uniform(-1.5, 1.5, 400) * size
    lng = lng0 + rng.uniform(-1.5, 1.5, 400) * size
    phi, th = np.radians(lat), np.radians(lng)
    pts = np.stack([np.cos(phi) * np.cos(th), np.cos(phi) * np.sin(th),
                    np.sin(phi)], axis=1)
    margin = np.ones(len(pts), dtype=bool)
    for loop in (A, B):
        v = loop.vertices
        for k in range(len(v)):
            n = np.cross(v[k], v[(k + 1) % len(v)])
            nn = np.linalg.norm(n)
            if nn == 0:
                return  # degenerate B quad (jitter collapsed an edge)
            margin &= np.abs(pts @ (n / nn)) > 5e-4
    ina, inb = A.contains_points(pts), B.contains_points(pts)
    for fn, op in ((loop_union, np.logical_or),
                   (loop_intersection, np.logical_and),
                   (loop_difference, lambda a, b: a & ~b)):
        res = loops_to_polygon(fn(A, B, perturb=perturb))
        got = (np.zeros(len(pts), dtype=bool) if res is None
               else res.contains_points(pts))
        want = op(ina, inb)
        assert (got[margin] == want[margin]).all(), (fn.__name__, eps, perturb)


@settings(max_examples=25, deadline=None)
@given(st.floats(-30, 30), st.floats(-60, 60), st.floats(0.2, 1.2),
       st.floats(-0.6, 0.6), st.floats(0, 2 * np.pi),
       st.integers(0, 2**32 - 1))
def test_polygon_boolean_affine_nonconvex_property(lat0, lng0, scale,
                                                   shear, theta, seed):
    """Round-5-backlog widener: union/intersection/difference membership
    property under random AFFINE maps (rotation · shear · anisotropic
    scale, det > 0 so orientation is preserved) of a NON-CONVEX L-shaped
    pair — stresses reflex vertices and sheared near-degenerate edges
    that the convex-quad and star generators cannot produce."""
    from s2geometry_ray.kernels.polygon_build import (
        loop_difference, loop_intersection, loop_union, loops_to_polygon)
    from s2geometry_ray.kernels.regions import LoopRegion

    rng = np.random.default_rng(seed)
    L = np.array([(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)],
                 dtype=float)

    def make(xy, la, ln, sx, sy, sh, th):
        rot = np.array([[np.cos(th), -np.sin(th)],
                        [np.sin(th), np.cos(th)]])
        m = rot @ np.array([[1.0, sh], [0.0, 1.0]]) @ np.diag([sx, sy])
        p = xy @ m.T  # det = sx·sy > 0 → stays CCW-simple
        return LoopRegion.from_latlng_degrees(
            [(la + y, ln + x) for x, y in p])

    A = make(L, lat0, lng0, scale, scale * rng.uniform(0.5, 1.5),
             shear, theta)
    B = make(L, lat0 + rng.uniform(-0.8, 0.8) * scale,
             lng0 + rng.uniform(-0.8, 0.8) * scale,
             scale * rng.uniform(0.4, 1.1), scale * rng.uniform(0.4, 1.1),
             rng.uniform(-0.5, 0.5), rng.uniform(0, 2 * np.pi))

    lat = lat0 + rng.uniform(-3.5, 3.5, 700) * scale
    lng = lng0 + rng.uniform(-3.5, 3.5, 700) * scale
    phi, th_ = np.radians(lat), np.radians(lng)
    pts = np.stack([np.cos(phi) * np.cos(th_), np.cos(phi) * np.sin(th_),
                    np.sin(phi)], axis=1)
    margin = np.ones(len(pts), dtype=bool)
    for loop in (A, B):
        v = loop.vertices
        for k in range(len(v)):
            n = np.cross(v[k], v[(k + 1) % len(v)])
            n = n / np.linalg.norm(n)
            margin &= np.abs(pts @ n) > 5e-4
    ina, inb = A.contains_points(pts), B.contains_points(pts)
    for fn, want in ((loop_union, ina | inb),
                     (loop_intersection, ina & inb),
                     (loop_difference, ina & ~inb)):
        res = loops_to_polygon(fn(A, B))
        got = (np.zeros(len(pts), dtype=bool) if res is None
               else res.contains_points(pts))
        assert (got[margin] == want[margin]).all()


# ---------------------------------------------------------------------------
# O50 adaptive tiling selection rule (pure kernel, no Ray): random point
# clouds with random level windows — the selected cells are always a
# disjoint total partition of the points, and counts respect the cap
# except exactly at max_level.
# ---------------------------------------------------------------------------

from hypothesis import strategies as _st


@settings(max_examples=40, deadline=None)
@given(_st.integers(0, 2 ** 32 - 1), _st.integers(0, 4),
       _st.integers(0, 4), _st.integers(2, 40))
def test_adaptive_selection_is_always_a_partition(seed, min_l, span, cap):
    import pyarrow as pa

    from s2geometry_ray.kernels import cellid as vk
    from s2geometry_ray.stages.adaptive_tiling import _select_cells

    max_l = min_l + span
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 400))
    # mix of clustered and uniform points
    lat = np.concatenate([rng.uniform(-85, 85, n // 2 + 1),
                          10.0 + rng.uniform(-0.5, 0.5, n - n // 2 - 1)])
    lng = np.concatenate([rng.uniform(-180, 180, n // 2 + 1),
                          20.0 + rng.uniform(-0.5, 0.5, n - n // 2 - 1)])
    cid = vk.from_latlng(lat, lng)
    # complete multi-level counts table (what the combine produces)
    anc = np.concatenate([vk.parent(cid, lv)
                          for lv in range(min_l, max_l + 1)])
    cells, counts = np.unique(anc, return_counts=True)
    out = _select_cells(pa.table({
        "cell_bits": pa.array(cells.view(np.int64)),
        "n": pa.array(counts.astype(np.int64)),
    }), min_l, max_l, cap)
    sel = out["cell_id"].to_numpy(zero_copy_only=False)
    ns = out["n_points"].to_numpy(zero_copy_only=False)
    lvl = out["level"].to_numpy(zero_copy_only=False)
    assert ns.sum() == cid.size
    lo, hi = vk.range_min(sel), vk.range_max(sel)
    order = np.argsort(lo)
    assert np.all(hi[order][:-1] < lo[order][1:])
    idx = np.searchsorted(lo[order], cid, side="right") - 1
    assert np.all((idx >= 0) & (cid <= hi[order][np.maximum(idx, 0)]))
    over = ns > cap
    assert np.all(lvl[over] == max_l)


@settings(max_examples=25, deadline=None)
@given(_st.integers(0, 2 ** 32 - 1))
def test_covering_overlap_small_side_matches_brute(seed):
    """O57 probe kernel (pure, no Ray): random caps × rects — the
    per-tile contiguous-run searchsorted overlap equals a brute O(A·B)
    range intersection, and every sum fits the int64 guard."""
    from s2geometry_ray.kernels.regions import CapRegion, RectRegion
    from s2geometry_ray.stages.covering_overlap import (_small_side,
                                                        exploded_covering)

    rng = np.random.default_rng(seed)
    rects = []
    for k in range(int(rng.integers(1, 4))):
        lo = float(rng.uniform(-80, 60))
        llo = float(rng.uniform(-170, 150))
        rects.append((k, RectRegion.from_degrees(
            lo, lo + float(rng.uniform(1, 25)),
            llo, llo + float(rng.uniform(1, 25)))))
    caps = [(k, CapRegion.from_latlng_radius(
        float(rng.uniform(-70, 70)), float(rng.uniform(-170, 170)),
        float(np.radians(rng.uniform(1, 12))))) for k in range(2)]
    ka, _c, la, ha = exploded_covering(caps)
    side_b = _small_side(rects, 64, 14)
    got: dict[tuple, int] = {}
    for kb, lo_b, hi_b in side_b:
        i0 = np.searchsorted(hi_b, la, side="left")
        i1 = np.searchsorted(lo_b, ha, side="right")
        for i in range(ka.size):
            for j in range(int(i0[i]), int(i1[i])):
                ov = int(min(ha[i], hi_b[j])) - int(max(la[i], lo_b[j])) + 1
                assert ov > 0
                key = (int(ka[i]), kb)
                got[key] = got.get(key, 0) + ov
    exp: dict[tuple, int] = {}
    for kb, lo_b, hi_b in side_b:
        for i in range(ka.size):
            for j in range(lo_b.size):
                lo = max(int(la[i]), int(lo_b[j]))
                hi = min(int(ha[i]), int(hi_b[j]))
                if lo <= hi:
                    key = (int(ka[i]), kb)
                    exp[key] = exp.get(key, 0) + (hi - lo + 1)
    assert got == exp
