"""Property tests for regions and the coverer (SURVEY.md §6.2.2):
covering ⊇ region samples, interior covering ⊆ region, normalize
idempotent, PIP consistency."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_ray.kernels import cellid as vk
from s2geometry_ray.kernels.covering import (
    covering_table,
    get_covering,
    get_interior_covering,
    normalize_cell_union,
)
from s2geometry_ray.kernels.geometry import cell_contains_point, cell_latlng_bound
from s2geometry_ray.kernels.regions import CapRegion, LoopRegion, RectRegion
from s2geometry_ray.oracle import s2 as o
from tests.conftest import sample_sphere


def _star_loop(lat0, lng0, base=2.0, amp=1.2, n=9, lobes=4):
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    rad = base + amp * np.cos(lobes * angles)
    return [(lat0 + r * np.sin(a), lng0 + r * np.cos(a)) for a, r in zip(angles, rad)]


REGIONS = [
    ("cap-city", CapRegion.from_latlng_radius(48.85, 2.35, 0.04)),
    ("cap-pole", CapRegion.from_latlng_radius(-89.0, 0.0, 0.05)),
    ("rect-simple", RectRegion.from_degrees(10.0, 20.0, 30.0, 45.0)),
    ("rect-dateline", RectRegion.from_degrees(-30.0, -20.0, 170.0, -160.0)),
    ("rect-pole", RectRegion.from_degrees(84.0, 90.0, -180.0, 180.0)),
    ("rect-sliver", RectRegion.from_degrees(0.0, 0.0001, -10.0, 10.0)),
    ("loop-star", LoopRegion.from_latlng_degrees(_star_loop(40.7, -74.0))),
    ("loop-facecorner", LoopRegion.from_latlng_degrees(
        [(43.0, 43.0), (43.0, 47.0), (47.0, 47.0), (47.0, 43.0)])),
    ("loop-polar", LoopRegion.from_latlng_degrees([(80.0, lng) for lng in range(-180, 180, 45)])),
]


def _point_in_union(cov, xyz):
    """Membership of leaf(xyz) in a NORMALIZED (disjoint) cell union."""
    leaf = vk.from_xyz(xyz)
    rmin = np.array([o.range_min(c) for c in cov], dtype=np.uint64)
    rmax = np.array([o.range_max(c) for c in cov], dtype=np.uint64)
    idx = np.searchsorted(rmin, leaf, side="right") - 1
    ok = idx >= 0
    idx = np.clip(idx, 0, len(cov) - 1)
    return ok & (leaf <= rmax[idx])


@pytest.mark.parametrize("name,region", REGIONS, ids=[r[0] for r in REGIONS])
def test_covering_superset_of_region(name, region, rng):
    cov = get_covering(region, max_cells=32, max_level=16)
    assert 0 < len(cov) <= 32
    assert cov == normalize_cell_union(cov)  # idempotent / already normalized
    assert all(o.is_valid(c) for c in cov)
    pts = sample_sphere(rng, 30_000)
    inside = region.contains_points(pts)
    covered = _point_in_union(cov, pts[inside])
    assert covered.all(), f"{name}: covering misses {np.sum(~covered)} interior points"


@pytest.mark.parametrize("name,region", REGIONS[:7], ids=[r[0] for r in REGIONS[:7]])
def test_interior_covering_subset_of_region(name, region, rng):
    icov = get_interior_covering(region, max_cells=32, max_level=14)
    for c in icov:
        # every vertex and the center of an interior cell must be inside
        pts = np.asarray(o.cell_vertices(c) + [o.to_point(c)])
        assert region.contains_points(pts).all(), f"{name}: interior cell {o.token(c)} leaks"


def test_interior_covering_level_mod():
    region = CapRegion.from_latlng_radius(12.0, 77.0, 0.05)
    for lm in (2, 3):
        icov = get_interior_covering(region, max_cells=24, min_level=4,
                                     max_level=16, level_mod=lm)
        assert icov, "cap is large enough to admit interior cells"
        for c in icov:
            lvl = o.level(c)
            assert lvl >= 4 and (lvl - 4) % lm == 0
            pts = np.asarray(o.cell_vertices(c) + [o.to_point(c)])
            assert region.contains_points(pts).all()


def test_normalize_merges_siblings():
    cid = o.parent(o.from_lat_lng(10.0, 10.0), 8)
    kids = o.children(cid)
    assert normalize_cell_union(kids) == [cid]
    # three siblings do not merge
    assert len(normalize_cell_union(kids[:3])) == 3
    # contained cells are dropped
    deep = o.children(kids[0])[2]
    assert normalize_cell_union(kids + [deep]) == [cid]
    assert normalize_cell_union([kids[0], deep]) == [kids[0]]
    # merge cascades two levels when all 16 grandchildren present
    grand = [g for k in o.children(cid) for g in o.children(k)]
    assert normalize_cell_union(grand) == [cid]


def test_normalize_descendant_before_ancestor():
    """A descendant in the parent's first quadrant sorts BEFORE the parent;
    normalize must still drop it (ADVICE r1: previously kept both)."""
    cid = o.parent(o.from_lat_lng(10.0, 10.0), 8)
    kids = o.children(cid)
    early = o.children(kids[0])[0]  # sorts before cid
    assert int(early) < int(cid)
    assert normalize_cell_union([early, cid]) == [cid]
    # several early descendants + the ancestor
    deep = o.children(o.children(kids[1])[0])[0]
    assert normalize_cell_union([early, deep, cid]) == [cid]
    # invariant: output has no contained pairs, any input order
    out = normalize_cell_union([cid, early, kids[2]])
    for i in range(len(out)):
        for j in range(len(out)):
            if i != j:
                assert not (o.range_min(out[i]) <= out[j] <= o.range_max(out[i]))


def test_covering_max_cells_budgets():
    region = CapRegion.from_latlng_radius(12.0, 77.0, 0.02)
    for mc in (4, 8, 16, 64):
        cov = get_covering(region, max_cells=mc, max_level=18)
        assert len(cov) <= max(mc, 6)


def test_covering_level_bounds():
    region = RectRegion.from_degrees(5.0, 6.0, 5.0, 6.0)
    cov = get_covering(region, max_cells=64, min_level=4, max_level=10)
    assert all(4 <= o.level(c) <= 10 for c in cov)


def test_pip_loop_inversion(rng):
    """Reversing vertex order complements the interior (up to the boundary)."""
    loop = _star_loop(10.0, 10.0)
    fwd = LoopRegion.from_latlng_degrees(loop)
    rev = LoopRegion.from_latlng_degrees(loop[::-1])
    pts = sample_sphere(rng, 20_000)
    a = fwd.contains_points(pts)
    b = rev.contains_points(pts)
    assert np.array_equal(a, ~b)


def test_pip_vertex_rotation(rng):
    loop = _star_loop(-20.0, 120.0)
    base = LoopRegion.from_latlng_degrees(loop)
    rot = LoopRegion.from_latlng_degrees(loop[3:] + loop[:3])
    pts = sample_sphere(rng, 20_000)
    assert np.array_equal(base.contains_points(pts), rot.contains_points(pts))


def test_rect_matches_interval_semantics(rng):
    """Rect containment must agree with plain closed-interval comparisons in
    degree space (this is what makes the SQL oracle comparable)."""
    r = RectRegion.from_degrees(-10.0, 25.0, 40.0, 80.0)
    lat = rng.uniform(-30, 45, 5000)
    lng = rng.uniform(0, 120, 5000)
    got = r.contains_points(vk.latlng_to_xyz(lat, lng))
    want = (lat >= -10.0) & (lat <= 25.0) & (lng >= 40.0) & (lng <= 80.0)
    assert np.array_equal(got, want)


def test_cell_latlng_bound_contains_cell_points(rng):
    ids = vk.parent(vk.from_latlng(rng.uniform(-90, 90, 60), rng.uniform(-180, 180, 60)), 6)
    for c in ids:
        cid = int(c)
        lat_itv, lng_itv = cell_latlng_bound(cid)
        # sample points inside the cell via child centers at +3 levels
        descendants = [cid]
        for _ in range(2):
            descendants = [g for d in descendants for g in o.children(d)]
        for d in descendants:
            x, y, z = o.to_point(d)
            lat = math.asin(max(-1, min(1, z)))
            lng = math.atan2(y, x)
            assert lat_itv.contains(lat), o.token(cid)
            assert lng_itv.contains(lng), o.token(cid)
            assert cell_contains_point(cid, (x, y, z))


def test_covering_table_columns():
    tiles = [("t1", RectRegion.from_degrees(0, 5, 0, 5)),
             ("t2", CapRegion.from_latlng_radius(50.0, 8.0, 0.01))]
    tbl = covering_table(tiles, max_cells=16, max_level=12)
    n = len(tbl["cell_id"])
    assert n > 0
    assert set(tbl["tile_id"]) == {"t1", "t2"}
    assert tbl["range_min"].dtype == np.uint64
    assert np.all(tbl["range_min"] <= tbl["cell_id"])
    assert np.all(tbl["cell_id"] <= tbl["range_max"])
    # interior cells must really be inside their tile
    regions = dict(tiles)
    for k in range(n):
        if tbl["interior"][k]:
            reg = regions[tbl["tile_id"][k]]
            ctr = np.asarray([o.to_point(int(tbl["cell_id"][k]))])
            assert reg.contains_points(ctr)[0]


def test_polygon_with_holes(rng):
    from s2geometry_ray.kernels.regions import PolygonRegion

    shell = [(30.0, 30.0), (30.0, 40.0), (40.0, 40.0), (40.0, 30.0)]  # CCW
    # the hole loop is passed CCW too (its INTERIOR is subtracted)
    hole = [(33.0, 33.0), (36.0, 33.0), (36.0, 36.0), (33.0, 36.0)][::-1]
    poly = PolygonRegion.from_latlng_degrees([shell, hole])
    pts = {
        "in_shell": (38.0, 38.0),
        "in_hole": (34.5, 34.5),
        "outside": (10.0, 10.0),
        "between": (31.0, 34.0),
    }
    import numpy as np

    from s2geometry_ray.kernels import cellid as vk

    xyz = vk.latlng_to_xyz(np.array([p[0] for p in pts.values()]),
                           np.array([p[1] for p in pts.values()]))
    got = poly.contains_points(xyz)
    assert got.tolist() == [True, False, False, True]
    # covering still covers the region; interior flags avoid the hole
    cov = get_covering(poly, max_cells=32, max_level=12)
    sample = sample_sphere(rng, 20000)
    inside = poly.contains_points(sample)
    assert _point_in_union(cov, sample[inside]).all()
    for c in get_interior_covering(poly, max_cells=16, max_level=12):
        probe = np.asarray(o.cell_vertices(c) + [o.to_point(c)])
        assert poly.contains_points(probe).all()


def test_cellunion_set_algebra():
    from s2geometry_ray.kernels.covering import (
        union_contains_id,
        union_difference,
        union_expand,
        union_intersection,
        union_union,
    )

    a_cell = o.parent(o.from_lat_lng(10.0, 10.0), 6)
    b_cell = o.parent(o.from_lat_lng(10.0, 10.0), 8)  # nested inside a
    c_cell = o.parent(o.from_lat_lng(-40.0, 100.0), 6)
    A = normalize_cell_union([a_cell])
    B = normalize_cell_union([b_cell, c_cell])
    U = union_union(A, B)
    assert union_contains_id(U, b_cell) and union_contains_id(U, c_cell)
    assert U == normalize_cell_union([a_cell, c_cell])
    I = union_intersection(A, B)
    assert I == [b_cell]
    D = union_difference(A, B)
    # difference covers A minus b_cell: contains a's other descendants
    assert not union_contains_id(D, b_cell)
    sibling = o.children(o.parent(b_cell, 7))[0]
    if sibling == b_cell:
        sibling = o.children(o.parent(b_cell, 7))[1]
    assert union_contains_id(D, sibling)
    # union of D and [b_cell] reconstitutes A exactly
    assert union_union(D, [b_cell]) == A
    # expand grows the union
    E = union_expand([a_cell], 6)
    assert union_contains_id(E, a_cell)
    assert len(E) > 1


def test_union_intersection_tie_and_symmetry():
    """ADVICE r1: on a range_min tie keep the DEEPER cell; intersection is
    symmetric (parent ∩ first-child == first-child both ways)."""
    from s2geometry_ray.kernels.covering import union_intersection

    face = (2 << 61) | (1 << 60)
    child0 = o.children(face)[0]  # shares range_min with face
    assert o.range_min(face) == o.range_min(child0)
    assert union_intersection([face], [child0]) == [child0]
    assert union_intersection([child0], [face]) == [child0]
    # deeper still: grandchild in quadrant 0
    g0 = o.children(child0)[0]
    assert union_intersection([face], [g0]) == [g0]
    assert union_intersection([g0], [face]) == [g0]


def test_polyline_region(rng):
    from s2geometry_ray.kernels.regions import PolylineRegion

    route = [(40.0, -74.0), (41.0, -73.0), (41.5, -71.0), (42.3, -71.1)]
    r = 0.01  # ~64 km
    region = PolylineRegion.from_latlng_degrees(route, r)
    # distance agrees with the scalar oracle arc distance
    pts = sample_sphere(rng, 2000)
    verts = [o.latlng_to_xyz(a, b) for a, b in route]
    want = np.array([
        min(o.point_to_arc_distance(tuple(p), verts[k], verts[k + 1])
            for k in range(len(verts) - 1))
        for p in pts
    ])
    got = region.distance(pts)
    assert np.allclose(got, want, atol=1e-12)
    # covering covers the buffered region
    cov = get_covering(region, max_cells=64, max_level=14)
    near = []
    for a, b in route:
        for _ in range(300):
            near.append(o.latlng_to_xyz(a + rng.uniform(-1, 1), b + rng.uniform(-1, 1)))
    near = np.asarray(near)
    inside = region.contains_points(near)
    assert inside.any()
    assert _point_in_union(cov, near[inside]).all()
    # interior cells lie fully inside the buffer
    for c in get_interior_covering(region, max_cells=16, max_level=14):
        probe = np.asarray(o.cell_vertices(c) + [o.to_point(c)])
        assert region.contains_points(probe).all()


@pytest.mark.parametrize("level_mod", [2, 3])
def test_covering_level_mod(level_mod, rng):
    region = CapRegion.from_latlng_radius(20.0, 50.0, 0.05)
    min_level, max_level = 4, 14
    cov = get_covering(region, max_cells=48, min_level=min_level,
                       max_level=max_level, level_mod=level_mod)
    assert cov
    for c in cov:
        lvl = o.level(c)
        assert lvl <= max_level
        if lvl >= min_level:
            assert (lvl - min_level) % level_mod == 0, (lvl, level_mod)
    # superset property still holds
    pts = sample_sphere(rng, 30_000)
    inside = region.contains_points(pts)
    # drop-contained output is disjoint → the searchsorted check is valid
    assert _point_in_union(cov, pts[inside]).all()
