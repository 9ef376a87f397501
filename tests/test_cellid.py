"""Dual-implementation cross-check: vectorized kernels vs scalar oracle.

Re-expresses the reference's S2CellId unit/property tests (SURVEY.md
§6.1: round-trips, tokens, neighbors, containment, 200k-random-leaf
style inverse tests) as the pytest oracle demanded by BASELINE.json:6.
"""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_ray.kernels import cellid as vk
from s2geometry_ray.oracle import s2 as o

N_RANDOM = 50_000


@pytest.fixture(scope="module")
def random_latlng():
    rng = np.random.default_rng(1234)
    lat = rng.uniform(-90.0, 90.0, N_RANDOM)
    lng = rng.uniform(-180.0, 180.0, N_RANDOM)
    return lat, lng


@pytest.fixture(scope="module")
def leaf_ids(random_latlng):
    return vk.from_latlng(*random_latlng)


# --- anchor cases: face centers, poles, meridian, level boundaries --------

ANCHORS = [
    # (lat, lng, expected face)
    (0.0, 0.0, 0),
    (0.0, 90.0, 1),
    (90.0, 0.0, 2),
    (0.0, 180.0, 3),
    (0.0, -90.0, 4),
    (-90.0, 0.0, 5),
    (10.0, 80.0, 1),
    (-35.0, 179.999999, 3),
    (89.999999, 12.0, 2),
]


def test_anchor_faces():
    for lat, lng, face in ANCHORS:
        cid = o.from_lat_lng(lat, lng)
        assert cid >> 61 == face, (lat, lng)
        assert o.is_valid(cid) and o.is_leaf(cid)


def test_anchor_vectorized_equals_oracle():
    lat = np.array([a[0] for a in ANCHORS])
    lng = np.array([a[1] for a in ANCHORS])
    vec = vk.from_latlng(lat, lng)
    sca = np.array([o.from_lat_lng(a, b) for a, b, _ in ANCHORS], dtype=np.uint64)
    assert np.array_equal(vec, sca)


# --- randomized cross-checks ---------------------------------------------


def test_from_latlng_matches_oracle(random_latlng, leaf_ids):
    lat, lng = random_latlng
    sca = np.array(
        [o.from_lat_lng(float(a), float(b)) for a, b in zip(lat[:2000], lng[:2000])],
        dtype=np.uint64,
    )
    assert np.array_equal(leaf_ids[:2000], sca)


def test_fused_kernel_bit_exact(random_latlng):
    """from_latlng_fused (streaming where-chain + 64k cache blocks) must
    be bit-identical to the unfused from_xyz(latlng_to_xyz(...)) path,
    including across its internal chunk boundary."""
    lat, lng = random_latlng
    n = 70_000  # > one 65536-row internal block
    lat = np.resize(lat, n)
    lng = np.resize(lng, n)
    want = vk.from_xyz(vk.latlng_to_xyz(lat, lng))
    assert np.array_equal(vk.from_latlng_fused(lat, lng), want)
    # poles, equator, face corners
    lat2 = np.array([90.0, -90.0, 0.0, 45.0, -45.0, 35.26438968, -35.26438968, 0.0])
    lng2 = np.array([0.0, 13.0, 45.0, 90.0, -135.0, 45.0, -45.0, 180.0])
    assert np.array_equal(vk.from_latlng_fused(lat2, lng2),
                          vk.from_xyz(vk.latlng_to_xyz(lat2, lng2)))


def test_decode_encode_roundtrip(leaf_ids):
    f, i, j, _ = vk.to_face_ij_orientation(leaf_ids)
    assert np.array_equal(vk.from_face_ij(f, i, j), leaf_ids)


def test_decode_matches_oracle(leaf_ids):
    f, i, j, orient = vk.to_face_ij_orientation(leaf_ids[:500])
    for k in range(500):
        fo, io, jo, oo = o.to_face_ij_orientation(int(leaf_ids[k]))
        assert (fo, io, jo, oo) == (int(f[k]), int(i[k]), int(j[k]), int(orient[k]))


def test_center_roundtrip(leaf_ids):
    """fromPoint(toPoint(id)) == id for leaf cells (the family's testInverse)."""
    ctr = vk.to_center_xyz(leaf_ids[:5000])
    assert np.array_equal(vk.from_xyz(ctr), leaf_ids[:5000])


def test_center_matches_oracle(leaf_ids):
    ctr = vk.to_center_xyz(leaf_ids[:300])
    for k in range(300):
        assert tuple(ctr[k]) == o.to_point(int(leaf_ids[k]))


@pytest.mark.parametrize("level", [0, 1, 5, 12, 29, 30])
def test_parent_level_range(leaf_ids, level):
    p = vk.parent(leaf_ids, level)
    assert np.all(vk.level(p) == level)
    assert np.all(vk.is_valid(p))
    sca = np.array([o.parent(int(c), level) for c in leaf_ids[:500]], dtype=np.uint64)
    assert np.array_equal(p[:500], sca)
    # every leaf is inside its parent's range
    assert np.all(vk.contains(p, leaf_ids))
    rm, rx = vk.range_min(p), vk.range_max(p)
    sca_rm = np.array([o.range_min(int(c)) for c in p[:500]], dtype=np.uint64)
    sca_rx = np.array([o.range_max(int(c)) for c in p[:500]], dtype=np.uint64)
    assert np.array_equal(rm[:500], sca_rm)
    assert np.array_equal(rx[:500], sca_rx)


def test_parent_child_inverse():
    rng = np.random.default_rng(5)
    ids = vk.from_latlng(rng.uniform(-90, 90, 200), rng.uniform(-180, 180, 200))
    for c in ids[:100]:
        cid = int(c)
        for lvl in (3, 10, 20):
            p = o.parent(cid, lvl)
            kids = o.children(p)
            assert len(set(kids)) == 4
            assert all(o.parent(k, lvl) == p for k in kids)
            assert o.child_begin(p, lvl + 1) == min(kids)
            assert o.next_cell(kids[0]) == kids[1]
            assert o.prev_cell(kids[3]) == kids[2]


def test_hilbert_range_contiguity(leaf_ids):
    """Descendant ids of a cell form the contiguous range [range_min, range_max]
    — the invariant the whole join design rests on (SURVEY.md §2.1)."""
    p8 = vk.parent(leaf_ids, 8)
    rm, rx = vk.range_min(p8), vk.range_max(p8)
    assert np.all((rm <= leaf_ids) & (leaf_ids <= rx))
    # a cell NOT under the parent must be outside the range
    other = vk.parent(leaf_ids, 8) != p8[0]
    assert not np.any((leaf_ids[other] >= rm[0]) & (leaf_ids[other] <= rx[0]))


def test_token_roundtrip(leaf_ids):
    toks = vk.token(leaf_ids[:2000])
    for k in range(2000):
        cid = int(leaf_ids[k])
        assert toks[k] == o.token(cid)
        assert o.from_token(toks[k]) == cid
    # parents have short tokens
    p4 = vk.parent(leaf_ids[:50], 4)
    for t, c in zip(vk.token(p4), p4):
        assert o.from_token(t) == int(c)
        assert len(t) <= 3


def test_edge_neighbors_match_oracle(leaf_ids):
    for level in (1, 4, 10, 30):
        ids = vk.parent(leaf_ids[:400], level) if level < 30 else leaf_ids[:400]
        nb_vec = vk.edge_neighbors(ids)
        nb_sca = np.array([o.edge_neighbors(int(c)) for c in ids], dtype=np.uint64)
        assert np.array_equal(nb_vec, nb_sca), level
        # neighbors are valid, same level, and mutually adjacent
        assert np.all(vk.is_valid(nb_vec.ravel()))
        assert np.all(vk.level(nb_vec.ravel()) == level)


def test_neighbor_symmetry():
    rng = np.random.default_rng(9)
    ids = vk.parent(vk.from_latlng(rng.uniform(-90, 90, 50), rng.uniform(-180, 180, 50)), 6)
    for c in ids:
        cid = int(c)
        for nbr in o.edge_neighbors(cid):
            assert cid in o.edge_neighbors(nbr)


def test_all_neighbors_is_8ring():
    rng = np.random.default_rng(11)
    ids = vk.parent(vk.from_latlng(rng.uniform(-80, 80, 30), rng.uniform(-180, 180, 30)), 8)
    for c in ids:
        cid = int(c)
        ring = set(o.all_neighbors(cid, 8))
        assert cid not in ring
        assert set(o.edge_neighbors(cid)) <= ring
        assert len(ring) == 8  # interior (non-face-corner) cells have exactly 8


def test_vertex_neighbors():
    rng = np.random.default_rng(13)
    ids = vk.from_latlng(rng.uniform(-80, 80, 30), rng.uniform(-180, 180, 30))
    for c in ids:
        vn = o.vertex_neighbors(int(c), 10)
        assert len(vn) in (3, 4)
        assert o.parent(int(c), 10) in vn
        assert all(o.level(n) == 10 for n in vn)


def test_contains_intersects_pairwise(leaf_ids):
    a = int(o.parent(int(leaf_ids[0]), 5))
    b = int(o.parent(int(leaf_ids[0]), 12))
    assert o.contains(a, b) and not o.contains(b, a)
    assert o.intersects(a, b) and o.intersects(b, a)
    # siblings do not contain each other
    kids = o.children(a)
    assert not o.contains(kids[0], kids[1])
    assert not o.intersects(kids[0], kids[1])


def test_validity():
    assert not o.is_valid(0)
    assert not o.is_valid(6 << 61)  # face 6
    assert not o.is_valid(1 << 63)  # lsb at odd position... bit 63
    assert o.is_valid((2 << 61) | (1 << 60))
    bad = np.array([0, 6 << 61, 1 << 63], dtype=np.uint64)
    assert not np.any(vk.is_valid(bad))


def test_st_uv_inverse():
    s = np.linspace(0.0, 1.0, 10001)
    u = vk.st_to_uv(s)
    assert np.allclose(vk.uv_to_st(u), s, atol=1e-15)
    assert u.min() >= -1.0 and u.max() <= 1.0
    # oracle agreement, bit-exact
    for sv in (0.0, 0.25, 0.5 - 1e-16, 0.5, 0.75, 1.0):
        assert o.st_to_uv(sv) == float(vk.st_to_uv(np.array([sv]))[0])


def test_latlng_xyz_roundtrip(random_latlng):
    lat, lng = random_latlng
    xyz = vk.latlng_to_xyz(lat[:5000], lng[:5000])
    nla, nln = vk.xyz_to_latlng(xyz)
    assert np.allclose(nla, lat[:5000], atol=1e-12)
    assert np.allclose(nln, lng[:5000], atol=1e-12)
    # oracle bit-equality
    for k in range(200):
        assert tuple(xyz[k]) == o.latlng_to_xyz(float(lat[k]), float(lng[k]))


def test_angle_distance():
    a = vk.latlng_to_xyz(np.array([0.0, 0.0]), np.array([0.0, 0.0]))
    b = vk.latlng_to_xyz(np.array([0.0, 90.0]), np.array([90.0, 0.0]))
    d = vk.angle(a, b)
    assert np.allclose(d, np.pi / 2)
    # tiny angles are stable (atan2 formulation)
    c = vk.latlng_to_xyz(np.array([1e-9]), np.array([0.0]))
    e = vk.latlng_to_xyz(np.array([0.0]), np.array([0.0]))
    assert 0 < vk.angle(c, e)[0] < 1e-10


def test_cell_areas():
    """S19: exact areas sum to the sphere at a fixed level; average-area
    metric matches the mean; child areas sum to the parent."""
    total = sum(o.cell_exact_area((f << 61) | (1 << 60)) for f in range(6))
    assert abs(total - 4 * np.pi) < 1e-9
    cid = o.parent(o.from_lat_lng(37.0, -122.0), 5)
    kid_sum = sum(o.cell_exact_area(k) for k in o.children(cid))
    assert abs(kid_sum - o.cell_exact_area(cid)) < 1e-12
    # average-area metric: mean over all level-2 cells equals the formula
    lvl1 = [c for f in range(6) for c in o.children((f << 61) | (1 << 60))]
    lvl2 = [g for c in lvl1 for g in o.children(c)]
    mean = sum(o.cell_exact_area(c) for c in lvl2) / len(lvl2)
    assert abs(mean - o.cell_average_area(2)) / mean < 1e-12


def test_point_to_arc_distance():
    """S23: matches a dense sampled minimum over the arc."""
    rng = np.random.default_rng(21)
    for _ in range(20):
        a = o.latlng_to_xyz(*rng.uniform(-60, 60, 2))
        b = o.latlng_to_xyz(rng.uniform(-60, 60), rng.uniform(-60, 60))
        p = o.latlng_to_xyz(rng.uniform(-80, 80), rng.uniform(-180, 180))
        got = o.point_to_arc_distance(p, a, b)
        ts = np.linspace(0, 1, 2001)
        pts = np.asarray(a)[None, :] * (1 - ts)[:, None] + np.asarray(b)[None, :] * ts[:, None]
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        sampled = vk.angle(np.broadcast_to(np.asarray(p), pts.shape), pts).min()
        assert got <= sampled + 1e-9
        assert sampled - got < 1e-5  # dense sampling converges to the min


def test_frozen_anchors():
    """Both implementations must reproduce the committed literal anchors
    (tests/anchors.py, frozen at first dual-implementation agreement —
    FIXTURES.md §5). Catches any silent future drift in either path."""
    from tests.anchors import ANCHORS

    lat = np.array([a["lat"] for a in ANCHORS])
    lng = np.array([a["lng"] for a in ANCHORS])
    vec = vk.from_latlng(lat, lng)
    for k, a in enumerate(ANCHORS):
        assert o.from_lat_lng(a["lat"], a["lng"]) == a["cell_id"]
        assert int(vec[k]) == a["cell_id"]
        assert o.token(a["cell_id"]) == a["token"]
        assert o.parent(a["cell_id"], 8) == a["parent8"]
        assert o.parent(a["cell_id"], 12) == a["parent12"]
        assert o.edge_neighbors(a["parent8"]) == a["edge_neighbors8"]
