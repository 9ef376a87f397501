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
