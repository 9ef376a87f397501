"""S2Polyline surface: interpolate / suffix / project / subsample
(kernels/polyline.py) against scalar references and invariants."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from s2geometry_ray.kernels import polyline as pl
from s2geometry_ray.kernels.regions import PolylineRegion
from s2geometry_ray.oracle import s2 as _s2


def _route(latlngs):
    return np.asarray([_s2.latlng_to_xyz(la, ln) for la, ln in latlngs])


ROUTE = _route([(34.05, -118.24), (36.17, -115.14), (39.53, -119.81),
                (40.76, -111.89), (39.74, -104.99)])


def test_arc_lengths_match_scalar():
    seg = pl.arc_lengths(ROUTE)
    for k in range(len(ROUTE) - 1):
        want = float(np.arccos(np.clip(ROUTE[k] @ ROUTE[k + 1], -1, 1)))
        assert seg[k] == pytest.approx(want, abs=1e-12)
    assert pl.total_length(ROUTE) == pytest.approx(float(seg.sum()))


def test_interpolate_endpoints_and_vertices():
    out = pl.interpolate(ROUTE, [0.0, 1.0])
    np.testing.assert_allclose(out[0], ROUTE[0], atol=1e-15)
    np.testing.assert_allclose(out[1], ROUTE[-1], atol=1e-12)
    # fraction exactly at a cumulative vertex boundary returns the vertex
    seg = pl.arc_lengths(ROUTE)
    cum = np.cumsum(seg)
    f = cum[1] / cum[-1]
    np.testing.assert_allclose(pl.interpolate(ROUTE, [f])[0], ROUTE[2],
                               atol=1e-12)


def test_interpolate_is_on_polyline_and_monotone():
    fr = np.linspace(0, 1, 41)
    pts = pl.interpolate(ROUTE, fr)
    # every interpolated point lies ON the polyline (distance ~0)
    region = PolylineRegion(ROUTE, 1e-9)
    assert region.distance(pts).max() < 1e-12
    # arc-length position is proportional to the fraction
    seg = pl.arc_lengths(ROUTE)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    _, nxt, _ = pl.project(ROUTE, pts)
    pos = []
    for p, k in zip(pts, nxt):
        within = float(np.arccos(np.clip(p @ ROUTE[k - 1], -1, 1)))
        pos.append(cum[k - 1] + within)
    np.testing.assert_allclose(pos, fr * cum[-1], atol=1e-9)


def test_suffix_lengths_add_up():
    for f in (0.0, 0.25, 0.5, 0.9, 1.0):
        suf = pl.suffix(ROUTE, f)
        want = (1.0 - f) * pl.total_length(ROUTE)
        assert pl.total_length(suf) == pytest.approx(want, abs=1e-12)
    # suffix at an interior fraction starts with the interpolated point
    np.testing.assert_allclose(pl.suffix(ROUTE, 0.3)[0],
                               pl.interpolate(ROUTE, [0.3])[0], atol=1e-15)


def test_project_matches_region_distance():
    rng = np.random.default_rng(7)
    lat = rng.uniform(30, 45, 200)
    lng = rng.uniform(-125, -100, 200)
    pts = np.asarray([_s2.latlng_to_xyz(a, b) for a, b in zip(lat, lng)])
    closest, nxt, dist = pl.project(ROUTE, pts)
    region = PolylineRegion(ROUTE, 1.0)
    np.testing.assert_allclose(dist, region.distance(pts), atol=1e-12)
    # the reported closest point realizes the reported distance
    d2 = np.arccos(np.clip(np.einsum("ij,ij->i", pts, closest), -1, 1))
    np.testing.assert_allclose(d2, dist, atol=1e-9)
    assert nxt.min() >= 1 and nxt.max() <= len(ROUTE) - 1


def test_subsample_within_tolerance_and_greedy():
    # a wiggly route: subsampling at tol keeps endpoints and the result
    # stays within tol of every original vertex
    t = np.linspace(0, 1, 40)
    latlngs = [(35 + 3 * np.sin(8 * x) * 0.05, -118 + 14 * x) for x in t]
    v = _route(latlngs)
    for tol in (1e-5, 1e-4, 1e-3):
        idx = pl.subsample_vertices(v, tol)
        assert idx[0] == 0 and idx[-1] == len(v) - 1
        simplified = v[idx]
        region = PolylineRegion(simplified, 1.0)
        assert region.distance(v).max() <= tol + 1e-12
    # tolerance 0 keeps everything; looser tolerance keeps fewer
    assert len(pl.subsample_vertices(v, 0.0)) == len(v)
    n_tight = len(pl.subsample_vertices(v, 1e-5))
    n_loose = len(pl.subsample_vertices(v, 1e-3))
    assert n_loose <= n_tight
    # collinear-ish wiggles actually get dropped at loose tolerance
    assert n_loose < len(v)


def test_subsample_idempotent():
    t = np.linspace(0, 1, 25)
    v = _route([(34 + 2 * np.sin(5 * x), -118 + 10 * x) for x in t])
    idx = pl.subsample_vertices(v, 5e-4)
    again = pl.subsample_vertices(v[idx], 5e-4)
    assert np.array_equal(again, np.arange(len(idx)))


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(4, 20),
       st.sampled_from([1e-6, 1e-4, 1e-2]))
def test_subsample_property(seed, n, tol):
    rng = np.random.default_rng(seed)
    lat = np.cumsum(rng.uniform(-1, 1, n)) * 0.5 + 10
    lng = np.cumsum(rng.uniform(0.1, 1, n)) * 0.5
    v = _route(list(zip(lat, lng)))
    idx = pl.subsample_vertices(v, tol)
    assert idx[0] == 0 and idx[-1] == n - 1
    assert np.all(np.diff(idx) >= 1)
    region = PolylineRegion(v[idx], 1.0)
    assert region.distance(v).max() <= tol + 1e-12
