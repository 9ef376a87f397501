"""Spatial join vs brute-force O(N·T) PIP oracle (SURVEY.md §6.2.3).

The engine side runs the production path — covering table → probe →
interior accept / boundary exact test — driver-side via CoveringIndex
(the Ray stage wraps the identical kernel; the Ray wiring itself is
covered by test_entry/test_stages_ray).  The oracle side is the
independent scalar implementations in oracle/regions.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_ray.kernels import cellid as vk
from s2geometry_ray.kernels.regions import CapRegion, LoopRegion, RectRegion
from s2geometry_ray.oracle import regions as OR
from s2geometry_ray.oracle import s2 as o
from s2geometry_ray.sources.synth import derive_latlng
from s2geometry_ray.stages.spatial_join import CoveringIndex


def _star(lat0, lng0, base=2.0, amp=1.2, n=9):
    a = np.linspace(0, 2 * np.pi, n, endpoint=False)
    r = base + amp * np.cos(4 * a)
    return [(lat0 + rr * np.sin(aa), lng0 + rr * np.cos(aa)) for aa, rr in zip(a, r)]


TILES = [
    ("rect0", RectRegion.from_degrees(38.0, 43.0, -76.0, -70.0)),
    ("rect-dateline", RectRegion.from_degrees(-35.0, -25.0, 175.0, -178.0)),
    ("rect-pole", RectRegion.from_degrees(86.0, 90.0, -180.0, 180.0)),
    ("rect-sliver", RectRegion.from_degrees(40.0, 40.0001, -80.0, -60.0)),
    ("cap0", CapRegion.from_latlng_radius(48.85, 2.35, 0.03)),
    ("cap1", CapRegion.from_latlng_radius(-33.9, 151.2, 0.05)),
    ("loop-star", LoopRegion.from_latlng_degrees(_star(40.7, -74.0))),
    ("loop-facecorner", LoopRegion.from_latlng_degrees(
        [(43.0, 43.0), (43.0, 47.0), (47.0, 47.0), (47.0, 43.0)])),
    ("loop-polar", LoopRegion.from_latlng_degrees(
        [(80.0, lng) for lng in range(-180, 180, 45)])),
]

CAP_PARAMS = {
    "cap0": ((48.85, 2.35), 0.03),
    "cap1": ((-33.9, 151.2), 0.05),
}


@pytest.fixture(scope="module")
def points():
    # synthetic-image geotags (city-clustered + uniform + hot cell) plus
    # points forced near every tile to stress boundaries
    lats, lngs = [], []
    for i in range(4000):
        la, ln = derive_latlng(f"img{i:012d}")
        lats.append(la)
        lngs.append(ln)
    rng = np.random.default_rng(99)
    for name, _ in TILES:
        del name
    for center in [(40.5, -73.0), (-30.0, 178.0), (88.0, 10.0), (40.0, -70.0),
                   (48.85, 2.35), (-33.9, 151.2), (40.7, -74.0), (45.0, 45.0),
                   (81.0, 0.0)]:
        for _ in range(300):
            lats.append(float(np.clip(center[0] + rng.uniform(-4, 4), -89.9, 89.9)))
            lngs.append(float(((center[1] + rng.uniform(-4, 4) + 180) % 360) - 180))
    return np.asarray(lats), np.asarray(lngs)


def _oracle_contains(name, region, lat, lng) -> bool:
    p = o.latlng_to_xyz(lat, lng)
    if isinstance(region, RectRegion):
        return OR.rect_contains(*region.deg_bounds, lat, lng)
    if isinstance(region, CapRegion):
        (clat, clng), r = CAP_PARAMS[name]
        return OR.cap_contains(o.latlng_to_xyz(clat, clng), r, p)
    return OR.loop_contains([tuple(v) for v in region.vertices], p)


def test_join_matches_bruteforce(points):
    lat, lng = points
    leaf = vk.from_latlng(lat, lng)
    index = CoveringIndex.build(TILES, max_cells=32, max_level=14)
    p_idx, t_idx = index.match(leaf, lat, lng)
    got = {(int(p), index.tile_ids[t]) for p, t in zip(p_idx, t_idx)}
    want = set()
    for name, region in TILES:
        for i in range(len(lat)):
            if _oracle_contains(name, region, float(lat[i]), float(lng[i])):
                want.add((i, name))
    assert got == want, (
        f"missing={list(want - got)[:5]} extra={list(got - want)[:5]} "
        f"(|want|={len(want)}, |got|={len(got)})"
    )


def test_join_interior_fraction(points):
    """Most matches should come from interior cells (the load-bearing
    optimization — exact PIP only on boundary candidates)."""
    lat, lng = points
    leaf = vk.from_latlng(lat, lng)
    index = CoveringIndex.build(TILES, max_cells=64, max_level=14)
    p_idx, c_rows = index.probe(leaf)
    assert p_idx.size > 0
    interior_frac = float(index.interior[c_rows].mean())
    # with max_cells=64 coverings a decent share of candidate hits must
    # be interior-accepted (no exact test); guards against a coverer
    # regression that would silently make everything a boundary case
    assert interior_frac > 0.2, interior_frac
