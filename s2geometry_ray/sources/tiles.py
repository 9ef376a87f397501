"""Synthetic tiles table per FIXTURES.md §2: rects / polygons / caps
with fixed adversarial cases (dateline-crossing, pole-touching, sliver,
face-corner, whole-face).

Deterministic (seeded); returns both the Arrow table (the storage
schema) and the decoded ``(tile_id, Region)`` list the covering/join
stages consume.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from s2geometry_ray.kernels.regions import (
    CapRegion,
    LoopRegion,
    PolygonRegion,
    RectRegion,
)

TILE_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("kind", pa.string()),
    ("rect", pa.struct([("lat_lo", pa.float64()), ("lat_hi", pa.float64()),
                        ("lng_lo", pa.float64()), ("lng_hi", pa.float64())])),
    ("loops", pa.list_(pa.list_(pa.struct([("lat", pa.float64()),
                                           ("lng", pa.float64())])))),
    ("cap", pa.struct([("lat", pa.float64()), ("lng", pa.float64()),
                       ("radius_rad", pa.float64())])),
])

EARTH_KM_PER_RAD = 6371.0


def gen_tiles(n: int = 25, seed: int = 7):
    """→ (pa.Table, [(tile_id, Region)]).  60% rects / 30% polygons /
    10% caps around deterministic centers, plus fixed adversarial tiles."""
    rng = np.random.default_rng(seed)
    centers_lat = rng.uniform(-60, 70, max(n, 8))
    centers_lng = rng.uniform(-180, 180, max(n, 8))
    rows = []
    regions = []

    def add(tile_id, kind, rect=None, loops=None, cap=None, region=None):
        rows.append({"tile_id": tile_id, "kind": kind, "rect": rect,
                     "loops": loops, "cap": cap})
        regions.append((tile_id, region))

    k = 0
    while k < n:
        tid = f"tile{k:05d}"
        cla, cln = float(centers_lat[k % len(centers_lat)]), float(centers_lng[k % len(centers_lng)])
        r = rng.uniform()
        if r < 0.6:
            dlat = float(rng.uniform(0.2, 5.0))
            dlng = float(rng.uniform(0.2, 5.0))
            lat_lo = max(-89.9, cla - dlat)
            lat_hi = min(89.9, cla + dlat)
            lng_lo = ((cln - dlng + 180) % 360) - 180
            lng_hi = ((cln + dlng + 180) % 360) - 180
            add(tid, "rect",
                rect={"lat_lo": lat_lo, "lat_hi": lat_hi,
                      "lng_lo": lng_lo, "lng_hi": lng_hi},
                region=RectRegion.from_degrees(lat_lo, lat_hi, lng_lo, lng_hi))
        elif r < 0.9:
            nv = int(rng.integers(5, 13))
            angles = np.linspace(0, 2 * np.pi, nv, endpoint=False)
            rad = rng.uniform(0.5, 3.0) * (1.0 + 0.4 * np.cos(rng.integers(2, 5) * angles))
            pts = [(float(np.clip(cla + rr * np.sin(a), -89.5, 89.5)),
                    float(((cln + rr * np.cos(a) + 180) % 360) - 180))
                   for a, rr in zip(angles, rad)]
            add(tid, "polygon",
                loops=[[{"lat": la, "lng": ln} for la, ln in pts]],
                region=LoopRegion.from_latlng_degrees(pts))
        else:
            radius = float(rng.uniform(10, 500) / EARTH_KM_PER_RAD)
            add(tid, "cap", cap={"lat": cla, "lng": cln, "radius_rad": radius},
                region=CapRegion.from_latlng_radius(cla, cln, radius))
        k += 1

    # fixed adversarial tiles (always appended)
    add("tile-dateline", "rect",
        rect={"lat_lo": -20.0, "lat_hi": -10.0, "lng_lo": 175.0, "lng_hi": -176.0},
        region=RectRegion.from_degrees(-20.0, -10.0, 175.0, -176.0))
    add("tile-pole", "rect",
        rect={"lat_lo": 87.0, "lat_hi": 90.0, "lng_lo": -180.0, "lng_hi": 180.0},
        region=RectRegion.from_degrees(87.0, 90.0, -180.0, 180.0))
    add("tile-sliver", "rect",
        rect={"lat_lo": 10.0, "lat_hi": 10.0001, "lng_lo": -40.0, "lng_hi": 0.0},
        region=RectRegion.from_degrees(10.0, 10.0001, -40.0, 0.0))
    corner = [(43.0, 43.0), (43.0, 47.0), (47.0, 47.0), (47.0, 43.0)]
    add("tile-facecorner", "polygon",
        loops=[[{"lat": la, "lng": ln} for la, ln in corner]],
        region=LoopRegion.from_latlng_degrees(corner))
    shell = [(-50.0, 20.0), (-50.0, 30.0), (-42.0, 30.0), (-42.0, 20.0)]
    hole = [(-48.0, 23.0), (-45.0, 23.0), (-45.0, 27.0), (-48.0, 27.0)][::-1]
    add("tile-holed", "polygon",
        loops=[[{"lat": la, "lng": ln} for la, ln in lp] for lp in (shell, hole)],
        region=PolygonRegion.from_latlng_degrees([shell, hole]))

    table = pa.Table.from_pylist(rows, schema=TILE_SCHEMA)
    return table, regions


def regions_from_table(table: pa.Table):
    """Decode a stored tiles table back into (tile_id, Region) pairs —
    the deserialization path a reader of the parquet tiles table uses."""
    out = []
    for row in table.to_pylist():
        kind = row["kind"]
        if kind == "rect":
            r = row["rect"]
            out.append((row["tile_id"], RectRegion.from_degrees(
                r["lat_lo"], r["lat_hi"], r["lng_lo"], r["lng_hi"])))
        elif kind == "polygon":
            loops = [[(p["lat"], p["lng"]) for p in lp] for lp in row["loops"]]
            if len(loops) == 1:
                out.append((row["tile_id"], LoopRegion.from_latlng_degrees(loops[0])))
            else:  # loop 0 = shell, rest = holes (FIXTURES §2 / SURVEY §2.1)
                out.append((row["tile_id"], PolygonRegion.from_latlng_degrees(loops)))
        else:
            c = row["cap"]
            out.append((row["tile_id"], CapRegion.from_latlng_radius(
                c["lat"], c["lng"], c["radius_rad"])))
    return out
