"""Deterministic synthetic generators per FIXTURES.md: the images table
(image_id, bytes, w, h, fmt, caption, phash), tiles, and kNN queries.

Generation is a Ray Data source: ``ray.data.range(n)`` →
``map_batches(gen)`` so a 10⁷-row bench table is produced in parallel
without driver materialization (SURVEY.md §3.4 O1).  Geotags are
derived from sha256(image_id): 80 % clustered around 50 city centers
(skew), 19 % uniform-on-sphere, 1 % forced into one hot cell.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from s2geometry_ray.kernels import codecs
from s2geometry_ray.kernels.phash import phash64_i64

_ADJ = ["quiet", "bright", "old", "green", "vast", "tiny", "warm", "cold",
        "busy", "calm"]
_NOUN = ["harbor", "market", "bridge", "garden", "tower", "valley", "square",
         "forest", "canal", "plaza"]
_FMTS = ["ppm", "bmp", "png", "qdct"]  # qdct is LOSSY (PSNR≥40dB contract)
_SIZES = [16, 32, 64]

# 50 deterministic "city" centers (seeded, fixed forever)
_rng = np.random.default_rng(20240917)
CITY_LAT = _rng.uniform(-60.0, 70.0, 50)
CITY_LNG = _rng.uniform(-180.0, 180.0, 50)
HOT_CELL_LATLNG = (40.75, -73.99)
del _rng


def _hash_u64(image_id: str, salt: str = "") -> int:
    digest = hashlib.sha256((image_id + salt).encode()).digest()
    return int.from_bytes(digest[:8], "big")


def derive_latlng(image_id: str, hot_fraction: float = 0.01) -> tuple[float, float]:
    """Deterministic geotag from the image id (FIXTURES.md §1)."""
    h1 = _hash_u64(image_id, "a")
    h2 = _hash_u64(image_id, "b")
    u1 = (h1 >> 11) / float(1 << 53)
    u2 = (h2 >> 11) / float(1 << 53)
    sel = u1
    if sel < hot_fraction:  # hot cell
        lat = HOT_CELL_LATLNG[0] + (u2 - 0.5) * 0.02
        lng = HOT_CELL_LATLNG[1] + ((_hash_u64(image_id, "c") >> 11) / float(1 << 53) - 0.5) * 0.02
    elif sel < hot_fraction + 0.19:  # uniform on sphere
        z = 2.0 * u2 - 1.0
        lat = float(np.degrees(np.arcsin(z)))
        lng = ((_hash_u64(image_id, "c") >> 11) / float(1 << 53)) * 360.0 - 180.0
    else:  # city cluster, wrapped normal sigma=0.5 deg
        city = _hash_u64(image_id, "c") % 50
        g1 = (u2 - 0.5) * 2.0
        g2 = ((_hash_u64(image_id, "d") >> 11) / float(1 << 53) - 0.5) * 2.0
        lat = float(np.clip(CITY_LAT[city] + g1 * 0.5, -89.9, 89.9))
        lng = CITY_LNG[city] + g2 * 0.5
    lng = ((lng + 180.0) % 360.0) - 180.0
    return float(lat), float(lng)


def gen_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic gradient + hash-seeded noise pattern."""
    seed = _hash_u64(image_id, "px") % (1 << 32)
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255) // max(w - 1, 1),
            (yy * 255) // max(h - 1, 1),
            ((xx + yy) * 255) // max(w + h - 2, 1),
        ],
        axis=2,
    ).astype(np.int32)
    noise = rng.integers(-24, 25, size=(h, w, 3), dtype=np.int32)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def gen_image_row(row_id: int, with_bytes: bool = True) -> dict:
    image_id = f"img{row_id:012d}"
    h1 = _hash_u64(image_id, "meta")
    w = _SIZES[h1 % 3]
    hgt = _SIZES[(h1 >> 2) % 3]
    fmt = _FMTS[(h1 >> 4) % 4]
    lat, lng = derive_latlng(image_id)
    caption = (
        f"{_ADJ[(h1 >> 6) % 10]} {_NOUN[(h1 >> 10) % 10]} near ({lat:.4f},{lng:.4f})"
    )
    if with_bytes:
        pixels = gen_pixels(image_id, w, hgt)
        data = codecs.encode(pixels, fmt)
        if fmt in codecs.LOSSY_FMTS:
            # stored phash is of the REFERENCE-DECODED pixels (decode is
            # deterministic), so the decode stage still verifies
            # bit-exactly; pristine-pixel fidelity is the separate
            # PSNR≥40dB contract (tests/test_codecs.py)
            ph = int(phash64_i64(codecs.decode(data, fmt)))
        else:
            ph = int(phash64_i64(pixels))
    else:
        data = b"\x00" * 8  # I/O-light stub for join benchmarks (FIXTURES.md)
        ph = int(np.int64(np.uint64(_hash_u64(image_id, "ph"))))
    return {
        "image_id": image_id,
        "bytes": data,
        "w": np.int32(w),
        "h": np.int32(hgt),
        "fmt": fmt,
        "caption": caption,
        "phash": np.int64(ph),
    }


IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def gen_images_batch(batch, with_bytes: bool = True) -> pa.Table:
    """map_batches generator over ``ray.data.range(n)`` (column 'id')."""
    ids = batch["id"] if isinstance(batch, dict) else batch["id"].to_numpy()
    rows = [gen_image_row(int(i), with_bytes) for i in np.asarray(ids)]
    return pa.Table.from_pylist(rows, schema=IMAGE_SCHEMA)


def images_dataset(n: int, with_bytes: bool = True, parallelism: int | None = None):
    """Distributed synthetic images table as a Ray Dataset (O1)."""
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=parallelism) if parallelism else rd.range(n)
    return ds.map_batches(
        lambda b: gen_images_batch(b, with_bytes),
        batch_format="numpy",
        batch_size=512 if with_bytes else 8192,
    )


def images_table(n: int, with_bytes: bool = True) -> pa.Table:
    """Driver-side (test-sized) images table."""
    rows = [gen_image_row(i, with_bytes) for i in range(n)]
    return pa.Table.from_pylist(rows, schema=IMAGE_SCHEMA)


def image_city_tile_bounds(k: int) -> dict[str, float]:
    """Deterministic rect tile around city k (the image-side gate
    tiles): ±1.5° around the city center, clamped so gate rects never
    wrap the antimeridian (wrapping rects are pytest-covered).  Shared
    by the engine pipeline and the SQL twin so the bounds constants can
    never drift."""
    lat_lo = float(np.clip(CITY_LAT[k] - 1.5, -89.9, 89.9))
    lat_hi = float(np.clip(CITY_LAT[k] + 1.5, -89.9, 89.9))
    lng_lo = float(max(CITY_LNG[k] - 1.5, -180.0))
    lng_hi = float(min(CITY_LNG[k] + 1.5, 180.0))
    return {"lat_lo": lat_lo, "lat_hi": lat_hi,
            "lng_lo": lng_lo, "lng_hi": lng_hi}
