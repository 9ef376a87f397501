"""O51 vector→raster: per-tile point-density rasterization.

The inverse handoff of O12 (raster→vector): point features joined to a
tile are binned into a fixed W×H pixel grid over the tile's lat/lng
rect, producing (a) exact per-pixel counts — the gate surface, with a
bit-exact DuckDB twin — and (b) a grayscale PPM density image per tile
through the engine's own codec (kernels/codecs.encode_ppm), round-trip
verified by pytest.

Plan shape (scale posture): the joined stream is map-only — each batch
bins its own rows into a partial count vector keyed by one packed int64
``pix_key = tile_key·(W·H) + py·W + px`` (np.unique per batch), then
the bounded combine sums partials (cardinality ≤ #tiles · W · H — the
map-side pre-agg contract; the point stream itself never shuffles).
Rendering consumes the tiny combined table in one pass.

Float discipline: the bin index is ``trunc((coord − lo) · W / (hi −
lo))`` computed in float64 in EXACTLY this operation order on both
sides (each IEEE op is correctly rounded, so identical order ⇒
identical bits), clamped to W−1 at the closed upper edge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from s2geometry_ray.sources.geotag import tile_bounds


def _partial_bincount(w: int, h: int):
    def _fn(batch: pa.Table) -> pa.Table:
        k = batch["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        b = tile_bounds(k)
        px = np.minimum(np.trunc((lng - b["lng_lo"]) * float(w)
                                 / (b["lng_hi"] - b["lng_lo"])).astype(np.int64),
                        w - 1)
        py = np.minimum(np.trunc((lat - b["lat_lo"]) * float(h)
                                 / (b["lat_hi"] - b["lat_lo"])).astype(np.int64),
                        h - 1)
        packed = k * (w * h) + py * w + px
        keys, counts = np.unique(packed, return_counts=True)
        return pa.table({
            "pix_key": pa.array(keys, type=pa.int64()),
            "n": pa.array(counts.astype(np.int64), type=pa.int64()),
        })

    return _fn


def rasterize_density(joined_ds, w: int = 16, h: int = 16):
    """``joined_ds`` carries (tile_id int, lat, lng) join rows (from the
    spatial join).  Returns a Dataset of (tile_key, px, py, n) exact
    pixel counts."""
    from s2geometry_ray.stages.tile_assign import combine_partials

    partials = joined_ds.map_batches(_partial_bincount(w, h),
                                     batch_format="pyarrow", batch_size=None)
    combined = combine_partials(partials, "pix_key", {"n": "sum"})

    def unpack(t: pa.Table) -> pa.Table:
        pk = t["pix_key"].to_numpy(zero_copy_only=False)
        return pa.table({
            "tile_key": pa.array(pk // (w * h), type=pa.int64()),
            "py": pa.array(pk % (w * h) // w, type=pa.int64()),
            "px": pa.array(pk % w, type=pa.int64()),
            "n": t["n"],
        })

    return combined.map_batches(unpack, batch_format="pyarrow",
                                batch_size=None)


def density_images(counts_ds, w: int = 16, h: int = 16):
    """Render the combined counts into one grayscale PPM per tile
    (pixel = floor(255·n / max_n_in_tile); empty pixels 0).  The counts
    table is tiny by the pre-agg contract, so rendering is one pass;
    returns a Dataset of (tile_key, w, h, fmt, bytes)."""
    from s2geometry_ray.kernels.codecs import encode_ppm

    def render(t: pa.Table) -> pa.Table:
        tk = t["tile_key"].to_numpy(zero_copy_only=False)
        px = t["px"].to_numpy(zero_copy_only=False)
        py = t["py"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        keys, imgs = [], []
        for k in np.unique(tk):
            m = tk == k
            grid = np.zeros((h, w), dtype=np.int64)
            grid[py[m], px[m]] = n[m]
            top = grid.max()
            gray = (grid * 255 // max(top, 1)).astype(np.uint8)
            keys.append(int(k))
            imgs.append(encode_ppm(np.repeat(gray[:, :, None], 3, axis=2)))
        return pa.table({
            "tile_key": pa.array(keys, type=pa.int64()),
            "w": pa.array([w] * len(keys), type=pa.int32()),
            "h": pa.array([h] * len(keys), type=pa.int32()),
            "fmt": pa.array(["ppm"] * len(keys), type=pa.string()),
            "bytes": pa.array(imgs, type=pa.binary()),
        })

    return counts_ds.map_batches(render, batch_format="pyarrow",
                                 batch_size=None)


def rasterize_density_sql(w: int = 16, h: int = 16) -> str:
    """DuckDB twin: same join predicate as the spatial-join gate, same
    float binning expression (identical op order ⇒ identical bits)."""
    from s2geometry_ray.sources.geotag import (derive_lat_sql,
                                               derive_lng_sql,
                                               tile_bounds_sql)

    lat = derive_lat_sql("e.event_id")
    lng = derive_lng_sql("e.event_id")
    b = tile_bounds_sql("n.n_nationkey")
    px = (f"LEAST(CAST(trunc(({lng} - {b['lng_lo']}) * {float(w)!r} "
          f"/ ({b['lng_hi']} - {b['lng_lo']})) AS BIGINT), {w - 1})")
    py = (f"LEAST(CAST(trunc(({lat} - {b['lat_lo']}) * {float(h)!r} "
          f"/ ({b['lat_hi']} - {b['lat_lo']})) AS BIGINT), {h - 1})")
    return f"""
SELECT CAST(n.n_nationkey AS BIGINT) AS tile_key,
       {py} AS py,
       {px} AS px,
       CAST(count(*) AS BIGINT) AS n
FROM events e, nation n
WHERE {lat} BETWEEN {b['lat_lo']} AND {b['lat_hi']}
  AND {lng} BETWEEN {b['lng_lo']} AND {b['lng_hi']}
GROUP BY 1, 2, 3
"""
