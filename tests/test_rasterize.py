"""O51 vector→raster: exact binning vs a scalar recompute, and the
rendered PPM density image decodes back to the normalized counts."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from s2geometry_ray.sources.geotag import tile_bounds

W = H = 8


@pytest.fixture(scope="module")
def joined_ds(ray_session):
    """Synthetic pre-joined rows: 4 tiles × points scattered inside
    each tile's rect (as the spatial join would emit)."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    rows = []
    for k in [0, 3, 7, 12]:
        b = tile_bounds(np.array([k]))
        n = 500 + 97 * k
        lat = rng.uniform(b["lat_lo"][0], b["lat_hi"][0], n)
        lng = rng.uniform(b["lng_lo"][0], b["lng_hi"][0], n)
        rows.append(pa.table({
            "tile_id": pa.array(np.full(n, k, dtype=np.int64)),
            "lat": pa.array(lat), "lng": pa.array(lng),
        }))
    tbl = pa.concat_tables(rows)
    return rd.from_arrow(tbl).repartition(6).materialize(), tbl


def _scalar_bins(tbl: pa.Table):
    exp: dict[tuple, int] = {}
    for k, lat, lng in zip(tbl["tile_id"].to_pylist(),
                           tbl["lat"].to_pylist(), tbl["lng"].to_pylist()):
        b = tile_bounds(np.array([k]))
        px = min(int((lng - b["lng_lo"][0]) * W / (b["lng_hi"][0] - b["lng_lo"][0])), W - 1)
        py = min(int((lat - b["lat_lo"][0]) * H / (b["lat_hi"][0] - b["lat_lo"][0])), H - 1)
        exp[(k, py, px)] = exp.get((k, py, px), 0) + 1
    return exp


def test_counts_match_scalar(joined_ds):
    from s2geometry_ray.stages.rasterize import rasterize_density

    ds, tbl = joined_ds
    out = rasterize_density(ds, w=W, h=H).to_pandas()
    got = {(int(t), int(y), int(x)): int(n)
           for t, y, x, n in zip(out.tile_key, out.py, out.px, out.n)}
    assert got == _scalar_bins(tbl)
    assert out.n.sum() == len(tbl)


def test_ppm_render_roundtrip(joined_ds):
    from s2geometry_ray.kernels.codecs import decode_ppm
    from s2geometry_ray.stages.rasterize import (density_images,
                                                 rasterize_density)

    ds, tbl = joined_ds
    counts = rasterize_density(ds, w=W, h=H)
    imgs = density_images(counts, w=W, h=H).to_pandas()
    cdf = counts.to_pandas()
    assert set(imgs.tile_key) == set(cdf.tile_key.unique())
    for _, row in imgs.iterrows():
        pix = decode_ppm(row["bytes"])
        assert pix.shape == (H, W, 3)
        sub = cdf[cdf.tile_key == row.tile_key]
        grid = np.zeros((H, W), dtype=np.int64)
        grid[sub.py.to_numpy(), sub.px.to_numpy()] = sub.n.to_numpy()
        expect = (grid * 255 // max(grid.max(), 1)).astype(np.uint8)
        assert np.array_equal(pix[:, :, 0], expect)
        assert np.array_equal(pix[:, :, 0], pix[:, :, 2])


def test_covering_overlap_matches_brute(ray_session):
    """O57: streamed searchsorted overlap join == brute O(A·B) range
    intersection on hand-built coverings (partial, nested-level,
    identical and disjoint range cases)."""
    import itertools

    import ray.data as rd

    from s2geometry_ray.kernels import cellid as vk
    from s2geometry_ray.kernels.regions import CapRegion, RectRegion
    from s2geometry_ray.stages.covering_overlap import (covering_overlap,
                                                        exploded_covering)

    rects = [(k, RectRegion.from_degrees(-10.0 + 3 * k, 5.0 + 3 * k,
                                         -20.0, 15.0)) for k in range(4)]
    caps = [(k, CapRegion.from_latlng_radius(-2.0 + 4 * k, -1.0,
                                             np.radians(6.0)))
            for k in range(3)]
    ka, _c, la, ha = exploded_covering(caps)
    kb, _c2, lb, hb = exploded_covering(rects)
    ds = rd.from_arrow(pa.table({
        "tile_key": pa.array(ka), "lo": pa.array(la.view(np.int64)),
        "hi": pa.array(ha.view(np.int64)),
    })).repartition(3)
    out = covering_overlap(ds, rects).to_pandas()
    got = {(int(r.tile_a), int(r.tile_b)): int(r.overlap_leafs)
           for r in out.itertuples()}
    exp: dict[tuple, int] = {}
    for i, j in itertools.product(range(ka.size), range(kb.size)):
        lo = max(int(la[i]), int(lb[j]))
        hi = min(int(ha[i]), int(hb[j]))
        if lo <= hi:
            key = (int(ka[i]), int(kb[j]))
            exp[key] = exp.get(key, 0) + (hi - lo + 1)
    assert got == exp and len(exp) >= 6
