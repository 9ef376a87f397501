"""O52 composed image×geo pipeline: actor features vs scalar decode,
and the per-tile aggregate vs a driver-side brute recompute."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_ray.kernels import codecs
from s2geometry_ray.sources.synth import (derive_latlng, gen_image_row,
                                          image_city_tile_bounds)

N = 120


def _brute(n):
    exp: dict[int, list[int]] = {}
    for i in range(n):
        r = gen_image_row(i, with_bytes=True)
        s = codecs.decode(r["bytes"], r["fmt"]).astype(np.int64).sum(axis=(0, 1))
        lat, lng = derive_latlng(r["image_id"])
        for k in range(12):
            b = image_city_tile_bounds(k)
            if (b["lat_lo"] <= lat <= b["lat_hi"]
                    and b["lng_lo"] <= lng <= b["lng_hi"]):
                e = exp.setdefault(k, [0, 0, 0, 0])
                e[0] += 1
                e[1] += int(s[0]); e[2] += int(s[1]); e[3] += int(s[2])
    return exp


@pytest.mark.usefixtures("ray_session")
def test_tile_color_stats_matches_brute():
    from s2geometry_ray.pipelines.extras import tile_color_stats_images

    out = tile_color_stats_images("", n=N).to_pandas()
    got = {int(r.tile_key): [int(r.n_images), int(r.r_sum),
                             int(r.g_sum), int(r.b_sum)]
           for r in out.itertuples()}
    assert got == _brute(N)


@pytest.mark.usefixtures("ray_session")
def test_geocolor_actor_scalar_parity():
    import ray.data as rd

    from s2geometry_ray.sources.synth import images_dataset
    from s2geometry_ray.stages.decode import GeoColorActor

    out = images_dataset(16).map_batches(
        GeoColorActor, batch_size=8, concurrency=1, num_cpus=1,
        batch_format="pyarrow").to_pandas().set_index("image_id")
    for i in range(16):
        r = gen_image_row(i, with_bytes=True)
        s = codecs.decode(r["bytes"], r["fmt"]).astype(np.int64).sum(axis=(0, 1))
        row = out.loc[r["image_id"]]
        assert [row.r_sum, row.g_sum, row.b_sum] == list(s)
        lat, lng = derive_latlng(r["image_id"])
        assert row.lat == lat and row.lng == lng


@pytest.mark.usefixtures("ray_session")
def test_patchify_partitions_every_pixel():
    """O58: for every image the P×P patches tile the pixel grid exactly
    (npix sums to w·h; patch sums reassemble the full-image sum),
    including odd sizes where integer box edges differ per patch."""
    from s2geometry_ray.pipelines.extras import patch_features_images

    out = patch_features_images("", n=40, grid=4).to_pandas()
    assert len(out) == 40 * 16
    for i in range(0, 40, 7):
        r = gen_image_row(i, with_bytes=True)
        px = codecs.decode(r["bytes"], r["fmt"]).astype(np.int64)
        sub = out[out.ikey == i]
        assert sub.npix.sum() == px.shape[0] * px.shape[1]
        assert sub.psum.sum() == int(px.sum())
