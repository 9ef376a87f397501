"""O56 composed image curation vs a fully scalar driver recompute of
filter → phash dedup → spatial cap → shard."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_ray.functions.shuffle import _seed_mix, _splitmix64
from s2geometry_ray.kernels import cellid as vk
from s2geometry_ray.kernels import codecs
from s2geometry_ray.pipelines.image_curation import (B_MIN, CAP_K, CAP_SEED,
                                                     CUR_LEVEL, N_SHARDS,
                                                     SHARD_SEED)
from s2geometry_ray.sources.synth import derive_latlng, gen_image_row

N = 150


def _brute(n):
    rows = []
    for i in range(n):
        r = gen_image_row(i, with_bytes=True)
        px = codecs.decode(r["bytes"], r["fmt"])
        bm = int(px.astype(np.int64).sum()) * 1000 \
            // (3 * px.shape[0] * px.shape[1])
        for k in [i] + ([i + 1_000_000] if i % 10 == 0 else []):
            lat, lng = derive_latlng(f"img{k:012d}")
            cell = int(vk.parent(vk.from_latlng(np.array([lat]),
                                                np.array([lng])), CUR_LEVEL)[0])
            rows.append(dict(ikey=k, phash=int(r["phash"]), bmilli=bm,
                             cell=cell, lat=lat, lng=lng))
    rows = [r for r in rows if r["bmilli"] >= B_MIN]
    # dedup: min ikey per phash
    best: dict[int, dict] = {}
    for r in rows:
        if r["phash"] not in best or r["ikey"] < best[r["phash"]]["ikey"]:
            best[r["phash"]] = r
    rows = list(best.values())
    # cap: k smallest (splitmix(ikey ^ mix), ikey) per cell
    mix = np.uint64(_seed_mix(CAP_SEED))
    for r in rows:
        r["h"] = int(_splitmix64(np.array([r["ikey"]], np.uint64) ^ mix)[0])
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    keep = []
    for rs in by_cell.values():
        rs.sort(key=lambda r: (r["h"], r["ikey"]))
        keep.extend(rs[:CAP_K])
    smix = np.uint64(_seed_mix(SHARD_SEED))
    return {r["ikey"]: (r["cell"], r["bmilli"],
                        int(_splitmix64(np.array([r["ikey"]], np.uint64)
                                        ^ smix)[0] % np.uint64(N_SHARDS)))
            for r in keep}


@pytest.mark.usefixtures("ray_session")
def test_curation_matches_brute():
    from s2geometry_ray.pipelines.image_curation import curate_images

    out = curate_images("", n=N).to_pandas()
    got = {int(r.ikey): (int(r.cell_id), int(r.bmilli), int(r.shard))
           for r in out.itertuples()}
    exp = _brute(N)
    assert got == exp
    # every composed stage did real work on this fixture
    assert len(exp) < N + N // 10          # filter+dedup+cap dropped rows


def test_dedup_always_prefers_the_original():
    """A planted duplicate shares phash AND bmilli with its twin, so
    min-ikey dedup must eliminate every planted id (they only entered
    the race at all because the filter passes both or neither)."""
    exp = _brute(N)
    assert all(k < 1_000_000 for k in exp)
