"""O50 adaptive tiling: engine vs a scalar brute-force recompute of the
selection rule, both selection paths, and the coverage/disjointness
invariants (every point lands in EXACTLY one output cell)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from s2geometry_ray.kernels import cellid as vk

MIN_L, MAX_L, CAP = 2, 5, 40


def _brute_rule(cell_ids: np.ndarray, min_l: int, max_l: int, cap: int):
    """Dead-simple dict recompute of the docstring rule."""
    counts: dict[int, int] = {}
    for lv in range(min_l, max_l + 1):
        for c in vk.parent(cell_ids, lv):
            counts[int(c)] = counts.get(int(c), 0) + 1
    out = {}
    for c, n in counts.items():
        lv = int(vk.level(np.array([c], dtype=np.uint64))[0])
        if lv > min_l:
            p = int(vk.parent(np.array([c], dtype=np.uint64), lv - 1)[0])
            if counts[p] <= cap:
                continue
        if n <= cap or lv == max_l:
            out[c] = (lv, n)
    return out


@pytest.fixture(scope="module")
def skewed_points(ray_session):
    """60% of points crammed near one location (forces refinement to
    max_level with residual > cap there), the rest spread wide."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    n_hot, n_cold = 3000, 2000
    lat = np.concatenate([40.0 + rng.uniform(-0.01, 0.01, n_hot),
                          rng.uniform(-60, 60, n_cold)])
    lng = np.concatenate([-74.0 + rng.uniform(-0.01, 0.01, n_hot),
                          rng.uniform(-179, 179, n_cold)])
    cid = vk.from_latlng(lat, lng)
    ds = rd.from_arrow(pa.table({
        "cell_id": pa.array(cid, type=pa.uint64()),
    }))
    return ds.materialize(), cid


@pytest.mark.parametrize("partitioned", [False, True])
def test_matches_brute_rule(skewed_points, partitioned):
    from s2geometry_ray.stages.adaptive_tiling import adaptive_tiling

    ds, cid = skewed_points
    out = adaptive_tiling(ds, MIN_L, MAX_L, CAP, partitioned=partitioned,
                          n_rows_hint=len(cid)).to_pandas()
    got = {int(c): (int(lv), int(n))
           for c, lv, n in zip(out.cell_id, out.level, out.n_points)}
    assert got == _brute_rule(cid, MIN_L, MAX_L, CAP)
    # the skew actually exercised the max_level truncation clause
    assert ((out.level == MAX_L) & (out.n_points > CAP)).any()
    # and the coarse-accept clause
    assert (out.n_points <= CAP).any()


def test_partition_invariants(skewed_points):
    """The output is a valid partition of the input: disjoint Hilbert
    ranges whose union covers every point exactly once."""
    from s2geometry_ray.stages.adaptive_tiling import adaptive_tiling

    ds, cid = skewed_points
    out = adaptive_tiling(ds, MIN_L, MAX_L, CAP).to_pandas()
    cells = out.cell_id.to_numpy().astype(np.uint64)
    lo, hi = vk.range_min(cells), vk.range_max(cells)
    order = np.argsort(lo)
    lo, hi, n = lo[order], hi[order], out.n_points.to_numpy()[order]
    assert np.all(hi[:-1] < lo[1:])          # disjoint
    idx = np.searchsorted(lo, cid, side="right") - 1
    covered = (idx >= 0) & (cid <= hi[np.maximum(idx, 0)])
    assert covered.all()                     # total coverage
    assert n.sum() == len(cid)               # counts partition N
    binned = np.bincount(idx, minlength=len(lo))
    assert np.array_equal(binned, n)         # per-cell counts exact


def test_level_bounds_validated(skewed_points):
    from s2geometry_ray.stages.adaptive_tiling import adaptive_tiling

    ds, _ = skewed_points
    with pytest.raises(ValueError):
        adaptive_tiling(ds, 5, 3, 10)
