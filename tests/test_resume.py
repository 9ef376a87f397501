"""Resume/determinism tests (SURVEY.md §6.2.4/5): kill a partitioned job
mid-run, rerun, assert byte-identical output and no recomputation of
finished partitions."""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow.parquet as pq
import pytest

from s2geometry_ray.state.manifests import (
    finished_partitions,
    read_output,
    spatial_join_partitioned,
)

SF = "/root/testdata/sf0.001"


def _output_bytes(out_dir: str) -> bytes:
    t = read_output(out_dir)
    import pyarrow as pa

    sink = pa.BufferOutputStream()
    pq.write_table(t, sink)
    return sink.getvalue().to_pybytes()


def test_crash_resume_identical(tmp_path, ray_session):
    full_dir = str(tmp_path / "full")
    crash_dir = str(tmp_path / "crash")

    # uninterrupted run
    done = spatial_join_partitioned(SF, full_dir, num_buckets=6)
    assert len(done) == 6

    # crashed run: only 2 partitions finish
    with pytest.raises(RuntimeError, match="simulated crash"):
        spatial_join_partitioned(SF, crash_dir, num_buckets=6, fail_after=2)
    assert len(finished_partitions(crash_dir)) == 2

    # resume: finishes the remaining 4 without touching the first 2
    mtimes_before = {
        n: os.path.getmtime(m["path"])
        for n, m in finished_partitions(crash_dir).items()
    }
    done2 = spatial_join_partitioned(SF, crash_dir, num_buckets=6)
    assert len(done2) == 6
    for n, t0 in mtimes_before.items():
        assert os.path.getmtime(done2[n]["path"]) == t0, f"{n} was recomputed"

    # byte-identical final output
    assert _output_bytes(crash_dir) == _output_bytes(full_dir)


def test_manifest_fingerprints_match(tmp_path, ray_session):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    da = spatial_join_partitioned(SF, a, num_buckets=4)
    db = spatial_join_partitioned(SF, b, num_buckets=4)
    for name in da:
        assert da[name]["fingerprint"] == db[name]["fingerprint"]
        assert da[name]["row_count"] == db[name]["row_count"]


def test_stale_tmp_dir_ignored(tmp_path, ray_session):
    out = str(tmp_path / "o")
    os.makedirs(os.path.join(out, "part-b000.tmp"))  # crash debris
    with open(os.path.join(out, "part-b000.tmp", "junk"), "w") as fh:
        fh.write("partial write")
    done = spatial_join_partitioned(SF, out, num_buckets=3)
    assert len(done) == 3
    assert not os.path.isdir(os.path.join(out, "part-b000.tmp"))
    m = json.load(open(os.path.join(out, "_manifests", "b000.json")))
    assert m["row_count"] == done["b000"]["row_count"]


def test_no_read_amplification(tmp_path, ray_session):
    """Each partition task reads ONLY its own fragment: the one-time
    shard split stores every input row exactly once (read per bucket =
    1/B of the input, not the full file), and a resumed run reuses the
    existing shards (split not redone)."""
    out = str(tmp_path / "o")
    spatial_join_partitioned(SF, out, num_buckets=5)
    import glob

    shard_dir = os.path.join(out, "_input_shards")
    shards = sorted(glob.glob(os.path.join(shard_dir, "shard-*.parquet")))
    assert len(shards) == 5
    n_in = pq.read_table(f"{SF}/events.parquet", columns=["event_id"]).num_rows
    per_shard = [pq.read_table(s).num_rows for s in shards]
    assert sum(per_shard) == n_in  # every row stored exactly once
    assert max(per_shard) - min(per_shard) <= 1  # balanced contiguous ranges
    # resume must not rebuild the shards (no second full-input read)
    mtimes = {s: os.path.getmtime(s) for s in shards}
    spatial_join_partitioned(SF, out, num_buckets=5)
    for s, t0 in mtimes.items():
        assert os.path.getmtime(s) == t0, "shard split was redone on resume"


def test_partitioned_cell_output(tmp_path, ray_session):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from s2geometry_ray.sources.io import write_partitioned_by_cell
    from s2geometry_ray.stages.cell_assign import make_geotag_and_assign

    ds = rd.from_arrow(pa.table({"pt_key": pa.array(np.arange(5000, dtype=np.int64))}))
    pts = ds.map_batches(make_geotag_and_assign("pt_key", levels=()),
                         batch_format="pyarrow")
    out = str(tmp_path / "parts")
    write_partitioned_by_cell(pts, out, level=2, buckets=8)
    import glob

    dirs = sorted(glob.glob(f"{out}/cell_part=*"))
    assert 1 < len(dirs) <= 8
    back = pq.read_table(out)
    assert back.num_rows == 5000
    assert set(back["pt_key"].to_pylist()) == set(range(5000))


def test_shuffle_crash_resume_identical(tmp_path, ray_session):
    """The resumable SHUFFLE (map partials + reduce buckets): crashes in
    the map stage AND in the reduce stage both resume to byte-identical
    output with no recomputation of finished partitions, and the final
    aggregate matches the oracle computed in-process."""
    import numpy as np
    import pandas as pd

    from s2geometry_ray.state.manifests import tile_assign_partitioned

    full_dir = str(tmp_path / "full")
    crash_dir = str(tmp_path / "crash")

    done = tile_assign_partitioned(SF, full_dir, num_map=5, num_buckets=3)
    assert len(done) == 3

    # crash mid-MAP (2 of 5 map partials finish)
    with pytest.raises(RuntimeError, match="simulated crash .map."):
        tile_assign_partitioned(SF, crash_dir, num_map=5, num_buckets=3,
                                fail_after_map=2)
    assert len(finished_partitions(os.path.join(crash_dir, "map"))) == 2
    assert len(finished_partitions(os.path.join(crash_dir, "reduce"))) == 0

    # crash mid-REDUCE (map complete, 1 of 3 buckets finishes)
    with pytest.raises(RuntimeError, match="simulated crash .reduce."):
        tile_assign_partitioned(SF, crash_dir, num_map=5, num_buckets=3,
                                fail_after_reduce=1)
    m_mtimes = {n: os.path.getmtime(m["path"]) for n, m in
                finished_partitions(os.path.join(crash_dir, "map")).items()}
    assert len(m_mtimes) == 5
    assert len(finished_partitions(os.path.join(crash_dir, "reduce"))) == 1

    # resume to completion: nothing finished is recomputed
    done2 = tile_assign_partitioned(SF, crash_dir, num_map=5, num_buckets=3)
    assert len(done2) == 3
    for n, t0 in m_mtimes.items():
        got = finished_partitions(os.path.join(crash_dir, "map"))[n]
        assert os.path.getmtime(got["path"]) == t0, f"map {n} recomputed"

    # byte-identical to the uninterrupted run
    assert (_output_bytes(os.path.join(crash_dir, "reduce"))
            == _output_bytes(os.path.join(full_dir, "reduce")))

    # values match an independent in-process oracle
    from s2geometry_ray.sources.geotag import derive_lat, derive_lng, tile_bounds

    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "value"])
    k = ev["event_id"].to_numpy(zero_copy_only=False)
    lat, lng = derive_lat(k), derive_lng(k)
    cents = np.round(ev["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
    nk = pq.read_table(f"{SF}/nation.parquet", columns=["n_nationkey"])
    tk = nk["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = tile_bounds(tk)
    rows = []
    for i, t in enumerate(tk):
        inside = ((lat >= b["lat_lo"][i]) & (lat <= b["lat_hi"][i])
                  & (lng >= b["lng_lo"][i]) & (lng <= b["lng_hi"][i]))
        if inside.any():
            rows.append((int(t), int(inside.sum()), int(cents[inside].sum())))
    want = pd.DataFrame(rows, columns=["tile_key", "n", "value_cents"]) \
        .sort_values("tile_key").reset_index(drop=True)
    from s2geometry_ray.state.manifests import read_output

    got = read_output(os.path.join(crash_dir, "reduce")).to_pandas() \
        .sort_values("tile_key").reset_index(drop=True)
    assert got.equals(want)


def test_cell_range_manifests(tmp_path, ray_session):
    """Cell-range-partitioned stats: each reduce manifest records the
    contiguous Hilbert [lo, hi) range it owns; rows land in the right
    range; crash/resume is byte-identical; totals match an in-process
    oracle."""
    import numpy as np

    from s2geometry_ray.state.manifests import (cell_range_bounds,
                                                cell_stats_partitioned,
                                                read_output)

    full_dir = str(tmp_path / "full")
    crash_dir = str(tmp_path / "crash")
    done = cell_stats_partitioned(SF, full_dir, level=8, num_map=4,
                                  num_buckets=3)
    assert len(done) == 3
    bounds = cell_range_bounds(3)
    total_rows = 0
    for name, m in sorted(done.items()):
        lo, hi = m["cell_range"]
        b = int(name[1:])
        assert (lo, hi) == (bounds[b], bounds[b + 1])
        t = pq.read_table(m["path"])
        cells = t["cell"].to_numpy(zero_copy_only=False).view(np.uint64)
        assert ((cells >= np.uint64(lo)) & (cells < np.uint64(hi))).all()
        assert m["row_count"] == t.num_rows
        total_rows += int(t["n"].to_numpy(zero_copy_only=False).sum())

    # every event lands in exactly one cell partition
    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_id"])
    assert total_rows == ev.num_rows

    # in-process oracle: counts per level-8 cell via the pinned kernels
    from s2geometry_ray.kernels import cellid as vk
    from s2geometry_ray.sources.geotag import derive_lat, derive_lng

    k = ev["event_id"].to_numpy(zero_copy_only=False)
    cell8 = vk.parent(vk.from_latlng(derive_lat(k), derive_lng(k)), 8)
    want_cells, want_n = np.unique(cell8, return_counts=True)
    got = read_output(str(tmp_path / "full" / "reduce"))
    gc = got["cell"].to_numpy(zero_copy_only=False).view(np.uint64)
    order = np.argsort(gc)
    assert np.array_equal(gc[order], want_cells)
    assert np.array_equal(got["n"].to_numpy(zero_copy_only=False)[order], want_n)

    # crash mid-map, then resume: byte-identical
    with pytest.raises(RuntimeError, match="simulated crash .map."):
        cell_stats_partitioned(SF, crash_dir, level=8, num_map=4,
                               num_buckets=3, fail_after_map=1)
    cell_stats_partitioned(SF, crash_dir, level=8, num_map=4, num_buckets=3)
    assert (_output_bytes(os.path.join(crash_dir, "reduce"))
            == _output_bytes(os.path.join(full_dir, "reduce")))


def test_corpus_curation_resume_byte_identical(ray_session):
    """Curation shard writing crashes after 3 shards; the re-submitted
    run skips them and the final output is byte-identical (per-shard
    fingerprints equal) to an uninterrupted run."""
    import pytest

    from s2geometry_ray.state.manifests import (
        corpus_curation_partitioned,
        finished_partitions,
        read_output,
    )

    sf = "/root/testdata/sf0.001"
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        a = os.path.join(tmp, "crashy")
        b = os.path.join(tmp, "clean")
        with pytest.raises(RuntimeError, match="simulated crash"):
            corpus_curation_partitioned(sf, a, fail_after=3)
        assert len(finished_partitions(a)) == 3
        done_a = corpus_curation_partitioned(sf, a)      # resume
        done_b = corpus_curation_partitioned(sf, b)      # fresh
        assert {k: m["fingerprint"] for k, m in done_a.items()} \
            == {k: m["fingerprint"] for k, m in done_b.items()}
        ta = read_output(a)
        tb = read_output(b)
        assert ta.equals(tb)
        assert ta.num_rows > 0


def test_training_prep_resume_byte_identical(ray_session):
    """Packed-sequence shard writing crashes after 3 shards; the
    re-submitted run skips them and the final output is byte-identical
    to an uninterrupted run."""
    import pytest

    from s2geometry_ray.state.manifests import (
        finished_partitions,
        read_output,
        training_prep_partitioned,
    )

    sf = "/root/testdata/sf0.001"
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        a = os.path.join(tmp, "crashy")
        b = os.path.join(tmp, "clean")
        with pytest.raises(RuntimeError, match="simulated crash"):
            training_prep_partitioned(sf, a, fail_after=3)
        assert len(finished_partitions(a)) == 3
        done_a = training_prep_partitioned(sf, a)      # resume
        done_b = training_prep_partitioned(sf, b)      # fresh
        assert {k: m["fingerprint"] for k, m in done_a.items()} \
            == {k: m["fingerprint"] for k, m in done_b.items()}
        ta = read_output(a)
        tb = read_output(b)
        assert ta.equals(tb)
        assert ta.num_rows > 0
        # fully-finished short-circuit returns without recompute
        assert len(training_prep_partitioned(sf, a)) == 8


def test_image_curation_resume_byte_identical(ray_session):
    """Curated-image shard writing crashes after 3 shards; the
    re-submitted run skips them and the final output is byte-identical
    to an uninterrupted run."""
    import pytest

    from s2geometry_ray.state.manifests import (
        finished_partitions,
        image_curation_partitioned,
        read_output,
    )

    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        a = os.path.join(tmp, "crashy")
        b = os.path.join(tmp, "clean")
        with pytest.raises(RuntimeError, match="simulated crash"):
            image_curation_partitioned(a, n_images=120, fail_after=3)
        assert len(finished_partitions(a)) == 3
        done_a = image_curation_partitioned(a, n_images=120)   # resume
        done_b = image_curation_partitioned(b, n_images=120)   # fresh
        assert {k: m["fingerprint"] for k, m in done_a.items()} \
            == {k: m["fingerprint"] for k, m in done_b.items()}
        ta = read_output(a)
        assert ta.equals(read_output(b))
        assert ta.num_rows > 0


def test_rasterize_crash_resume_identical(tmp_path, ray_session):
    """O51 atlas render: crash after 2 tiles, resume, byte-identical
    output with no recomputation of finished tiles (round-5: manifest
    resume extended to the geo family)."""
    from s2geometry_ray.state.manifests import rasterize_partitioned

    full_dir = str(tmp_path / "full")
    crash_dir = str(tmp_path / "crash")
    done = rasterize_partitioned(SF, full_dir)
    assert len(done) >= 3  # several occupied gate tiles at sf0.001

    with pytest.raises(RuntimeError, match="simulated crash"):
        rasterize_partitioned(SF, crash_dir, fail_after=2)
    assert len(finished_partitions(crash_dir)) == 2

    mtimes_before = {
        n: os.path.getmtime(m["path"])
        for n, m in finished_partitions(crash_dir).items()
    }
    done2 = rasterize_partitioned(SF, crash_dir)
    assert len(done2) == len(done)
    for n, t0 in mtimes_before.items():
        assert os.path.getmtime(done2[n]["path"]) == t0, f"{n} was recomputed"
    assert _output_bytes(crash_dir) == _output_bytes(full_dir)


def test_trajectory_crash_resume_identical(tmp_path, ray_session):
    """O53 trajectory distances: crash after 3 shards, resume,
    byte-identical (whole users per shard, exact-integer sums)."""
    from s2geometry_ray.state.manifests import trajectory_partitioned

    full_dir = str(tmp_path / "full")
    crash_dir = str(tmp_path / "crash")
    done = trajectory_partitioned(SF, full_dir, num_shards=6)
    assert len(done) == 6

    with pytest.raises(RuntimeError, match="simulated crash"):
        trajectory_partitioned(SF, crash_dir, num_shards=6, fail_after=3)
    assert len(finished_partitions(crash_dir)) == 3

    done2 = trajectory_partitioned(SF, crash_dir, num_shards=6)
    assert len(done2) == 6
    assert _output_bytes(crash_dir) == _output_bytes(full_dir)
    # fully-finished fast path: a third call skips the recompute
    done3 = trajectory_partitioned(SF, crash_dir, num_shards=6)
    assert done3.keys() == done2.keys()
