"""O16/O17 per-partition manifests: checkpointed, resumable output.

Contract (SURVEY.md §4.3): a job writes its output partitioned by a key
range (here: S2 prefix buckets or input-block ranges).  Each finished
partition gets

    <out_dir>/part-<name>/            the parquet rows (atomic rename)
    <out_dir>/_manifests/<name>.json  {partition, row_count, fingerprint}

Resume = list the manifest dir, skip finished partitions, recompute the
rest; a manifest is written only AFTER its data directory is renamed
into place, so a crash mid-write leaves a stale temp dir (ignored) and
no manifest — the partition simply reruns.  Output is deterministic per
partition, so a resumed run is byte-identical to an uninterrupted one
(verified in tests/test_resume.py).

This is resume-at-stage-boundary with per-partition granularity;
intra-run retries ride on Ray's lineage re-execution (documented
honestly per SURVEY.md §4.3).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def finished_partitions(out_dir: str) -> dict[str, dict]:
    """{partition_name: manifest} for every completed partition."""
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return {}
    out = {}
    for f in os.listdir(mdir):
        if f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                m = json.load(fh)
            out[m["partition"]] = m
    return out


def table_fingerprint(table: pa.Table, sort_keys: list[str]) -> str:
    """Order-insensitive content fingerprint (sorted by key columns)."""
    idx = pa.compute.sort_indices(
        table, sort_keys=[(k, "ascending") for k in sort_keys])
    table = table.take(idx)
    h = hashlib.blake2b(digest_size=16)
    for col in sorted(table.column_names):
        for chunk in table[col].chunks:
            h.update(str(chunk.to_pylist()).encode())
    return h.hexdigest()


def write_partition(out_dir: str, name: str, table: pa.Table,
                    sort_keys: list[str]) -> dict:
    """Atomically write one partition + its manifest; idempotent."""
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    part_dir = os.path.join(out_dir, f"part-{name}")
    tmp_dir = part_dir + ".tmp"
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)
    idx = pa.compute.sort_indices(
        table, sort_keys=[(k, "ascending") for k in sort_keys])
    table = table.take(idx)
    pq.write_table(table, os.path.join(tmp_dir, "data.parquet"))
    if os.path.isdir(part_dir):
        shutil.rmtree(part_dir)
    os.replace(tmp_dir, part_dir)
    manifest = {
        "partition": name,
        "row_count": table.num_rows,
        "fingerprint": table_fingerprint(table, sort_keys),
        "path": part_dir,
    }
    mpath = os.path.join(_manifest_dir(out_dir), f"{name}.json")
    with open(mpath + ".tmp", "w") as fh:
        json.dump(manifest, fh)
    os.replace(mpath + ".tmp", mpath)
    return manifest


def run_partitioned(out_dir: str, partitions: dict[str, "callable"],
                    sort_keys: list[str], fail_after: int | None = None
                    ) -> dict[str, dict]:
    """Execute ``partitions`` (name → fn() → pa.Table), skipping any with
    a manifest already on disk.  ``fail_after`` kills the run after N
    fresh partitions (resume tests).  Returns all manifests."""
    done = finished_partitions(out_dir)
    fresh = 0
    for name, fn in partitions.items():
        if name in done:
            continue
        if fail_after is not None and fresh >= fail_after:
            raise RuntimeError("simulated crash")
        done[name] = write_partition(out_dir, name, fn(), sort_keys)
        fresh += 1
    return done


def read_output(out_dir: str) -> pa.Table:
    done = finished_partitions(out_dir)
    tables = [pq.read_table(m["path"]) for _, m in sorted(done.items())]
    return pa.concat_tables(tables)


def spatial_join_partitioned(sf_dir: str, out_dir: str, num_buckets: int = 8,
                             fail_after: int | None = None):
    """The flagship join written as a resumable partitioned job: points are
    bucketed by hash(event_id) % B (each bucket is an independent read
    filter → join), one manifest per bucket.  At cluster scale each
    bucket is a separate Dataset fragment/key-range; the manifest layout
    is identical."""
    import pyarrow.dataset as pads
    import ray

    from s2geometry_ray.pipelines.flagship import _nation_tiles
    from s2geometry_ray.stages.cell_assign import assign_cells, derive_geotag_batch
    from s2geometry_ray.stages.spatial_join import CoveringIndex, SpatialJoinActor

    tiles = _nation_tiles(sf_dir)
    index = CoveringIndex.build(tiles, max_cells=64, max_level=14)
    actor = SpatialJoinActor(index, ["event_id"])

    def make_bucket_fn(b: int):
        def run() -> pa.Table:
            t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id"])
            key = t["event_id"].to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(key % num_buckets == b))
            t = assign_cells(derive_geotag_batch(t, "event_id"), levels=())
            out = actor(t)
            return out.rename_columns(["event_id", "tile_key"])

        return run

    parts = {f"b{b:03d}": make_bucket_fn(b) for b in range(num_buckets)}
    return run_partitioned(out_dir, parts, ["event_id", "tile_key"],
                           fail_after=fail_after)
