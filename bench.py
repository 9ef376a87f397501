"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N}

``--scaling`` reruns the headline set in two fresh processes
(num_cpus=8 and num_cpus=32) on the same input and reports both
wall times plus scaling efficiency = t8 / (t32 · 4) — the sandbox
proxy for the N-vs-4N-node cluster criterion (BASELINE.md).

Headline set (sf0.1 ≈ 600k-point fact table):
  spatial_join   — 600k lineitem-derived points × 25 rect tiles through
                   the covering broadcast join (plus exact refinement)
  tile_assign    — per-cell_l8 grouped stats with map-side pre-agg
  knn            — 1000 supplier queries, cell-pruned plan, k=10
  q1             — pricing-summary aggregate
  dedup_minhash  — MinHash-LSH candidate pairs over documents
  decode         — synthetic image decode actor pool (2000 images)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _pool() -> int:
    """Fixed actor-pool size leaving slack for read/reduce tasks (a pool
    that reserves every CPU starves the pipeline — verified deadlock)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, int(cpus * 3 // 4))


def _derive_points(sf_dir: str):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from s2geometry_ray.stages.cell_assign import assign_cells
    from s2geometry_ray.sources.geotag import derive_lat, derive_lng

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def geotag(t: pa.Table) -> pa.Table:
        key = (t["l_orderkey"].to_numpy(zero_copy_only=False) * 10
               + t["l_linenumber"].to_numpy(zero_copy_only=False))
        t = t.append_column("pt_key", pa.array(key, type=pa.int64()))
        t = t.append_column("lat", pa.array(derive_lat(key), type=pa.float64()))
        t = t.append_column("lng", pa.array(derive_lng(key), type=pa.float64()))
        return assign_cells(t, levels=(8,))

    return ds.map_batches(geotag, batch_format="pyarrow", batch_size=65536)


def bench_spatial_join(sf_dir: str) -> dict:
    import ray

    from s2geometry_ray.stages.spatial_join import (
        CoveringIndex, make_spatial_join_fn, tiles_from_keys)
    import numpy as np

    tiles = tiles_from_keys(np.arange(25))
    index = CoveringIndex.build(tiles, max_cells=64, max_level=14)
    ref = ray.put(index)
    pts = _derive_points(sf_dir)
    out = pts.map_batches(
        make_spatial_join_fn(ref, ["pt_key"]),
        batch_format="pyarrow",
        batch_size=65536,
    )
    n = out.count()
    return {"rows_out": n}


def bench_tile_assign(sf_dir: str) -> dict:
    from s2geometry_ray.stages.tile_assign import grouped_stats

    pts = _derive_points(sf_dir)
    out = grouped_stats(pts, "cell_l8", "l_quantity")
    return {"rows_out": out.count()}


def bench_knn(sf_dir: str) -> dict:
    import numpy as np
    import pyarrow.parquet as pq

    from s2geometry_ray.sources.geotag import derive_lat, derive_lng
    from s2geometry_ray.stages.knn import knn

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    qk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    pts = _derive_points(sf_dir)
    out = knn(pts, qk, derive_lat(qk), derive_lng(qk), 10, "pt_key",
              leaf_col="cell_id", level=4)
    return {"rows_out": out.count()}


def bench_q1(sf_dir: str) -> dict:
    from s2geometry_ray.pipelines.tpch import q1_pricing_summary

    return {"rows_out": q1_pricing_summary(sf_dir).count()}


def bench_dedup_minhash(sf_dir: str) -> dict:
    import ray.data as rd

    from s2geometry_ray.functions.dedup import minhash_candidate_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
    return {"rows_out": minhash_candidate_pairs(docs, concurrency=_pool()).count()}


def bench_decode(sf_dir: str) -> dict:
    del sf_dir
    from s2geometry_ray.sources.synth import images_dataset
    from s2geometry_ray.stages.decode import decode_stage

    ds = images_dataset(2000)
    out = decode_stage(ds, concurrency=_pool())
    n = out.count()
    return {"rows_out": n}


BENCHES = {
    "spatial_join": bench_spatial_join,
    "tile_assign": bench_tile_assign,
    "knn": bench_knn,
    "q1": bench_q1,
    "dedup_minhash": bench_dedup_minhash,
    "decode": bench_decode,
}


def run_all(sf_dir: str, num_cpus: int) -> dict:
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    # warm the page cache so we measure compute + shuffle, not first I/O
    _derive_points(sf_dir).count()

    queries = {}
    total = 0.0
    for name, fn in BENCHES.items():
        fn(sf_dir)  # untimed warm lap: spawns/imports workers & pools
        t0 = time.time()
        fn(sf_dir)
        dt = time.time() - t0
        queries[name] = round(dt, 3)
        total += dt
    ray.shutdown()
    return {
        "metric": "headline_pipelines_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        results = {}
        for n in (8, 32):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
            out = subprocess.run([sys.executable, __file__], env=env,
                                 capture_output=True, text=True, check=True).stdout
            results[n] = json.loads(out.strip().splitlines()[-1])
        t8, t32 = results[8]["value"], results[32]["value"]
        eff = (t8 / t32) / 4.0
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": round(eff, 3),
            "unit": "ratio",
            "sec_8cpu": t8,
            "sec_32cpu": t32,
            "queries_8": results[8]["queries"],
            "queries_32": results[32]["queries"],
            "sf": sf_dir,
        }))
        return
    print(json.dumps(run_all(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
