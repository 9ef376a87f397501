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
  knn            — 100 supplier queries, cell-pruned plan (level 6), k=10
  q1             — pricing-summary aggregate
  dedup_minhash  — MinHash-LSH candidate pairs over documents
  decode         — synthetic image decode actor pool (8000 images)
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


def _derive_points(sf_dir: str, replicate: int = 1):
    """Geotagged point table; ``replicate=R`` expands each input row to R
    distinct points (key-offset copies) so the benchmark can load the
    machine at a chosen scale without extra input files."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from s2geometry_ray.stages.cell_assign import assign_cells
    from s2geometry_ray.sources.geotag import derive_lat, derive_lng

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def geotag(t: pa.Table) -> pa.Table:
        base = (t["l_orderkey"].to_numpy(zero_copy_only=False) * 10
                + t["l_linenumber"].to_numpy(zero_copy_only=False))
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        if replicate > 1:
            offs = (np.arange(replicate, dtype=np.int64) * 6_100_003)[:, None]
            key = (base[None, :] + offs).reshape(-1)
            qty = np.tile(qty, replicate)
        else:
            key = base
        out = pa.table({
            "pt_key": pa.array(key, type=pa.int64()),
            "l_quantity": pa.array(qty),
            "lat": pa.array(derive_lat(key), type=pa.float64()),
            "lng": pa.array(derive_lng(key), type=pa.float64()),
        })
        return assign_cells(out, levels=(8,))

    # ~0.5M output rows per task: few hundred tasks total so the
    # single-threaded driver's task-submission loop never binds
    return ds.map_batches(geotag, batch_format="pyarrow",
                          batch_size=(524288 // replicate) if replicate > 1 else 65536)


def bench_spatial_join(sf_dir: str, scale: int = 1) -> dict:
    import ray

    from s2geometry_ray.stages.spatial_join import (
        CoveringIndex, make_spatial_join_fn, tiles_from_keys)
    import numpy as np

    tiles = tiles_from_keys(np.arange(25))
    index = CoveringIndex.build(tiles, max_cells=64, max_level=14)
    ref = ray.put(index)
    pts = _derive_points(sf_dir, replicate=scale)
    out = pts.map_batches(
        make_spatial_join_fn(ref, ["pt_key"]),
        batch_format="pyarrow",
        batch_size=65536,
    )
    n = out.count()
    return {"rows_out": n}


def bench_tile_assign(sf_dir: str, scale: int = 1) -> dict:
    from s2geometry_ray.stages.tile_assign import grouped_stats

    pts = _derive_points(sf_dir, replicate=scale)
    out = grouped_stats(pts, "cell_l8", "l_quantity")
    return {"rows_out": out.count()}


def bench_knn(sf_dir: str, scale: int = 1) -> dict:
    import numpy as np
    import pyarrow.parquet as pq

    from s2geometry_ray.sources.geotag import derive_lat, derive_lng
    from s2geometry_ray.stages.knn import knn

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    qk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)[:min(400, 100 * scale)]
    pts = _derive_points(sf_dir, replicate=scale)
    out = knn(pts, qk, derive_lat(qk), derive_lng(qk), 10, "pt_key",
              leaf_col="cell_id", level=6, rings=3)
    return {"rows_out": out.count()}


def bench_q1(sf_dir: str, scale: int = 1) -> dict:
    from s2geometry_ray.pipelines.tpch import q1_pricing_summary

    return {"rows_out": q1_pricing_summary(sf_dir).count()}


def bench_dedup_minhash(sf_dir: str, scale: int = 1) -> dict:
    import ray.data as rd

    from s2geometry_ray.functions.dedup import minhash_candidate_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
    if scale > 1:
        import pyarrow as pa

        def replicate(t: pa.Table) -> pa.Table:
            import numpy as np
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            texts = t["text"].to_pylist()
            out_ids, out_txt = [], []
            for r in range(scale):
                out_ids.append(ids + r * 1_000_003)
                out_txt.extend(f"{txt} v{r}" for txt in texts)
            return pa.table({"doc_id": pa.array(np.concatenate(out_ids)),
                             "text": pa.array(out_txt)})

        # documents.parquet is a single row group → one block; split it
        # so the signature actor pool actually runs in parallel
        docs = docs.map_batches(replicate, batch_format="pyarrow") \
                   .repartition(4 * _pool())
    # scheme='oph': the scale path (one-permutation hashing; see
    # functions/dedup.MinHasher).  BASELINE.md records both schemes.
    return {"rows_out": minhash_candidate_pairs(docs, concurrency=_pool(),
                                                scheme="oph").count()}


def bench_decode(sf_dir: str, scale: int = 1) -> dict:
    del sf_dir
    from s2geometry_ray.sources.synth import images_dataset
    from s2geometry_ray.stages.decode import decode_stage

    ds = images_dataset(3000 * scale, parallelism=max(16, 4 * scale))
    out = decode_stage(ds, concurrency=_pool())
    n = out.count()
    return {"rows_out": n}


def bench_flagship(sf_dir: str, scale: int = 1) -> dict:
    """The headline job, fused end-to-end: geotag → leaf cell assign →
    covering broadcast join → per-tile aggregate.  This is the pipeline
    the scaling criterion measures (rows/sec at two CPU counts)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from s2geometry_ray.stages.spatial_join import (
        CoveringIndex, make_spatial_join_fn, tiles_from_keys)
    from s2geometry_ray.stages.tile_assign import combine_partials

    import ray.data as rd

    from s2geometry_ray.sources.geotag import derive_lat, derive_lng
    from s2geometry_ray.stages.broadcast import get_broadcast
    from s2geometry_ray.stages.cell_assign import assign_cells

    tiles = tiles_from_keys(np.arange(25))
    index = CoveringIndex.build(tiles, max_cells=64, max_level=14)
    ref = ray.put(index)
    join_fn = make_spatial_join_fn(ref, ["pt_key", "l_quantity"])

    def fused(t: pa.Table) -> pa.Table:
        # geotag -> leaf cell assign -> covering join -> per-tile partial,
        # in ONE task: no intermediate blocks through the object store.
        base = (t["l_orderkey"].to_numpy(zero_copy_only=False) * 10
                + t["l_linenumber"].to_numpy(zero_copy_only=False))
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        if scale > 1:
            offs = (np.arange(scale, dtype=np.int64) * 6_100_003)[:, None]
            key = (base[None, :] + offs).reshape(-1)
            qty = np.tile(qty, scale)
        else:
            key = base
        pts = pa.table({
            "pt_key": pa.array(key, type=pa.int64()),
            "l_quantity": pa.array(qty),
            "lat": pa.array(derive_lat(key), type=pa.float64()),
            "lng": pa.array(derive_lng(key), type=pa.float64()),
        })
        joined = join_fn(assign_cells(pts, levels=()))
        df = pd.DataFrame({
            "tile_key": joined["tile_id"].to_numpy(zero_copy_only=False),
            "q": joined["l_quantity"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby("tile_key", as_index=False).agg(n=("q", "size"), s=("q", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber", "l_quantity"])
    partials = ds.map_batches(fused, batch_format="pyarrow",
                              batch_size=(524288 // scale) if scale > 1 else 65536)
    out = combine_partials(partials, "tile_key", {"n": "sum", "s": "sum"})
    n_tiles = out.count()
    del get_broadcast
    return {"rows_out": n_tiles}


def bench_flagship_images(sf_dir: str, scale: int = 1) -> dict:
    """North-star headline: synthetic image table → decode actor work
    (bit-exact phash verify) → geotag → S2 cell assign → covering join →
    per-tile aggregate, fused per batch.  CPU-bound (codec work), so the
    8→32-CPU proxy reflects node-count scaling rather than single-box
    memory bandwidth (which caps the pure-numpy join kernels).
    ``scale`` = thousands of images."""
    del sf_dir
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data as rd

    from s2geometry_ray.kernels import codecs
    from s2geometry_ray.kernels.phash import phash64_i64
    from s2geometry_ray.sources.synth import derive_latlng, gen_image_row
    from s2geometry_ray.stages.cell_assign import assign_cells
    from s2geometry_ray.stages.spatial_join import (
        CoveringIndex, make_spatial_join_fn, tiles_from_keys)
    from s2geometry_ray.stages.tile_assign import combine_partials

    tiles = tiles_from_keys(np.arange(25))
    index = CoveringIndex.build(tiles, max_cells=64, max_level=14)
    ref = ray.put(index)
    join_fn = make_spatial_join_fn(ref, ["pt_key"])

    def fused(batch) -> pa.Table:
        ids = np.asarray(batch["id"])
        lats = np.empty(len(ids))
        lngs = np.empty(len(ids))
        keys = np.empty(len(ids), dtype=np.int64)
        for i, rid in enumerate(ids):
            row = gen_image_row(int(rid))          # synth: pixels + encode
            px = codecs.decode(row["bytes"], row["fmt"])   # decode actorwork
            assert int(phash64_i64(px)) == row["phash"]    # bit-exact verify
            la, ln = derive_latlng(row["image_id"])
            lats[i], lngs[i], keys[i] = la, ln, int(rid)
        pts = pa.table({
            "pt_key": pa.array(keys),
            "lat": pa.array(lats), "lng": pa.array(lngs),
        })
        joined = join_fn(assign_cells(pts, levels=()))
        df = pd.DataFrame({"tile_key": joined["tile_id"].to_numpy(zero_copy_only=False)})
        g = df.groupby("tile_key", as_index=False).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    n = 1000 * scale
    ds = rd.range(n, override_num_blocks=max(64, n // 1000))
    partials = ds.map_batches(fused, batch_format="numpy", batch_size=1000)
    out = combine_partials(partials, "tile_key", {"n": "sum"})
    return {"rows_out": out.count(), "images": n}


BENCHES = {
    "flagship_join": bench_flagship,
    "flagship_images": bench_flagship_images,
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

    scale = int(os.environ.get("GRAFT_BENCH_SCALE", "8"))
    # small warm lap: page cache + worker process spawn + imports
    for name, fn in BENCHES.items():
        fn(sf_dir, scale=1)

    want_stats = os.environ.get("GRAFT_BENCH_STATS")
    queries = {}
    total = 0.0
    import gc

    for name, fn in BENCHES.items():
        # housekeeping OUTSIDE the timed window: drop refs to the
        # previous pipeline's datasets so its actor pools / blocks
        # release before the next measurement starts
        gc.collect()
        time.sleep(0.5)
        t0 = time.time()
        fn(sf_dir, scale=scale)
        dt = time.time() - t0
        queries[name] = round(dt, 3)
        total += dt
    if want_stats:
        # per-stage ds.stats() breakdown for the record (BASELINE.md
        # protocol); goes to stderr so stdout stays one JSON line
        ds = _derive_points(sf_dir, replicate=scale)
        ds = ds.materialize()
        print(ds.stats(), file=sys.stderr)
    ray.shutdown()
    # the north rule's stated metric is spatial-join + tile-assignment
    # THROUGHPUT (rows/sec): input points per timed second
    import pyarrow.parquet as pq

    n_pts = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows * scale
    throughput = {
        name: round(n_pts / queries[name])
        for name in ("spatial_join", "tile_assign") if name in queries}
    return {
        "metric": "headline_pipelines_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "input_points": n_pts,
        "throughput_rows_per_sec": throughput,
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        # host memory-bandwidth state at measurement time (this VM swings
        # ~3× with hypervisor contention — BASELINE.md "Host-variance
        # calibration"; fast state ≈ 0.5–0.9 s, degraded ≥ 1.8 s)
        "host_probe_u64_add_sec": _host_probe(),
    }


def _host_probe() -> float:
    import numpy as np

    x = np.arange(12_000_000, dtype=np.uint64)
    y = x.copy()
    t0 = time.time()
    for _ in range(10):
        x + y
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--job" in sys.argv:  # single-job mode (BASELINE.md protocol)
        import logging

        import ray

        job = sys.argv[sys.argv.index("--job") + 1]
        fn = BENCHES[job]
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
        logging.getLogger("ray.data").setLevel(logging.ERROR)
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        scale = int(os.environ.get("GRAFT_BENCH_SCALE", "8"))
        fn(sf_dir, scale=1)  # warm lap
        t0 = time.time()
        r = fn(sf_dir, scale=scale)
        dt = time.time() - t0
        ray.shutdown()
        print(json.dumps({"metric": f"{job}_wall_sec", "value": round(dt, 3),
                          "unit": "sec", "detail": r, "sf": sf_dir,
                          "num_cpus": num_cpus}))
        return
    if "--stats" in sys.argv:
        # BASELINE.md protocol step 4: per-stage ds.stats() breakdown
        # for the record.  Usage: python bench.py --stats [query ...]
        import logging

        import ray

        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
        logging.getLogger("ray.data").setLevel(logging.ERROR)
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "entry", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "__ray_entry__.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        queries = mod.queries()
        names = [a for a in sys.argv[sys.argv.index("--stats") + 1:]
                 if not a.startswith("-")] or [
            "spatial_join_rect", "tile_assign_counts", "knn_events"]
        for name in names:
            res = queries[name](sf_dir)
            if hasattr(res, "materialize"):
                res = res.materialize()
                print(f"===== {name} =====")
                print(res.stats())
            else:
                print(f"===== {name} ===== (driver-side result; no stats)")
        ray.shutdown()
        return
    if "--scaling-child" in sys.argv:
        import logging

        import ray

        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
        logging.getLogger("ray.data").setLevel(logging.ERROR)
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        scale = int(os.environ.get("GRAFT_SCALING_SCALE", "48"))
        join_scale = int(os.environ.get("GRAFT_SCALING_JOIN_SCALE", "96"))
        # warm lap sized to touch EVERY worker process (imports dominate
        # otherwise: 24 cold workers x ~1.5s import shows up in the timing)
        bench_flagship_images(sf_dir, scale=8)
        bench_flagship(sf_dir, scale=8)
        t0 = time.time()
        bench_flagship_images(sf_dir, scale=scale)
        dt_img = time.time() - t0
        t0 = time.time()
        bench_flagship(sf_dir, scale=join_scale)
        dt_join = time.time() - t0
        ray.shutdown()
        print(json.dumps({"sec": round(dt_img, 3), "images": 1000 * scale,
                          "join_sec": round(dt_join, 3),
                          "join_rows": 600_000 * join_scale,
                          "num_cpus": num_cpus}))
        return
    if "--scaling" in sys.argv:
        pair = os.environ.get("GRAFT_SCALING_CPUS", "2,8")
        lo, hi = (int(x) for x in pair.split(","))
        # Host bandwidth swings up to ~7x mid-measurement (BASELINE.md);
        # a pair whose two runs landed on different host states measures
        # the hypervisor, not the code.  Retry until the probes bracket
        # each child run coherently (<=1.35x spread), else keep the
        # most-coherent attempt — selection is by measurement VALIDITY
        # (probe spread), never by the resulting efficiency; every
        # attempt is reported raw in `attempts`.
        attempts = []
        max_tries = int(os.environ.get("GRAFT_SCALING_TRIES", "3"))
        for _ in range(max_tries):
            probes = [_host_probe()]
            results = {}
            for n in (lo, hi):
                env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
                out = subprocess.run(
                    [sys.executable, __file__, "--scaling-child"],
                    env=env, capture_output=True, text=True,
                    check=True).stdout
                results[n] = json.loads(out.strip().splitlines()[-1])
                probes.append(_host_probe())
            spread = max(probes) / min(probes)
            attempts.append((spread, probes, results))
            if spread <= 1.35:
                break
        spread, probes, results = min(attempts, key=lambda a: a[0])
        probe_before = probes[0]
        ratio = hi / lo
        t8, t32 = results[lo]["sec"], results[hi]["sec"]
        j8, j32 = results[lo]["join_sec"], results[hi]["join_sec"]
        imgs = results[hi]["images"]
        jrows = results[hi]["join_rows"]
        eff = (t8 / t32) / ratio
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": round(eff, 3),
            "unit": "ratio",
            "job": "flagship image pipeline (decode+verify+geotag+join+tile)",
            "cpus": [lo, hi],
            "images": imgs,
            "sec_lo": t8,
            "sec_hi": t32,
            "images_per_sec_lo": round(imgs / t8),
            "images_per_sec_hi": round(imgs / t32),
            "join_only": {
                "rows": jrows, "sec_lo": j8, "sec_hi": j32,
                "efficiency": round((j8 / j32) / ratio, 3),
                "note": "pure-numpy kernels saturate single-box memory "
                        "bandwidth past ~8 cores; a 4N-node cluster has "
                        "4x the memory buses (documented in BASELINE.md)",
            },
            "sf": sf_dir,
            # ~3x host bandwidth swing with hypervisor contention —
            # normalize cross-round comparisons by these (BASELINE.md)
            "host_probe_u64_add_sec": probes,
            "probe_spread": round(spread, 2),
            "attempts": [
                {"probe_spread": round(s, 2), "probes": p,
                 "sec_lo": r[lo]["sec"], "sec_hi": r[hi]["sec"],
                 "eff": round((r[lo]["sec"] / r[hi]["sec"]) / ratio, 3),
                 "join_eff": round(
                     (r[lo]["join_sec"] / r[hi]["join_sec"]) / ratio, 3)}
                for s, p, r in attempts],
        }))
        return
    print(json.dumps(run_all(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
