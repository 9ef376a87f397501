"""Job G — vector→raster tile density atlas:

    ray job submit -- python jobs/rasterize.py \
        --sf /root/testdata/sf0.01 --out /tmp/density_atlas [--w 32 --h 32]

Runs the covering-broadcast spatial join, bins every joined point into
its tile's W×H pixel grid (exact integer counts — the gate-checked
surface), renders one grayscale PPM per tile through the engine codec,
and writes both tables: ``counts/`` (tile_key, px, py, n) and
``atlas/`` (tile_key, w, h, fmt, bytes).
"""

from __future__ import annotations

import argparse


def main() -> None:
    import jobs.common as C

    C.repo_on_path()
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--w", type=int, default=16)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--resumable", action="store_true",
                    help="write counts/ as per-tile manifest partitions "
                         "(a crashed run re-submits and skips finished "
                         "tiles, byte-identical)")
    args = ap.parse_args()

    ray = C.ray_session(args.num_cpus)
    from s2geometry_ray.pipelines.extras import rasterize_density_tiles
    from s2geometry_ray.sources.io import write_table
    from s2geometry_ray.stages.rasterize import density_images

    if args.resumable and (args.w, args.h) == (16, 16):
        import ray.data as rd

        from s2geometry_ray.state.manifests import (rasterize_partitioned,
                                                    read_output)

        rasterize_partitioned(args.sf, f"{args.out}/counts")
        counts = rd.from_arrow(read_output(f"{args.out}/counts"))
        write_table(density_images(counts, w=args.w, h=args.h),
                    f"{args.out}/atlas")
        print(f"resumable density counts + PPM atlas written to {args.out}")
        C.finish(ray)
        return

    counts = rasterize_density_tiles(args.sf, w=args.w, h=args.h) \
        .materialize()  # tiny by the pre-agg contract; consumed twice
    write_table(counts, f"{args.out}/counts")
    write_table(density_images(counts, w=args.w, h=args.h),
                f"{args.out}/atlas")
    print(f"density counts + PPM atlas written to {args.out}")
    C.finish(ray)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
