"""Job D — adaptive tiling: density-driven quadtree partition plan.

    ray job submit -- python jobs/adaptive_tiling.py \
        --points /tmp/images --min-level 2 --max-level 8 --cap 100000 \
        --out /tmp/tiling

Reads a point table, derives/attaches leaf cells, and writes the
coarsest multi-level cell set in which every cell holds <= cap points
(refinement stops at max_level) plus per-cell counts — the balanced
partition plan a downstream shuffle consumes as contiguous Hilbert key
ranges.  Uses the subtree-partitioned selection path (scale posture)
whenever the refinement can outgrow one block.
"""

from __future__ import annotations

import argparse


def main() -> None:
    import jobs.common as C

    C.repo_on_path()
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", required=True)
    ap.add_argument("--min-level", type=int, default=2)
    ap.add_argument("--max-level", type=int, default=8)
    ap.add_argument("--cap", type=int, default=100_000)
    ap.add_argument("--key-col", default="image_id")
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    ray = C.ray_session(args.num_cpus)
    from s2geometry_ray.sources.io import read_table, write_table
    from s2geometry_ray.stages.adaptive_tiling import adaptive_tiling

    pts = read_table(args.points)
    prep = C.make_points_prep(args.key_col, levels=())
    assigned = pts.map_batches(prep, batch_format="pyarrow", batch_size=None)
    # deep refinements outgrow the single-block contract → partitioned
    partitioned = args.max_level >= 10
    tiling = adaptive_tiling(assigned, args.min_level, args.max_level,
                             args.cap, partitioned=partitioned)
    write_table(tiling, f"{args.out}/tiling")
    print(f"adaptive tiling written to {args.out}/tiling "
          f"(partitioned={partitioned})")
    C.finish(ray)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
