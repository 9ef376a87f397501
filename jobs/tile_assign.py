"""Job A — cell indexing + tile assignment (SURVEY.md §4.1).

    ray job submit -- python jobs/tile_assign.py \
        --points /tmp/images --level 8 --out /tmp/assignments

Derives/reads geotags, assigns leaf + level-K prefix cells, and writes
(1) the per-point assignment table and (2) per-cell grouped stats
computed with map-side pre-aggregation (the two-shuffle plan of
SURVEY.md §4.1 collapses to partial+bounded-combine because the
aggregate is algebraic; the salted path is exercised by
``tile_assign_salted`` in the driver gate).
"""

from __future__ import annotations

import argparse


def main() -> None:
    import jobs.common as C

    C.repo_on_path()
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", required=True)
    ap.add_argument("--level", type=int, default=8)
    ap.add_argument("--out", required=True)
    ap.add_argument("--key-col", default="image_id")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    ray = C.ray_session(args.num_cpus)
    import pyarrow as pa

    from s2geometry_ray.sources.io import read_table, write_table
    from s2geometry_ray.stages.cell_assign import assign_cells
    from s2geometry_ray.stages.tile_assign import grouped_stats

    pts = read_table(args.points)

    prep = C.make_points_prep(args.key_col, levels=(args.level,), with_token=True)

    assigned = pts.map_batches(prep, batch_format="pyarrow", batch_size=None)
    write_table(assigned, f"{args.out}/assignments")
    stats = grouped_stats(assigned, f"cell_l{args.level}")
    write_table(stats, f"{args.out}/cell_stats")
    print(f"assignments + cell stats written to {args.out}")
    C.finish(ray)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
