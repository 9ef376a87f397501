"""Job B — spatial join: points-in-tiles (SURVEY.md §4.2).

    ray job submit -- python jobs/spatial_join.py \
        --points /tmp/images --tiles /tmp/tiles.parquet \
        --out /tmp/join_rows

Points input: a table with either (lat, lng) columns or an ``image_id``
whose geotag derives deterministically (synthetic images table).  Tiles
input: the FIXTURES tiles schema (rect/polygon/cap).  The covering
table is built once (parallelizable over tiles), broadcast via
``ray.put``, and the join streams with zero point-side shuffle.
Output: partitioned parquet of (point key, tile_id).  For the
checkpoint/resume variant (per-partition manifests, crash-safe,
byte-identical resume) see state/manifests.spatial_join_partitioned —
exercised by tests/test_resume.py.
"""

from __future__ import annotations

import argparse


def main() -> None:
    import jobs.common as C

    C.repo_on_path()
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", required=True)
    ap.add_argument("--tiles", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--key-col", default="image_id")
    ap.add_argument("--max-cells", type=int, default=64)
    ap.add_argument("--max-level", type=int, default=14)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    ray = C.ray_session(args.num_cpus)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s2geometry_ray.sources.io import read_table, write_table
    from s2geometry_ray.sources.tiles import regions_from_table
    from s2geometry_ray.stages.cell_assign import assign_cells
    from s2geometry_ray.stages.spatial_join import (
        build_covering_distributed, make_spatial_join_fn)

    tiles_tbl = pq.read_table(args.tiles)
    regions = regions_from_table(tiles_tbl)
    # Ray-parallel covering build (the driver loop is the bottleneck at
    # job-scale tile counts; pytest pins it equal to the driver build)
    index = build_covering_distributed(regions, max_cells=args.max_cells,
                                       max_level=args.max_level)
    ref = ray.put(index)

    pts = read_table(args.points)
    cols = set(pts.schema().names)

    prep = C.make_points_prep(args.key_col)

    assert args.key_col in cols, f"{args.key_col} not in {cols}"
    joined = pts.map_batches(prep, batch_format="pyarrow", batch_size=None) \
        .map_batches(make_spatial_join_fn(ref, [args.key_col]),
                     batch_format="pyarrow", batch_size=None)
    write_table(joined, args.out)
    print(f"join rows written to {args.out}")
    C.finish(ray)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
