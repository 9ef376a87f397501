"""Job C — k nearest points to query locations (SURVEY.md §4.3).

    ray job submit -- python jobs/knn.py --points /tmp/images \
        --queries /tmp/queries.parquet --k 10 --out /tmp/knn \
        [--level 6 --rings 2]

Queries table: (query_id, lat, lng[, k]).  ``--level`` activates the
cell-pruned plan (exact via the admissible completeness guard + brute
fallback); default is the brute plan.
"""

from __future__ import annotations

import argparse


def main() -> None:
    import jobs.common as C

    C.repo_on_path()
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", required=True)
    ap.add_argument("--key-col", default="image_id")
    ap.add_argument("--level", type=int, default=None)
    ap.add_argument("--rings", type=int, default=2)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    ray = C.ray_session(args.num_cpus)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s2geometry_ray.sources.io import read_table, write_table
    from s2geometry_ray.stages.cell_assign import assign_cells
    from s2geometry_ray.stages.knn import knn

    q = pq.read_table(args.queries)
    pts = read_table(args.points)

    prep = C.make_points_prep(args.key_col)

    pts = pts.map_batches(prep, batch_format="pyarrow", batch_size=None)
    res = knn(pts,
              q["query_id"].to_numpy(zero_copy_only=False),
              q["lat"].to_numpy(zero_copy_only=False),
              q["lng"].to_numpy(zero_copy_only=False),
              args.k, args.key_col, leaf_col="cell_id",
              level=args.level, rings=args.rings, keep_dist=True)
    write_table(res, args.out)
    print(f"kNN results written to {args.out}")
    C.finish(ray)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
