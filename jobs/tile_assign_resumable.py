"""Job A' — tile assignment as a RESUMABLE SHUFFLE (SURVEY.md §4.3).

    ray job submit -- python jobs/tile_assign_resumable.py \
        --sf /root/testdata/sf0.01 --out /tmp/tile_resume

Two checkpointed stages with per-partition manifests: map (input
fragment → bucketed pre-aggregated partials) and reduce (bucket →
final per-tile aggregate).  Killing the job in either stage and
re-submitting resumes without recomputing finished partitions and
produces byte-identical output (tests/test_resume.py pins it).
"""

from __future__ import annotations

import argparse


def main() -> None:
    import jobs.common as C

    C.repo_on_path()
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-map", type=int, default=8)
    ap.add_argument("--num-buckets", type=int, default=4)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    ray = C.ray_session(args.num_cpus)
    from s2geometry_ray.state.manifests import (read_output,
                                                tile_assign_partitioned)

    done = tile_assign_partitioned(args.sf, args.out, num_map=args.num_map,
                                   num_buckets=args.num_buckets)
    total = sum(m["row_count"] for m in done.values())
    print(f"{len(done)} reduce partitions, {total} tile rows in {args.out}")
    print(read_output(f"{args.out}/reduce").to_pandas().head())
    C.finish(ray)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
