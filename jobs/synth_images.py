"""Job A0 — generate the synthetic images table (SURVEY.md §3.4 O1).

    ray job submit -- python jobs/synth_images.py --n 100000 \
        --out /tmp/images --parallelism 64 [--no-bytes]

Writes partitioned Parquet (one file per block) so downstream jobs read
in parallel and a rerun can resume per file.
"""

from __future__ import annotations

import argparse


def main() -> None:
    import jobs.common as C

    C.repo_on_path()
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--parallelism", type=int, default=32)
    ap.add_argument("--no-bytes", action="store_true",
                    help="8-byte stub payloads (join-bench mode, FIXTURES.md)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    ray = C.ray_session(args.num_cpus)
    from s2geometry_ray.sources.io import write_table
    from s2geometry_ray.sources.synth import images_dataset

    ds = images_dataset(args.n, with_bytes=not args.no_bytes,
                        parallelism=args.parallelism)
    write_table(ds, args.out)
    print(f"wrote {args.n} images to {args.out}")
    C.finish(ray)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
