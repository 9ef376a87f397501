"""Job F — the composed image-curation pipeline with RESUMABLE
per-shard output:

    ray job submit -- python jobs/image_curation.py \
        --n 400 --out /tmp/image_curation_out

decode+verify → brightness filter → phash dedup → per-cell spatial cap
→ splitmix shard (pipelines/image_curation), then one manifest-tracked
partition per shard.  Killing the job mid-write and re-submitting
skips finished shards and reproduces byte-identical output.
"""

from __future__ import annotations

import argparse


def main() -> None:
    import jobs.common as C

    C.repo_on_path()
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    ray = C.ray_session(args.num_cpus)
    from s2geometry_ray.state.manifests import (
        image_curation_partitioned,
        read_output,
    )

    done = image_curation_partitioned(args.out, n_images=args.n)
    total = sum(m["row_count"] for m in done.values())
    print(f"{len(done)} shards, {total} curated images in {args.out}")
    print(read_output(args.out).to_pandas().head())
    C.finish(ray)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
