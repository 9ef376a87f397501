"""Job E — the composed training-prep pipeline with RESUMABLE
per-shard packed-sequence output:

    ray job submit -- python jobs/training_prep.py \
        --sf /root/testdata/sf0.01 --out /tmp/training_prep_out

normalize → decontaminate → domain cap → mixture resample → sequence
pack (pipelines/training_prep), then one manifest-tracked partition
per pack_id-range shard.  Killing the job mid-write and re-submitting
skips finished shards and reproduces byte-identical output.
"""

from __future__ import annotations

import argparse


def main() -> None:
    import jobs.common as C

    C.repo_on_path()
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    ray = C.ray_session(args.num_cpus)
    from s2geometry_ray.state.manifests import (
        read_output,
        training_prep_partitioned,
    )

    done = training_prep_partitioned(args.sf, args.out,
                                     num_shards=args.shards)
    total = sum(m["row_count"] for m in done.values())
    print(f"{len(done)} shards, {total} packed pieces in {args.out}")
    print(read_output(args.out).to_pandas().head())
    C.finish(ray)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
