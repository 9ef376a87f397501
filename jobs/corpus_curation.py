"""Job D — the composed corpus-curation pipeline with RESUMABLE
per-shard output (SURVEY.md §4.3 lifecycle):

    ray job submit -- python jobs/corpus_curation.py \
        --sf /root/testdata/sf0.01 --out /tmp/curation_out

Quality filter → exact dedup → LSH+Jaccard near-dup components →
representative keep → deterministic shard assignment
(pipelines/analytics.corpus_curation_docs), then one manifest-tracked
partition per shard.  Killing the job mid-write and re-submitting
skips finished shards and reproduces byte-identical output
(tests/test_resume.py pins it).
"""

from __future__ import annotations

import argparse


def main() -> None:
    import jobs.common as C

    C.repo_on_path()
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    ray = C.ray_session(args.num_cpus)
    from s2geometry_ray.state.manifests import (
        corpus_curation_partitioned,
        read_output,
    )

    done = corpus_curation_partitioned(args.sf, args.out)
    total = sum(m["row_count"] for m in done.values())
    print(f"{len(done)} shards, {total} surviving docs in {args.out}")
    print(read_output(args.out).to_pandas().head())
    C.finish(ray)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
