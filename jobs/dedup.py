"""Job D — deduplication over a documents-shaped table.

    ray job submit -- python jobs/dedup.py --input /path/docs \
        --out /tmp/dedup --mode exact|minhash [--text-col text --key-col doc_id]

exact   → (key, n_copies) survivors (min key per distinct text)
minhash → candidate near-duplicate pairs (key_a, key_b)
"""

from __future__ import annotations

import argparse


def main() -> None:
    import jobs.common as C

    C.repo_on_path()
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", choices=["exact", "minhash"], default="exact")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--key-col", default="doc_id")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    ray = C.ray_session(args.num_cpus)
    from s2geometry_ray.sources.io import read_table, write_table

    ds = read_table(args.input)
    if args.mode == "exact":
        from s2geometry_ray.functions.dedup import exact_dedup_groups

        out = exact_dedup_groups(ds, text_col=args.text_col, key_col=args.key_col)
    else:
        from s2geometry_ray.functions.dedup import minhash_candidate_pairs

        out = minhash_candidate_pairs(ds, text_col=args.text_col,
                                      key_col=args.key_col)
    write_table(out, args.out)
    print(f"{args.mode} dedup written to {args.out}")
    C.finish(ray)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
