"""Job E — decode + verify an images table (SURVEY.md §3.4 O11/O12).

    ray job submit -- python jobs/decode.py --input /tmp/images \
        --out /tmp/decoded [--boxes] [--concurrency 8]

Runs the decode actor pool (codec state per actor), recomputes and
verifies the perceptual hash per image (bit-exact for the lossless
codec set), optionally emits raster→vector bright-region boxes, and
writes the per-image feature table.
"""

from __future__ import annotations

import argparse


def main() -> None:
    import jobs.common as C

    C.repo_on_path()
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--boxes", action="store_true")
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    ray = C.ray_session(args.num_cpus)
    from s2geometry_ray.sources.io import read_table, write_table
    from s2geometry_ray.stages.decode import decode_stage

    ds = read_table(args.input)
    out = decode_stage(ds, concurrency=args.concurrency,
                       batch_size=args.batch_size, with_boxes=args.boxes)
    if args.boxes:
        # nested list column → keep parquet-friendly by exploding driver-free
        import pyarrow as pa

        def explode(batch: pa.Table) -> pa.Table:
            return batch.drop_columns(["boxes"]).append_column(
                "n_boxes", pa.array([len(b) for b in batch["boxes"].to_pylist()],
                                    type=pa.int64()))

        out = out.map_batches(explode, batch_format="pyarrow", batch_size=None)
    write_table(out, args.out)
    print(f"decoded features written to {args.out}")
    C.finish(ray)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
