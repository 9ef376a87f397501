"""Storage facade: Parquet now, Lance when available (one switch).

BASELINE.json names Lance as the primary table format; ``pylance`` is
not installed in this sandbox (SURVEY.md §0), so Parquet is the active
backend and the Lance path is feature-gated behind an import probe —
`ray.data.read_lance/write_lance` exist in Ray 2.49.2 and activate
automatically once the wheel is present (README "Known deviations").
"""

from __future__ import annotations

import importlib.util


def lance_available() -> bool:
    return importlib.util.find_spec("lance") is not None


def read_table(uri: str, columns: list[str] | None = None):
    import ray.data as rd

    if uri.endswith(".lance") or (lance_available() and uri.endswith(".lancedb")):
        return rd.read_lance(uri, columns=columns)
    return rd.read_parquet(uri, columns=columns)


def write_table(ds, uri: str, **kwargs):
    if uri.endswith(".lance"):
        if not lance_available():
            raise RuntimeError(
                "Lance output requested but pylance is not installed; "
                "use a parquet path (README: Known deviations)")
        return ds.write_lance(uri, **kwargs)
    return ds.write_parquet(uri, **kwargs)


def write_partitioned_by_cell(ds, out_dir: str, level: int = 4,
                              cell_col: str = "cell_id",
                              buckets: int | None = None):
    """Hive-partitioned parquet keyed by the S2 prefix (SURVEY.md
    'resumable output': one directory per key range, so a rerun or a
    downstream reader addresses finished partitions individually and
    Hilbert-prefix locality keeps spatially close rows in the same
    files).  ``buckets`` caps directory count by hashing the prefix."""
    import numpy as np
    import pyarrow as pa

    def add_part(batch: pa.Table) -> pa.Table:
        from s2geometry_ray.kernels import cellid as vk

        cid = batch[cell_col].to_numpy(zero_copy_only=False)
        prefix = vk.parent(cid.astype(np.uint64), level)
        if buckets:
            # cell ids have all-zero low bits below their lsb — hash
            # before bucketing or every prefix lands in bucket 0
            from s2geometry_ray.stages.tile_assign import _hash64

            prefix = (_hash64(prefix) % np.uint64(buckets)).astype(np.int64)
        else:
            prefix = prefix.view(np.int64)
        return batch.append_column("cell_part", pa.array(prefix))

    with_part = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
    with_part.write_parquet(out_dir, partition_cols=["cell_part"])
