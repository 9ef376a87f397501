"""Scale-derived partitioning knobs.

Round-2 verdict flagged fixed partition constants (``num_parts=32``,
``num_partitions=8``) in the dedup/CC machinery: at 100× the data each
partition becomes a multi-GB pandas group.  Every wide stage now derives
its partition count from a row-count estimate with a per-partition row
target via :func:`derive_num_parts`.

The estimate comes from the cheapest honest source available:

- a caller-supplied ``n_rows_hint`` (preferred — e.g. the raw parquet
  row count, which Ray reads from file metadata without scanning), or
- ``Dataset.count()`` on an UNTRANSFORMED read (metadata-only), or
- the documented default when neither is available (callers deep inside
  a lazy pipeline must not call ``count()`` — it executes the upstream
  DAG, and AllToAll stages would re-execute it on the real run).
"""

from __future__ import annotations

import numpy as np


def derive_num_parts(n_rows: int | None, rows_per_part: int = 100_000,
                     lo: int = 8, hi: int = 1024, default: int = 32) -> int:
    """Partition count for a hash-partitioned groupby/map_groups stage.

    ``n_rows`` is the (estimated) row count of the stream being
    partitioned; ``rows_per_part`` the target rows per partition (sized
    so one partition's pandas frame stays well inside a worker heap).
    ``None`` → ``default`` (the documented legacy constant).
    """
    if n_rows is None:
        return default
    return int(np.clip(-(-int(n_rows) // rows_per_part), lo, hi))


def dataset_count_hint(ds) -> int | None:
    """Row count iff the dataset is a bare read (metadata-cheap); None
    when the plan has transforms (counting would execute them)."""
    try:
        # Ray 2.49: a fresh read's plan has no logical operators beyond
        # the Read; Dataset._plan._logical_plan.dag exposes it.
        dag = ds._plan._logical_plan.dag
        if type(dag).__name__ in ("Read", "InputData", "FromArrow",
                                  "FromPandas", "FromItems"):
            return ds.count()
    except Exception:
        pass
    return None
