"""Shared job scaffolding: Ray session guard + argparse defaults.

Each job module is `ray job submit`-compatible: a plain script whose
``main()`` owns the Ray session (guarded — inside a cluster submission
Ray is already initialised and the guard is a no-op).
"""

from __future__ import annotations

import sys


def ray_session(num_cpus: int | None = None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def finish(ray) -> None:
    ray.shutdown()


def repo_on_path() -> None:
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if here not in sys.path:
        sys.path.insert(0, here)


def make_points_prep(key_col: str, levels: tuple = (), with_token: bool = False):
    """Shared job-side prep: derive geotags when absent (synthetic images
    key convention) and assign leaf + prefix cells."""
    import pyarrow as pa

    from s2geometry_ray.stages.cell_assign import assign_cells

    def prep(batch: pa.Table) -> pa.Table:
        if "lat" not in batch.column_names:
            if pa.types.is_integer(batch[key_col].type):
                # integer keys (events/lineitem convention): the
                # vectorized modular geotag with a bit-exact SQL twin
                import numpy as np

                from s2geometry_ray.sources.geotag import derive_lat, derive_lng

                k = batch[key_col].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                lats, lngs = derive_lat(k), derive_lng(k)
            else:
                # string image ids: the synthetic-images sha256 convention
                from s2geometry_ray.sources.synth import derive_latlng

                lats, lngs = zip(*(derive_latlng(i) for i in
                                   batch[key_col].to_pylist()))
            batch = batch.append_column("lat", pa.array(lats, type=pa.float64()))
            batch = batch.append_column("lng", pa.array(lngs, type=pa.float64()))
        return assign_cells(batch.select([key_col, "lat", "lng"]),
                            levels=levels, with_token=with_token)

    return prep
