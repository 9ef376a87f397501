"""O3 cell-assign stage: lat/lng → S2 cell id + prefix keys (SURVEY.md §3.4 O3).

A stateless, fully vectorized ``map_batches`` kernel: each Arrow batch
gains ``cell_id`` (leaf, uint64), one ``cell_l<K>`` column per requested
prefix level (THE partition/shuffle key for every downstream wide op —
Hilbert prefixes preserve spatial locality), and optionally a hex
``token``.  Zero-copy in (pyarrow batch → numpy views), Arrow out.

At 100 TB this stage is pure map parallelism: no shuffle, no state;
Ray fuses it with the read and with downstream map stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from s2geometry_ray.kernels import cellid as vk


def assign_cells(
    batch: pa.Table,
    lat_col: str = "lat",
    lng_col: str = "lng",
    levels: tuple[int, ...] = (8,),
    with_token: bool = False,
) -> pa.Table:
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lng = batch[lng_col].to_numpy(zero_copy_only=False)
    cid = vk.from_latlng(lat, lng)
    batch = batch.append_column("cell_id", pa.array(cid, type=pa.uint64()))
    for lvl in levels:
        batch = batch.append_column(
            f"cell_l{lvl}", pa.array(vk.parent(cid, lvl), type=pa.uint64())
        )
    if with_token:
        batch = batch.append_column("token", pa.array(vk.token(cid), type=pa.string()))
    return batch


def make_cell_assign(lat_col="lat", lng_col="lng", levels=(8,), with_token=False):
    """Bind parameters for ``ds.map_batches(fn, batch_format='pyarrow')``."""

    def _fn(batch: pa.Table) -> pa.Table:
        return assign_cells(batch, lat_col, lng_col, levels, with_token)

    return _fn


def derive_geotag_batch(batch: pa.Table, key_col: str) -> pa.Table:
    """Derive deterministic lat/lng from an integer key column (the gate's
    geotag source — see sources/geotag.py for the SQL twins)."""
    from s2geometry_ray.sources.geotag import derive_lat, derive_lng

    key = batch[key_col].to_numpy(zero_copy_only=False)
    batch = batch.append_column("lat", pa.array(derive_lat(key), type=pa.float64()))
    return batch.append_column("lng", pa.array(derive_lng(key), type=pa.float64()))


def make_geotag_and_assign(key_col: str, levels=(8,), with_token=False):
    def _fn(batch: pa.Table) -> pa.Table:
        return assign_cells(derive_geotag_batch(batch, key_col), "lat", "lng", levels, with_token)

    return _fn
