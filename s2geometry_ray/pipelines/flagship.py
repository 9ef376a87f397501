"""Flagship geospatial pipelines over the test tables.

Points = the events table with deterministic geotags derived from
event_id (sources/geotag.py — SQL twins keep DuckDB bit-comparable).
Tiles = 25 rect tiles derived from nation keys.  The join itself runs
the full S2 machinery: leaf cell assignment → covering table →
broadcast probe → interior accept / boundary exact test
(SURVEY.md §4.1–§4.2); the SQL oracle checks the OUTPUT with plain
interval predicates, so any covering/cell-id bug shows up as a row
mismatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from s2geometry_ray.functions.sqlnum import half_even_sql

from s2geometry_ray.sources.geotag import (
    derive_lat,
    derive_lng,
    derive_lat_sql,
    derive_lng_sql,
    tile_bounds_sql,
)
from s2geometry_ray.stages.cell_assign import make_geotag_and_assign
from s2geometry_ray.stages.spatial_join import (
    CoveringIndex,
    make_spatial_join_fn,
    tiles_from_keys,
)

JOIN_LEVEL = 8  # covering max level for gate tiles (~0.6° cells)


def _points_ds(sf_dir: str, key_col: str = "event_id",
               extra_cols: tuple[str, ...] = ()):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=[key_col, *extra_cols])
    return ds.map_batches(make_geotag_and_assign(key_col, levels=(JOIN_LEVEL,)),
                          batch_format="pyarrow", batch_size=None)


def _nation_tiles(sf_dir: str):
    keys = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    k = keys["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    tiles = tiles_from_keys(k)
    # integer tile ids so the SQL twin is a plain int column
    return [(int(t[0].removeprefix("tile")), t[1]) for t in tiles]


def _join_ds(sf_dir: str, keep_cols: list[str], mode: str = "join"):
    import ray

    tiles = _nation_tiles(sf_dir)
    index = CoveringIndex.build(tiles, max_cells=64, max_level=14)
    index_ref = ray.put(index)
    pts = _points_ds(sf_dir, extra_cols=tuple(c for c in keep_cols
                                              if c not in ("event_id",)))
    return pts.map_batches(
        make_spatial_join_fn(index_ref, keep_cols, mode=mode),
        batch_format="pyarrow",
        batch_size=None,
    )


def spatial_join_rect(sf_dir: str):
    """→ (event_id, tile_key) exact point-in-tile join rows."""
    out = _join_ds(sf_dir, ["event_id"])
    return out.map_batches(
        lambda t: t.rename_columns(["event_id", "tile_key"]),
        batch_format="pyarrow",
        batch_size=None,
    )


def spatial_join_sql() -> str:
    lat = derive_lat_sql("e.event_id")
    lng = derive_lng_sql("e.event_id")
    b = tile_bounds_sql("n.n_nationkey")
    return f"""
SELECT CAST(e.event_id AS BIGINT) AS event_id,
       CAST(n.n_nationkey AS BIGINT) AS tile_key
FROM events e, nation n
WHERE {lat} BETWEEN {b['lat_lo']} AND {b['lat_hi']}
  AND {lng} BETWEEN {b['lng_lo']} AND {b['lng_hi']}
"""


def tile_assign_counts(sf_dir: str):
    """Per-tile counts + value cents (two-phase pre-aggregated groupby)."""
    joined = _join_ds(sf_dir, ["event_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["value"].to_numpy(zero_copy_only=False) * 100
                         ).astype(np.int64)
        df = pd.DataFrame({"tile_key": batch["tile_id"].to_numpy(zero_copy_only=False),
                           "cents": cents})
        g = df.groupby("tile_key", as_index=False).agg(
            n=("cents", "size"), value_cents=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from s2geometry_ray.stages.tile_assign import combine_partials

    partials = joined.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return combine_partials(partials, "tile_key",
                            {"n": "sum", "value_cents": "sum"})


def tile_assign_counts_sql() -> str:
    lat = derive_lat_sql("e.event_id")
    lng = derive_lng_sql("e.event_id")
    b = tile_bounds_sql("n.n_nationkey")
    return f"""
SELECT CAST(n.n_nationkey AS BIGINT) AS tile_key,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM({half_even_sql('e.value * 100')}) AS BIGINT) AS value_cents
FROM events e, nation n
WHERE {lat} BETWEEN {b['lat_lo']} AND {b['lat_hi']}
  AND {lng} BETWEEN {b['lng_lo']} AND {b['lng_hi']}
GROUP BY n.n_nationkey
"""


def points_not_in_any_tile(sf_dir: str):
    """Anti-join: events matching no tile (broadcast negative filter, O15)."""
    out = _join_ds(sf_dir, ["event_id"], mode="anti")
    return out.select_columns(["event_id"])


def points_not_in_any_tile_sql() -> str:
    lat = derive_lat_sql("e.event_id")
    lng = derive_lng_sql("e.event_id")
    b = tile_bounds_sql("n.n_nationkey")
    return f"""
SELECT CAST(e.event_id AS BIGINT) AS event_id
FROM events e
WHERE NOT EXISTS (
  SELECT 1 FROM nation n
  WHERE {lat} BETWEEN {b['lat_lo']} AND {b['lat_hi']}
    AND {lng} BETWEEN {b['lng_lo']} AND {b['lng_hi']})
"""


def cell_assign_events(sf_dir: str):
    """Engine-only (no SQL twin): leaf cell ids + prefix + token for every
    event point; correctness is carried by the pytest oracle instead."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    out = ds.map_batches(
        make_geotag_and_assign("event_id", levels=(8, 12), with_token=True),
        batch_format="pyarrow",
        batch_size=None,
    )
    return out.select_columns(["event_id", "cell_id", "cell_l8", "cell_l12", "token"])


def covering_tiles(sf_dir: str):
    """Engine-only: the exploded covering table for the gate tiles."""
    tiles = _nation_tiles(sf_dir)
    index = CoveringIndex.build(tiles, max_cells=64, max_level=14)
    n = len(index.tile_idx)
    cells = np.concatenate([c for _, c, _ in index.by_level]) if n else np.array([], dtype=np.uint64)
    # reconstruct flat order from by_level rows
    rows = np.concatenate([r for _, _, r in index.by_level]) if n else np.array([], dtype=np.int64)
    order = np.argsort(rows, kind="stable")
    cells = cells[order]
    lsb = cells & (~cells + np.uint64(1))
    tbl = pa.table({
        "tile_key": pa.array(np.asarray([index.tile_ids[i] for i in index.tile_idx],
                                        dtype=np.int64)),
        "cell_id": pa.array(cells, type=pa.uint64()),
        "range_min": pa.array(cells - (lsb - np.uint64(1)), type=pa.uint64()),
        "range_max": pa.array(cells + (lsb - np.uint64(1)), type=pa.uint64()),
        "interior": pa.array(index.interior),
    })
    return tbl


def knn_events(sf_dir: str, k: int = 10, level: int | None = None):
    """kNN: supplier-derived queries against event points (O8)."""
    from s2geometry_ray.stages.knn import knn

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    qk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    pts = _points_ds(sf_dir)
    return knn(pts, qk, derive_lat(qk), derive_lng(qk), k, "event_id",
               leaf_col="cell_id", level=level)


def knn_events_sql(k: int = 10) -> str:
    qlat = derive_lat_sql("s_suppkey")
    qlng = derive_lng_sql("s_suppkey")
    plat = derive_lat_sql("event_id")
    plng = derive_lng_sql("event_id")
    return f"""
WITH q AS (
  SELECT s_suppkey AS query_id,
         cos(radians({qlat})) * cos(radians({qlng})) AS qx,
         cos(radians({qlat})) * sin(radians({qlng})) AS qy,
         sin(radians({qlat})) AS qz
  FROM supplier),
p AS (
  SELECT event_id,
         cos(radians({plat})) * cos(radians({plng})) AS px,
         cos(radians({plat})) * sin(radians({plng})) AS py,
         sin(radians({plat})) AS pz
  FROM events),
d AS (
  SELECT q.query_id, p.event_id,
         (p.px - q.qx) * (p.px - q.qx) + (p.py - q.qy) * (p.py - q.qy)
         + (p.pz - q.qz) * (p.pz - q.qz) AS dist2
  FROM q, p)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(event_id AS BIGINT) AS event_id
FROM (SELECT query_id, event_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist2, event_id) AS rn
      FROM d)
WHERE rn <= {k}
"""


def flagship(sf_dir: str):
    """entry() pipeline: geotag → cell assign → S2 spatial join → per-tile
    stats.  Returns a small aggregated Dataset."""
    return tile_assign_counts(sf_dir)


def spatial_join_rect_hash(sf_dir: str):
    """Same join as spatial_join_rect through the SHUFFLE plan
    (Ray-native hash join on the level-8 Hilbert prefix, rect geometry
    inlined in the covering rows — the no-broadcast fallback for
    unbounded tile counts).  Gate-checked against the same SQL."""
    from s2geometry_ray.stages.spatial_join import spatial_join_hash_plan

    import pyarrow.parquet as pq2

    tiles = _nation_tiles(sf_dir)
    pts = _points_ds(sf_dir)
    n_events = pq2.read_metadata(f"{sf_dir}/events.parquet").num_rows
    out = spatial_join_hash_plan(pts, tiles, join_level=JOIN_LEVEL,
                                 keep_cols=("event_id",),
                                 n_rows_hint=n_events)
    return out


WRAP_TILES_DEG = {
    900: (-30.0, 20.0, 160.0, -150.0),   # crosses the antimeridian
    901: (40.0, 70.0, -20.0, 30.0),      # ordinary rect
    902: (-89.0, -60.0, -180.0, 180.0),  # full-longitude polar band
}


def spatial_join_wrap(sf_dir: str):
    """Antimeridian coverage: the broadcast covering join against a
    ±180°-wrapping rect, an ordinary rect, and a full-longitude polar
    band — the S1Interval wrap semantics (pytest-covered since round 1)
    promoted to a value-exact gate.  The SQL twin spells the wrap as
    ``lng >= lo OR lng <= hi``."""
    import ray

    from s2geometry_ray.kernels.regions import RectRegion
    from s2geometry_ray.stages.spatial_join import (CoveringIndex,
                                                    make_spatial_join_fn)

    tiles = [(k, RectRegion.from_degrees(*b))
             for k, b in WRAP_TILES_DEG.items()]
    index_ref = ray.put(CoveringIndex.build(tiles, max_cells=64,
                                            max_level=10))
    out = _points_ds(sf_dir).map_batches(
        make_spatial_join_fn(index_ref, ["event_id"]),
        batch_format="pyarrow", batch_size=None)
    return out.map_batches(
        lambda t: t.rename_columns(["event_id", "tile_key"]),
        batch_format="pyarrow", batch_size=None)


def spatial_join_wrap_sql() -> str:
    lat = derive_lat_sql("event_id")
    lng = derive_lng_sql("event_id")
    arms = []
    for k, (a, b, c, d) in WRAP_TILES_DEG.items():
        if c > d:
            lngp = f"({lng} >= {c!r} OR {lng} <= {d!r})"
        else:
            lngp = f"{lng} BETWEEN {c!r} AND {d!r}"
        arms.append(f"""
SELECT CAST(event_id AS BIGINT) AS event_id, CAST({k} AS BIGINT) AS tile_key
FROM events WHERE {lat} BETWEEN {a!r} AND {b!r} AND {lngp}""")
    return " UNION ALL ".join(arms)
