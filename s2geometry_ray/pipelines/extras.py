"""Additional operator-coverage pipelines: distinct, sessionization
(streaming-shaped), Ray-native hash join, salted tile assignment,
decode / raster→vector / phash-banding over the synthetic images table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from s2geometry_ray.functions.sqlnum import half_even_sql


def distinct_event_types(sf_dir: str):
    """Distinct values via partial-unique + bounded combine (the
    ds.unique() operator re-expressed without a full shuffle — event
    types are a bounded enum)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])

    def uniq(batch: pa.Table) -> pa.Table:
        vals = np.unique(np.asarray(batch["event_type"]))
        return pa.table({"event_type": pa.array(vals.tolist(), type=pa.string())})

    partial = ds.map_batches(uniq, batch_format="pyarrow", batch_size=None).materialize()
    return partial.repartition(1).map_batches(uniq, batch_format="pyarrow",
                                              batch_size=None)


DISTINCT_EVENT_TYPES_SQL = "SELECT DISTINCT event_type FROM events"

_SESSION_GAP_US = 1_800_000_000  # 30 minutes


def sessionize_events(sf_dir: str):
    """Session windows per user (streaming-shaped workload → sorted
    per-group pandas, SURVEY.md §3.6 policy): a session breaks when the
    gap to the previous event exceeds 30 min.  Output one row per
    session.  Partitioning assumption: all rows of a user fit one group
    (users are bounded); the shuffle key is user_id."""
    import pyarrow.parquet as pq

    from s2geometry_ray.scale import derive_num_parts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    # Partition by user-hash (few, large groups — one vectorized call per
    # partition, not one map_groups call per user), then detect session
    # breaks over the (user, ts)-sorted partition in one pass.  Partition
    # count ∝ input rows (parquet metadata, no scan) so a partition's
    # pandas frame stays bounded at any scale (round-3 verdict #3).
    n_rows = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    num_parts = derive_num_parts(n_rows, rows_per_part=100_000)

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array((uid % num_parts).astype(np.int64)))

    def partition_sessions(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        t = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        order = np.lexsort((t, uid))
        uid, t = uid[order], t[order]
        brk = np.ones(len(t), dtype=np.int64)
        brk[1:] = ((uid[1:] != uid[:-1])
                   | (t[1:] - t[:-1] > _SESSION_GAP_US)).astype(np.int64)
        sid = np.cumsum(brk)
        df = pd.DataFrame({"user_id": uid, "t": t, "sid": sid})
        out = df.groupby("sid", as_index=False).agg(
            user_id=("user_id", "first"), session_start=("t", "min"),
            n_events=("t", "size"))
        return out[["user_id", "session_start", "n_events"]]

    return ds.map_batches(add_part, batch_format="pyarrow", batch_size=None) \
        .groupby("part").map_groups(partition_sessions, batch_format="pandas")


SESSIONIZE_SQL = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
m AS (SELECT user_id, t,
             CASE WHEN LAG(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                   OR t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM e),
s AS (SELECT user_id, t,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM m)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(MIN(t) AS BIGINT) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid
"""


def order_priority_revenue(sf_dir: str):
    """Ray-native hash join (Dataset.join, explicit num_partitions) of
    lineitem ⋈ orders, then a bounded grouped aggregate."""
    import pyarrow.parquet as pq

    from s2geometry_ray.scale import derive_num_parts

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    # join partition count ∝ probe-side rows (parquet metadata, no scan)
    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    joined = li.join(orders, join_type="inner",
                     num_partitions=derive_num_parts(n_li,
                                                     rows_per_part=250_000),
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(batch: pa.Table) -> pa.Table:
        rev = np.round(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)) * 10000
        ).astype(np.int64)
        df = pd.DataFrame({"o_orderpriority": np.asarray(batch["o_orderpriority"]),
                           "rev": rev})
        g = df.groupby("o_orderpriority", as_index=False).agg(
            n=("rev", "size"), revenue_e4=("rev", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from s2geometry_ray.stages.tile_assign import combine_partials

    partials = joined.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return combine_partials(partials, "o_orderpriority",
                            {"n": "sum", "revenue_e4": "sum"})


ORDER_PRIORITY_REVENUE_SQL = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM({half_even_sql('l_extendedprice * (1 - l_discount) * 10000')}) AS BIGINT) AS revenue_e4
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def tile_assign_salted(sf_dir: str):
    """Same result as tile_assign_counts but through the O7 salted
    map_groups path (hot keys split by a sampled count sketch) —
    exactness of the salted plan is gate-checked against the same SQL."""
    from s2geometry_ray.pipelines.flagship import _join_ds
    from s2geometry_ray.stages.tile_assign import salted_map_groups

    joined = _join_ds(sf_dir, ["event_id", "value"])

    def add_cents(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["value"].to_numpy(zero_copy_only=False) * 100
                         ).astype(np.int64)
        return pa.table({
            "tile_key": batch["tile_id"],
            "event_id": batch["event_id"],
            "cents": pa.array(cents),
        })

    ds = joined.map_batches(add_cents, batch_format="pyarrow", batch_size=None)

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"tile_key": [g["tile_key"].iloc[0]],
                             "n": [len(g)], "value_cents": [g["cents"].sum()]})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"tile_key": [g["tile_key"].iloc[0]],
                             "n": [g["n"].sum()],
                             "value_cents": [g["value_cents"].sum()]})

    return salted_map_groups(ds, "tile_key", "event_id", partial, merge,
                             target_rows_per_group=200, sample_fraction=0.5)


def decode_images(_sf_dir: str, n: int = 400):
    """O11: synthetic images through the decode actor pool with per-row
    phash verification; value-checked against the generation-time stamps
    (gate_oracles.decode_images_sql)."""
    from s2geometry_ray.sources.synth import images_dataset
    from s2geometry_ray.stages.decode import decode_stage

    out = decode_stage(images_dataset(n), concurrency=2)
    return out.select_columns(["image_id", "fmt", "w", "h", "phash", "phash_ok"])


def raster_boxes_images(_sf_dir: str, n: int = 300):
    """O12 raster→vector handoff — per-image bright-region boxes
    exploded to one row per box; value-checked against a driver-side
    scalar decode+threshold twin (gate_oracles)."""
    from s2geometry_ray.sources.synth import images_dataset
    from s2geometry_ray.stages.decode import decode_stage

    out = decode_stage(images_dataset(n), concurrency=2, with_boxes=True)

    def explode(batch: pa.Table) -> pa.Table:
        # list_flatten + repeat-take: no per-row Python (r3 verdict #4)
        import pyarrow.compute as pc

        boxes = batch["boxes"]
        if isinstance(boxes, pa.ChunkedArray):
            boxes = boxes.combine_chunks()
        counts = pc.list_value_length(boxes).fill_null(0).to_numpy(
            zero_copy_only=False)
        flat = pc.list_flatten(boxes)
        ids = batch["image_id"].take(
            pa.array(np.repeat(np.arange(len(boxes)), counts)))
        col = lambda f: pc.cast(pc.struct_field(flat, f), pa.int64())  # noqa: E731
        return pa.table({"image_id": pc.cast(ids, pa.string()),
                         "y0": col("y0"), "y1": col("y1"),
                         "x0": col("x0"), "x1": col("x1")})

    return out.map_batches(explode, batch_format="pyarrow", batch_size=None)


def covering_mixed_tiles(_sf_dir: str):
    """Covering table over the FIXTURES tiles (rect + polygon + cap,
    incl. dateline/pole/sliver/face-corner adversarial cases), built via
    the Ray-parallel covering path; value-checked against the
    driver-loop build with token/level RE-DERIVED in SQL
    (gate_oracles.covering_mixed_tiles_sql)."""
    from s2geometry_ray.sources.tiles import gen_tiles
    from s2geometry_ray.stages.spatial_join import build_covering_distributed

    _table, regions = gen_tiles(16)
    index = build_covering_distributed(regions, max_cells=32, max_level=14)
    rows = len(index.tile_idx)
    from s2geometry_ray.oracle import s2 as o

    cells_flat = np.empty(rows, dtype=np.uint64)
    for _lvl, cells, ridx in index.by_level:
        cells_flat[ridx] = cells
    return pa.table({
        "tile_id": pa.array([index.tile_ids[i] for i in index.tile_idx],
                            type=pa.string()),
        "token": pa.array([o.token(int(c)) for c in cells_flat], type=pa.string()),
        "level": pa.array([o.level(int(c)) for c in cells_flat], type=pa.int64()),
        "interior": pa.array(index.interior),
    })


def phash_band_buckets(_sf_dir: str, n: int = 600):
    """O10 near-dup banding over the images' perceptual hashes — 4
    bands of 16 bits, exploded and bucket-counted; the SQL twin
    re-derives the bands with uint64 arithmetic (gate_oracles)."""
    from ray.data.aggregate import Count

    from s2geometry_ray.sources.synth import images_dataset

    ds = images_dataset(n, with_bytes=False)

    def bands(batch: pa.Table) -> pa.Table:
        # broadcast shift over a (4, n) view + one take: no per-row
        # Python, ids never round-trip through pylist (r3 verdict #4)
        ph = batch["phash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = ph.size
        shifts = (np.uint64(16) * np.arange(4, dtype=np.uint64))[:, None]
        vals = ((ph[None, :] >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
        ids = batch["image_id"].take(pa.array(np.tile(np.arange(n), 4)))
        return pa.table({"image_id": ids,
                         "band_id": pa.array(
                             np.repeat(np.arange(4, dtype=np.int64), n)),
                         "band_val": pa.array(vals.reshape(-1))})

    exploded = ds.map_batches(bands, batch_format="pyarrow", batch_size=None)
    return exploded.groupby(["band_id", "band_val"]).aggregate(Count(alias_name="n"))


_ROUTE = [(34.05, -118.24), (36.17, -115.14), (39.53, -119.81),
          (40.76, -111.89), (39.74, -104.99)]
_ROUTE_RADIUS = 0.02


def _route_region():
    from s2geometry_ray.kernels.regions import PolylineRegion

    return PolylineRegion.from_latlng_degrees(_ROUTE, _ROUTE_RADIUS)


def route_proximity_events(sf_dir: str):
    """Events within ~128 km of a fixed route (buffered polyline region
    through the standard covering+join machinery — S2Polyline + distance
    semantics as a join operator).  SQL-checked: route_proximity_sql
    embeds each arc's exact float64 constants and mirrors the clamped-
    projection distance predicate."""
    import ray

    from s2geometry_ray.pipelines.flagship import _points_ds
    from s2geometry_ray.stages.spatial_join import CoveringIndex, make_spatial_join_fn

    index = CoveringIndex.build([("route0", _route_region())],
                                max_cells=64, max_level=12)
    ref = ray.put(index)
    pts = _points_ds(sf_dir)
    out = pts.map_batches(make_spatial_join_fn(ref, ["event_id"]),
                          batch_format="pyarrow", batch_size=None)
    return out.select_columns(["event_id", "tile_id"])


def route_proximity_sql() -> str:
    """DuckDB twin of route_proximity_events, generated from the SAME
    region object: per-arc constants (a, b, n=a×b, ‖n‖, na=n×a, nb=n×b)
    embed as exact repr'd float64 literals, and membership mirrors
    PolylineRegion.distance ≤ r arc-by-arc (min over arcs ≤ r ⟺ OR of
    per-arc conditions).  Transcendental calls (asin/acos) appear in the
    same functional positions on both engines; a row could only flip on
    a point within ~1 ulp of the radius threshold."""
    from s2geometry_ray.sources.geotag import derive_lat_sql, derive_lng_sql

    region = _route_region()
    lat = derive_lat_sql("event_id")
    lng = derive_lng_sql("event_id")
    r = repr(_ROUTE_RADIUS)

    def dot(vec):
        x, y, z = (repr(float(c)) for c in vec)
        return f"(px*({x}) + py*({y}) + pz*({z}))"

    conds = []
    for k in range(region._arc_a.shape[0]):
        inside = (f"({dot(region._na[k])} > 0.0 AND "
                  f"{dot(region._nb[k])} < 0.0)")
        nn = repr(float(region._arc_nn[k]))
        d_gc = (f"asin(least(greatest(abs({dot(region._arc_n[k])}) / ({nn}),"
                f" -1.0), 1.0))")
        d_a = f"acos(least(greatest({dot(region._arc_a[k])}, -1.0), 1.0))"
        d_b = f"acos(least(greatest({dot(region._arc_b[k])}, -1.0), 1.0))"
        conds.append(f"(CASE WHEN {inside} THEN {d_gc}"
                     f" ELSE least({d_a}, {d_b}) END) <= {r}")
    where = "\n   OR ".join(conds)
    return f"""
WITH p AS (
  SELECT event_id,
         cos(radians({lat})) * cos(radians({lng})) AS px,
         cos(radians({lat})) * sin(radians({lng})) AS py,
         sin(radians({lat})) AS pz
  FROM events)
SELECT CAST(event_id AS BIGINT) AS event_id, 'route0' AS tile_id
FROM p
WHERE {where}
"""


def dedup_images_phash(_sf_dir: str, n: int = 800):
    """O9 exact dedup keyed on the perceptual hash over the synthetic
    images table (payload-free variant): min image_id survives per
    phash group; the SQL twin re-runs the aggregation (gate_oracles)."""
    from ray.data.aggregate import Count, Min

    from s2geometry_ray.sources.synth import images_dataset

    ds = images_dataset(n, with_bytes=False)
    out = ds.groupby("phash").aggregate(
        Min("image_id", alias_name="image_id"), Count(alias_name="n_copies"))
    return out.select_columns(["image_id", "n_copies"])


def io_roundtrip_docs(sf_dir: str):
    """O2 reader/writer breadth: documents flow parquet → Ray write_csv
    → Ray read_csv and the reloaded rows are checked VALUE-EXACT against
    the original table (doc_id + char length survive the format hop;
    any CSV quoting/NULL-inference corruption shows as a mismatch).
    Explicit arrow convert options pin the text column to string and
    keep empty strings non-null."""
    import tempfile

    import pyarrow.csv as pacsv
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
    tmp = tempfile.mkdtemp(prefix="io_roundtrip_", dir="/tmp")
    docs.write_csv(tmp)
    back = rd.read_csv(
        tmp,
        convert_options=pacsv.ConvertOptions(
            column_types={"doc_id": pa.int64(), "text": pa.string()},
            strings_can_be_null=False))

    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "doc_id": t["doc_id"],
            "text_len": pc.cast(pc.utf8_length(pc.cast(t["text"], pa.string())),
                                pa.int64()),
        })

    # materialize the (tiny) projection, then remove the CSV copy — a
    # lazy return would leak a full-table CSV per invocation (round-3
    # review finding)
    out = back.map_batches(project, batch_format="pyarrow").materialize()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return out


IO_ROUNDTRIP_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(text) AS BIGINT) AS text_len
FROM documents
"""


def cell_stats_events(sf_dir: str):
    """O6 grouped stats per level-8 Hilbert prefix over the event points
    (map-side pre-aggregation + bounded combine).  SQL-checked: values
    ride as integer CENTS so sums are order-insensitive-exact, and the
    oracle recomputes the level-8 cell itself with the pure-SQL S2
    implementation (functions/cellid_sql.py)."""
    from s2geometry_ray.pipelines.flagship import _points_ds
    from s2geometry_ray.stages.tile_assign import grouped_stats

    pts = _points_ds(sf_dir, extra_cols=("value",))

    def to_cents(t: pa.Table) -> pa.Table:
        cents = np.round(t["value"].to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        return t.drop_columns(["value"]).append_column(
            "cents", pa.array(cents))

    pts = pts.map_batches(to_cents, batch_format="pyarrow", batch_size=None)
    out = grouped_stats(pts, "cell_l8", "cents")

    def finalize(t: pa.Table) -> pa.Table:
        # shuffle reps → gate schema: key back to uint64 (it rode as the
        # int64 bit-view), float partials back to exact int64 cents
        # (integer-valued floats ≪ 2⁵³, so the cast is exact)
        cl = t["cell_l8"].to_numpy(zero_copy_only=False).view(np.uint64)
        as_i64 = lambda c: pa.array(  # noqa: E731
            t[c].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"cell_l8": pa.array(cl, type=pa.uint64()),
                         "n": t["n"], "s": as_i64("s"),
                         "mn": as_i64("mn"), "mx": as_i64("mx")})

    return out.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def cell_stats_events_sql() -> str:
    from s2geometry_ray.functions.cellid_sql import cell_id_ctes, parent_sql
    from s2geometry_ray.sources.geotag import derive_lat_sql, derive_lng_sql

    ctes = cell_id_ctes(
        derive_lat_sql("event_id"), derive_lng_sql("event_id"),
        extra_cols=", cents",
        extra_select=f", {half_even_sql('value * 100')} AS cents")
    return ctes + f"""
SELECT {parent_sql('cell_id', 8)} AS cell_l8,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS s,
       CAST(MIN(cents) AS BIGINT) AS mn,
       CAST(MAX(cents) AS BIGINT) AS mx
FROM cell GROUP BY cell_l8
"""


def _overlay_tile_loop(key: int):
    from s2geometry_ray.kernels.regions import LoopRegion

    # staggered grid: consecutive keys overlap TRANSVERSALLY (the
    # overlay's general-position contract — no collinear edges)
    lat0 = float((key % 5) * 8 - 20)
    lng0 = float((key // 5) * 8 - 10 + (key % 5) * 3)
    return LoopRegion.from_latlng_degrees(
        [(lat0, lng0), (lat0, lng0 + 10), (lat0 + 10, lng0 + 10),
         (lat0 + 10, lng0)])


def _overlay_rows_for_pairs(pairs) -> list[tuple]:
    """(a, b, op, n_loops, n_holes, n_vertices) tuples for each tile
    pair — the single overlay computation shared by the Ray pipeline
    (inside map_batches) and the gate oracle (driver-side pin)."""
    from s2geometry_ray.kernels.polygon_build import (
        loop_difference, loop_intersection, loop_union, loops_to_polygon)

    ops = [("union", loop_union), ("intersection", loop_intersection),
           ("difference", loop_difference)]
    rows = []
    for a, b in pairs:
        A, B = _overlay_tile_loop(a), _overlay_tile_loop(b)
        for name, fn in ops:
            loops = fn(A, B)
            poly = loops_to_polygon(loops)
            rows.append((int(a), int(b), name, len(loops),
                         0 if poly is None else len(poly.holes),
                         int(sum(len(v) for v in loops))))
    return rows


def overlay_summary_rows(keys) -> list[tuple]:
    """Overlay summaries for consecutive pairs of the sorted keys —
    driver-side twin of the polygon_overlay_tiles pipeline (the gate
    oracle embeds these as a VALUES pin)."""
    k = np.sort(np.asarray(list(keys), dtype=np.int64))
    return _overlay_rows_for_pairs(zip(k[:-1], k[1:]))


def polygon_overlay_tiles(sf_dir: str):
    """A5/A6 as a pipeline: pairwise union / intersection / difference
    over deterministic overlapping square tiles derived from nation
    keys, overlaid INSIDE map_batches (one task per batch of pairs).
    Value-checked against a driver-side scalar recompute pin
    (gate_oracles.polygon_overlay_tiles_sql) — the spherical overlay is
    not SQL-expressible, so the oracle pins distributed == driver; the
    geometric contract lives in tests/test_polygon_bool.py."""
    import pyarrow.parquet as pq

    keys = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    k = np.sort(keys["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64))
    pairs = pa.table({"a": pa.array(k[:-1]), "b": pa.array(k[1:])})

    def overlay(batch: pa.Table) -> pa.Table:
        rows = _overlay_rows_for_pairs(
            zip(batch["a"].to_pylist(), batch["b"].to_pylist()))
        cols = list(zip(*rows)) if rows else [[]] * 6
        return pa.table({
            "a": pa.array(cols[0], type=pa.int64()),
            "b": pa.array(cols[1], type=pa.int64()),
            "op": pa.array(cols[2], type=pa.string()),
            "n_loops": pa.array(cols[3], type=pa.int64()),
            "n_holes": pa.array(cols[4], type=pa.int64()),
            "n_vertices": pa.array(cols[5], type=pa.int64()),
        })

    return rd.from_arrow(pairs).map_batches(overlay, batch_format="pyarrow",
                                            batch_size=8)


# ---------------------------------------------------------------------------
# S2Polyline surface as a pipeline: interpolate / suffix / subsample
# (kernels/polyline.py) over deterministic per-nation routes
# ---------------------------------------------------------------------------

_POLYLINE_TOL = 2e-4


def _route_for_key(key: int) -> np.ndarray:
    """Deterministic 16-vertex wiggly route derived from a nation key
    (identical at every TPC-H SF, like the overlay tiles)."""
    from s2geometry_ray.oracle import s2 as _s2

    k = int(key)
    lat0 = (k % 7) * 9.0 - 27.0
    lng0 = (k * 13 % 29) * 10.0 - 140.0
    t = np.arange(16, dtype=np.float64)
    lat = lat0 + 0.35 * t + 1.2 * np.sin(0.9 * t + k)
    lng = lng0 + 0.8 * t + 0.9 * np.cos(0.7 * t + 2 * k)
    return np.asarray([_s2.latlng_to_xyz(a, b) for a, b in zip(lat, lng)])


def polyline_summary_rows(keys) -> list[tuple]:
    """(key, n_in, n_out, length_e9, mid_lat_e7, mid_lng_e7, suffix_n)
    per key — the single polyline computation shared by the Ray
    pipeline (inside map_batches) and the gate oracle (driver-side
    pin).  All outputs are integers so the DuckDB hash compare is
    exact: lengths in nano-radians, the fraction-0.5 interpolated
    point in 1e-7 degrees."""
    from s2geometry_ray.kernels import polyline as pl
    from s2geometry_ray.oracle import s2 as _s2

    rows = []
    for key in keys:
        v = _route_for_key(key)
        idx = pl.subsample_vertices(v, _POLYLINE_TOL)
        mid = pl.interpolate(v, [0.5])[0]
        lat, lng = _s2.xyz_to_latlng(float(mid[0]), float(mid[1]),
                                     float(mid[2]))
        suf = pl.suffix(v, 0.25)
        rows.append((int(key), int(v.shape[0]), int(idx.shape[0]),
                     int(round(pl.total_length(v) * 1e9)),
                     int(round(lat * 1e7)), int(round(lng * 1e7)),
                     int(suf.shape[0])))
    return rows


def polyline_ops_routes(sf_dir: str):
    """S23 polyline surface as a pipeline: per nation key, simplify a
    deterministic route (subsample_vertices), interpolate its midpoint
    and take the fraction-0.25 suffix — computed inside map_batches;
    value-checked against a driver-side recompute pin
    (gate_oracles.polyline_ops_routes_sql).  The geometric contract
    (tolerance bound, slerp-on-polyline, suffix length additivity)
    lives in tests/test_polyline.py."""
    import pyarrow.parquet as pq

    keys = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    k = np.sort(keys["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64))

    def summarize(batch: pa.Table) -> pa.Table:
        rows = polyline_summary_rows(batch["key"].to_pylist())
        cols = list(zip(*rows)) if rows else [[]] * 7
        names = ["key", "n_in", "n_out", "length_e9", "mid_lat_e7",
                 "mid_lng_e7", "suffix_n"]
        return pa.table({nm: pa.array(c, type=pa.int64())
                         for nm, c in zip(names, cols)})

    return rd.from_arrow(pa.table({"key": pa.array(k)})).map_batches(
        summarize, batch_format="pyarrow", batch_size=8)


def image_thumbs_images(_sf_dir: str, n: int = 400):
    """Still-image RESIZE operator (multimodal decode → exact box-average
    thumbnail → integer channel features) through the actor pool;
    value-checked against a driver-side recompute of the same pixels
    (gate_oracles.image_thumbs_images_sql)."""
    from s2geometry_ray.sources.synth import images_dataset
    from s2geometry_ray.stages.decode import image_thumb_stage

    return image_thumb_stage(images_dataset(n), thumb=8, concurrency=2)


def augment_images(_sf_dir: str, n: int = 400):
    """Deterministic image AUGMENTATION (hash-keyed flip/rotate +
    center crop) through the actor pool; value-checked against a
    driver-side recompute of the same chain
    (gate_oracles.augment_images_sql)."""
    from s2geometry_ray.sources.synth import images_dataset
    from s2geometry_ray.stages.decode import augment_stage

    return augment_stage(images_dataset(n), concurrency=2)


_CAPTION_RE = r"\((-?[0-9]+\.[0-9]{4}),(-?[0-9]+\.[0-9]{4})\)"


def _latlng_e4(v: float) -> int:
    """e4 fixed-point via the SAME decimal formatting the caption was
    generated with (format-then-parse on both engine and oracle, so
    tie-rounding can never diverge)."""
    import numpy as np

    return int(np.rint(float(f"{v:.4f}") * 10000))


class CaptionGeoCheck:
    """Cross-field VALIDATION: parse the '(lat,lng)' embedded in each
    caption (compiled RE2-compatible regex, once per actor) and compare
    against the geotag derived from the image id — the data-quality
    screen that catches caption/metadata drift in a multimodal corpus.
    Emits e4 fixed-point ints (bit-exact across engines)."""

    def __init__(self):
        import re

        self.rx = re.compile(_CAPTION_RE)

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        import numpy as np

        from s2geometry_ray.sources.synth import derive_latlng

        ids = batch["image_id"].to_pylist()
        caps = batch["caption"].to_pylist()
        n = len(ids)
        cap_lat = np.zeros(n, dtype=np.int64)
        cap_lng = np.zeros(n, dtype=np.int64)
        ok_parse = np.zeros(n, dtype=bool)
        geo_lat = np.empty(n, dtype=np.int64)
        geo_lng = np.empty(n, dtype=np.int64)
        for i in range(n):  # sha256 id-hash is per-row by construction
            m = self.rx.search(caps[i])
            if m:
                ok_parse[i] = True
                cap_lat[i] = _latlng_e4(float(m.group(1)))
                cap_lng[i] = _latlng_e4(float(m.group(2)))
            la, ln = derive_latlng(ids[i])
            geo_lat[i] = _latlng_e4(la)
            geo_lng[i] = _latlng_e4(ln)
        consistent = ok_parse & (cap_lat == geo_lat) & (cap_lng == geo_lng)
        return pa.table({
            "image_id": batch["image_id"],
            "cap_lat_e4": pa.array(cap_lat), "cap_lng_e4": pa.array(cap_lng),
            "geo_lat_e4": pa.array(geo_lat), "geo_lng_e4": pa.array(geo_lng),
            "consistent": pa.array(consistent),
        })


def caption_geo_check_images(_sf_dir: str, n: int = 400):
    """Caption↔geotag consistency over the synthetic images table
    (bytes-free read — validation never decodes pixels)."""
    from s2geometry_ray.sources.synth import images_dataset

    ds = images_dataset(n, with_bytes=False)
    return ds.map_batches(CaptionGeoCheck, batch_format="pyarrow",
                          batch_size=128, concurrency=2, num_cpus=1)


ADAPTIVE_TILING_ARGS = dict(min_level=2, max_level=4, cap=30)


def adaptive_tiling_events(sf_dir: str):
    """O50 adaptive tiling: the coarsest multi-level S2 cell set where
    every cell holds <= cap event points (refinement stops at
    max_level) — the balanced-partition builder.  Value-exact twin:
    stages.adaptive_tiling.adaptive_tiling_sql recomputes the leaf cell
    with the pure-SQL S2 kernel and the selection rule with one parent
    join per level."""
    from s2geometry_ray.stages.adaptive_tiling import adaptive_tiling
    from s2geometry_ray.stages.cell_assign import make_geotag_and_assign

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    pts = ds.map_batches(make_geotag_and_assign("event_id", levels=()),
                         batch_format="pyarrow", batch_size=None)
    return adaptive_tiling(pts, **ADAPTIVE_TILING_ARGS)


def adaptive_tiling_events_sql() -> str:
    from s2geometry_ray.sources.geotag import derive_lat_sql, derive_lng_sql
    from s2geometry_ray.stages.adaptive_tiling import adaptive_tiling_sql

    a = ADAPTIVE_TILING_ARGS
    return adaptive_tiling_sql(derive_lat_sql("event_id"),
                               derive_lng_sql("event_id"),
                               a["min_level"], a["max_level"], a["cap"])


def rasterize_density_tiles(sf_dir: str, w: int = 16, h: int = 16):
    """O51 vector→raster: exact per-pixel point counts over each gate
    tile's W×H grid (the image render over these counts is pytest-
    verified via the PPM round-trip; the gate checks the counts
    value-exact against stages.rasterize.rasterize_density_sql)."""
    import ray

    from s2geometry_ray.pipelines.flagship import _nation_tiles, _points_ds
    from s2geometry_ray.stages.rasterize import rasterize_density
    from s2geometry_ray.stages.spatial_join import (CoveringIndex,
                                                    make_spatial_join_fn)

    index_ref = ray.put(CoveringIndex.build(_nation_tiles(sf_dir),
                                            max_cells=64, max_level=14))
    joined = _points_ds(sf_dir).map_batches(
        make_spatial_join_fn(index_ref, ["event_id", "lat", "lng"]),
        batch_format="pyarrow", batch_size=None)
    return rasterize_density(joined, w=w, h=h)


N_CITY_TILES = 12


def _image_city_tiles():
    from s2geometry_ray.kernels.regions import RectRegion
    from s2geometry_ray.sources.synth import image_city_tile_bounds

    out = []
    for k in range(N_CITY_TILES):
        b = image_city_tile_bounds(k)
        out.append((k, RectRegion.from_degrees(
            b["lat_lo"], b["lat_hi"], b["lng_lo"], b["lng_hi"])))
    return out


def tile_color_stats_images(_sf_dir: str, n: int = 400):
    """O52 composed image×geo pipeline: decode actor pool (exact integer
    channel sums + geotag from image_id) → S2 cell assign → covering
    broadcast spatial join against city rect tiles → per-tile
    aggregate.  Value-exact twin: gate_oracles.tile_color_stats_sql
    recomputes per-image sums with a driver-side scalar decode and
    re-derives membership + aggregation in SQL."""
    import ray

    from s2geometry_ray.sources.synth import images_dataset
    from s2geometry_ray.stages.cell_assign import make_cell_assign
    from s2geometry_ray.stages.decode import GeoColorActor
    from s2geometry_ray.stages.spatial_join import (CoveringIndex,
                                                    make_spatial_join_fn)
    from s2geometry_ray.stages.tile_assign import combine_partials

    index_ref = ray.put(CoveringIndex.build(_image_city_tiles(),
                                            max_cells=64, max_level=12))
    feats = images_dataset(n).map_batches(
        GeoColorActor, batch_size=128, concurrency=2, num_cpus=1,
        batch_format="pyarrow")
    joined = (feats.map_batches(make_cell_assign(levels=()),
                                batch_format="pyarrow", batch_size=None)
              .map_batches(make_spatial_join_fn(
                  index_ref, ["image_id", "r_sum", "g_sum", "b_sum"]),
                  batch_format="pyarrow", batch_size=None))

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("tile_id", as_index=False).agg(
            n_images=("image_id", "size"), r_sum=("r_sum", "sum"),
            g_sum=("g_sum", "sum"), b_sum=("b_sum", "sum"))
        g = g.rename(columns={"tile_id": "tile_key"})
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = joined.map_batches(partial, batch_format="pyarrow",
                                  batch_size=None)
    return combine_partials(partials, "tile_key",
                            {"n_images": "sum", "r_sum": "sum",
                             "g_sum": "sum", "b_sum": "sum"})


def _city_cap_tiles():
    """Cap regions around the same city centers as the rect tiles
    (radius 2.5°) — caps and rects overlap heavily by construction, so
    the overlap join has a dense fixture; also exercises CapRegion
    through the coverer inside this operator."""
    import math

    from s2geometry_ray.kernels.regions import CapRegion
    from s2geometry_ray.sources.synth import CITY_LAT, CITY_LNG

    return [(k, CapRegion.from_latlng_radius(
        float(CITY_LAT[k]), float(CITY_LNG[k]), math.radians(2.5)))
        for k in range(N_CITY_TILES)]


def covering_overlap_tiles(sf_dir: str):
    """O57 cell-union overlap join: exact shared-leaf counts between
    every city CAP covering and every city RECT covering that
    intersect.  The cap-side exploded covering STREAMS as a Dataset;
    the rect side broadcasts once; the SQL twin re-derives the overlap
    join + sum from the same pinned coverings in UBIGINT arithmetic."""
    from s2geometry_ray.stages.covering_overlap import (covering_overlap,
                                                        exploded_covering)

    key, _cell, lo, hi = exploded_covering(_city_cap_tiles())
    cov_a = rd.from_arrow(pa.table({
        "tile_key": pa.array(key, type=pa.int64()),
        "lo": pa.array(lo.view(np.int64), type=pa.int64()),
        "hi": pa.array(hi.view(np.int64), type=pa.int64()),
    })).repartition(4)
    return covering_overlap(cov_a, _image_city_tiles())


def covering_overlap_tiles_sql(sf_dir_hint: str = "") -> str:
    # the gate tiles are SF-independent (city keys 0..11 on both sides)
    from s2geometry_ray.stages.covering_overlap import (covering_values_sql,
                                                        exploded_covering)

    ka, _c, la, ha = exploded_covering(_city_cap_tiles())
    kb, _c2, lb, hb = exploded_covering(_image_city_tiles())
    va = covering_values_sql(ka, la, ha, "ca")
    vb = covering_values_sql(kb, lb, hb, "cb")
    return f"""
SELECT CAST(ca.tile AS BIGINT) AS tile_a,
       CAST(cb.tile AS BIGINT) AS tile_b,
       CAST(SUM(CAST(least(ca.hi, cb.hi) - greatest(ca.lo, cb.lo)
                     + CAST(1 AS UBIGINT) AS HUGEINT)) AS BIGINT)
         AS overlap_leafs
FROM {va} JOIN {vb}
  ON ca.lo <= cb.hi AND cb.lo <= ca.hi
GROUP BY 1, 2
"""


def patch_features_images(_sf_dir: str, n: int = 300, grid: int = 4):
    """O58 patchify: every image explodes into a P×P grid of patch rows
    with exact integer channel sums (the ViT patch-embedding
    preprocessing shape); actor-pool decode, pixels never shuffle.
    Twin: driver-side scalar decode recomputes every patch sum
    (gate_oracles.patch_features_sql)."""
    from s2geometry_ray.sources.synth import images_dataset
    from s2geometry_ray.stages.decode import PatchActor

    return images_dataset(n).map_batches(
        PatchActor, fn_constructor_kwargs=dict(grid=grid),
        batch_size=128, concurrency=2, num_cpus=1, batch_format="pyarrow")
