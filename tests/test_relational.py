"""Edge-case tests for the relational operators (pipelines/relational):
as-of merge semantics (ties, unmatched keys, pre-first-order events),
range-join bucketing, window kernels, and quantile selection on
pathological distributions — each vs DuckDB on crafted tables.
"""

from __future__ import annotations

import os
import sys
import tempfile

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

from s2geometry_ray.pipelines import relational as R  # noqa: E402


def _write_events_orders(tmp, events: pd.DataFrame, orders: pd.DataFrame):
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False),
                   os.path.join(tmp, "events.parquet"))
    pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                   os.path.join(tmp, "orders.parquet"))


def test_asof_merge_ties_and_unmatched(ray_session):
    """Crafted as-of cases: (a) order-date ties break to max o_orderkey,
    (b) an event before its user's first order is dropped (inner), (c) a
    user with no orders is dropped, (d) an order AT the event timestamp
    matches (<=).  Checked against DuckDB's ROW_NUMBER twin."""
    rng = np.random.default_rng(7)
    n_ev, n_od = 400, 120
    events = pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "user_id": rng.integers(0, 12, n_ev),  # users 10,11 have no orders
        "ts": pd.to_datetime(rng.integers(0, 1_000, n_ev), unit="s"),
    })
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_od, dtype=np.int64),
        "o_custkey": rng.integers(0, 10, n_od),
        # coarse seconds force date ties within a customer
        "o_orderdate": pd.to_datetime(rng.integers(0, 40, n_od) * 25, unit="s"),
        "o_totalprice": rng.uniform(1, 100, n_od).round(2),
    })
    # (d): pin one exact-timestamp match
    events.loc[0, ["user_id", "ts"]] = [0, pd.Timestamp(0)]
    orders.loc[0, ["o_custkey", "o_orderdate"]] = [0, pd.Timestamp(0)]

    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        _write_events_orders(tmp, events, orders)
        got = R.asof_join_events_orders(tmp).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{tmp}/events.parquet'")
        con.sql(f"CREATE VIEW orders AS SELECT * FROM '{tmp}/orders.parquet'")
        want = con.sql(R.ASOF_JOIN_SQL).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert 0 in a["event_id"].values          # the exact-ts match survived
    assert len(a) < n_ev                       # some events had no match


def test_asof_merge_empty_sides():
    empty = pd.DataFrame({"side": pd.Series([], dtype=np.int8),
                          "key": pd.Series([], dtype=np.int64),
                          "t": pd.Series([], dtype=np.int64),
                          "pid": pd.Series([], dtype=np.int64),
                          "okey": pd.Series([], dtype=np.int64),
                          "price": pd.Series([], dtype=np.float64)})
    only_ev = pd.DataFrame({"side": [0], "key": [1], "t": [5], "pid": [9],
                            "okey": [0], "price": [0.0]})
    assert len(R._asof_merge(empty)) == 0
    assert len(R._asof_merge(only_ev)) == 0
    out = R._asof_merge(pd.concat([only_ev,
                                   pd.DataFrame({"side": [1], "key": [1],
                                                 "t": [3], "pid": [0],
                                                 "okey": [7],
                                                 "price": [1.5]})]))
    assert out.to_dict("records") == [{"event_id": 9, "user_id": 1,
                                       "o_orderkey": 7, "o_totalprice": 1.5}]


def test_ranges_within():
    reps = np.array([3, 1, 2], dtype=np.int64)
    assert R._ranges_within(reps).tolist() == [0, 1, 2, 0, 0, 1]
    assert R._ranges_within(np.zeros(0, np.int64)).size == 0


def test_quantiles_pathological(ray_session):
    """Near-constant and single-row groups: the histogram width clamps
    to 1 and the gather degenerates to (at most) the group — selection
    stays exact vs DuckDB's quantile_disc."""
    values = np.concatenate([
        np.full(500, 42.00),              # constant group
        np.array([7.77]),                 # n = 1 group
        np.round(np.linspace(0.01, 499.99, 997), 2),  # smooth group
        np.array([1e-2, 1e6]),            # extreme range, n = 2
    ])
    types = np.array(["const"] * 500 + ["single"] + ["smooth"] * 997
                     + ["wide"] * 2)
    df = pd.DataFrame({"event_type": types, "value": values})
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp, "events.parquet"))
        got = R.quantiles_events(tmp).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{tmp}/events.parquet'")
        want = con.sql(R.QUANTILES_SQL).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(a) == 4 * 3


def test_rolling_windows_vs_pandas(ray_session):
    """Rolling kernel vs an independent pandas rolling implementation on
    crafted data with duplicate timestamps (event_id tiebreak)."""
    rng = np.random.default_rng(3)
    n = 1000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 7, n),
        # 500 distinct seconds over 1000 rows: plenty of timestamp ties,
        # and a span ≫ the 60 s RANGE window so its lower bound matters
        "ts": pd.to_datetime(rng.integers(0, 500, n), unit="s"),
        "value": rng.uniform(0, 10, n).round(2),
    })
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp, "events.parquet"))
        got = (R.rolling_user_value(tmp).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
    ref = df.copy()
    ref["cents"] = np.round(ref["value"] * 100).astype(np.int64)
    ref = ref.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    g = ref.groupby("user_id")["cents"]
    ref["rn"] = g.cumcount() + 1
    ref["lag_cents"] = g.shift(1).fillna(-1).astype(np.int64)
    ref["roll3_cents"] = (g.rolling(3, min_periods=1).sum()
                          .reset_index(level=0, drop=True).astype(np.int64))
    ref = ref.sort_values("event_id").reset_index(drop=True)
    for c in ["rn", "lag_cents", "roll3_cents"]:
        assert (got[c].to_numpy() == ref[c].to_numpy()).all(), c
    # the RANGE window (peers on BOTH sides of the current row count)
    # has no pandas equivalent — pin it against DuckDB on the same
    # tie-heavy frame
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp, "events.parquet"))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{tmp}/events.parquet'")
        want = (con.sql(R.ROLLING_SQL).df()
                .sort_values("event_id").reset_index(drop=True))
    for c in ["win60_n", "win60_cents"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_range_join_point_on_boundary(ray_session):
    """Points exactly AT lo and hi are included (BETWEEN is inclusive),
    and a point matching an interval whose bucket span crosses the
    point's bucket is found exactly once."""
    w = R._RJ_BUCKET_W
    part = pd.DataFrame({"p_partkey": [1], "p_size": [1],
                         "p_retailprice": [900.0]})     # lo=9, hi=18 (2 buckets)
    events = pd.DataFrame({"event_id": np.arange(6, dtype=np.int64),
                           "value": [9.0, 18.0, 8.99, 18.01, 15.5, 17.0]})
    assert 9.0 < w < 18.0                               # interval straddles
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        pq.write_table(pa.Table.from_pandas(events, preserve_index=False),
                       os.path.join(tmp, "events.parquet"))
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       os.path.join(tmp, "part.parquet"))
        got = R.range_join_events_parts(tmp).to_pandas()
    assert got.to_dict("records") == [
        {"p_partkey": 1, "n": 4,
         "sum_cents": int(round((9.0 + 18.0 + 15.5 + 17.0) * 100))}]


def test_range_join_rejects_wide_interval():
    part = pd.DataFrame({"p_partkey": [1], "p_size": [1],
                         "p_retailprice": [90000.0]})
    events = pd.DataFrame({"event_id": [0], "value": [1.0]})
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        pq.write_table(pa.Table.from_pandas(events, preserve_index=False),
                       os.path.join(tmp, "events.parquet"))
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       os.path.join(tmp, "part.parquet"))
        with pytest.raises(ValueError, match="wider than"):
            R.range_join_events_parts(tmp)


def test_quantiles_cont_pathological_groups(ray_session):
    """Interpolated quantiles on crafted groups: constant column (all
    interpolations equal the constant), n=1 group (idx always 0), a
    2-row group (pure interpolation between the two values), and an
    extreme-range group — bit-exact vs the explicit ROW_NUMBER twin."""
    import duckdb

    rng = np.random.default_rng(5)
    events = pd.DataFrame({
        "event_type": (["const"] * 50 + ["single"] + ["two"] * 2
                       + ["wide"] * 97),
        "value": np.concatenate([
            np.full(50, 7.25),
            [42.0],
            [1.0, 2.0],
            rng.uniform(0, 1e6, 97).round(2),
        ]),
    })
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        pq.write_table(pa.Table.from_pandas(events, preserve_index=False),
                       os.path.join(tmp, "events.parquet"))
        got = R.quantiles_cont_events(tmp).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{tmp}/events.parquet'")
        want = con.sql(R.QUANTILES_CONT_SQL).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    g = a.set_index(["event_type", "q_pct"])["value_interp"]
    assert (g.loc["const"] == 725.0).all()
    assert (g.loc["single"] == 4200.0).all()
    assert g.loc[("two", 50)] == 150.0          # midpoint of 100 and 200


def test_rollup_levels_consistent(ray_session):
    """Rollup levels reconcile: subtotals sum to the grand total, base
    cells sum to their subtotal, and the whole result matches GROUP BY
    ROLLUP in DuckDB (incl. a pre-1970 timestamp, which exercises the
    floor-vs-truncate day bucketing)."""
    import duckdb

    ev = pd.DataFrame({
        "event_type": ["a", "a", "b", "b", "b"],
        "ts": pd.to_datetime([0, 86_400, -1, 100, 200], unit="s"),
    })
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                       os.path.join(tmp, "events.parquet"))
        got = R.rollup_event_day_counts(tmp).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{tmp}/events.parquet'")
        want = con.sql(R.rollup_sql()).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    grand = a[a.lvl == 3]["n"].item()
    subs = a[a.lvl == 1]["n"].sum()
    base = a[a.lvl == 0]["n"].sum()
    assert grand == subs == base == len(ev)
    # the -1s epoch timestamp landed in day -1 (floored), distinct from
    # the subtotal rows (lvl disambiguates the sentinel collision)
    assert a[(a.event_type == "b") & (a.lvl == 0) &
             (a.day_bucket == -1)]["n"].item() == 1


def test_rcf_format_roundtrip_and_projection(ray_session):
    """RCF1 codec invariants at the Ray surface: write → read is
    value-exact over strings incl. unicode/empty; a projected read
    returns only the requested columns; rewriting the same data
    produces the identical fragment set (content-hash idempotence)."""
    import ray.data as rd

    from s2geometry_ray.sources import rcf

    df = pd.DataFrame({
        "doc_id": np.arange(7, dtype=np.int64),
        "text": ["", "héllo wörld", "x" * 500, "tab\tnl\n", "ascii",
                 "émoji ✓", "end"],
        "score": np.linspace(-1, 1, 7),
    })
    ds = rd.from_pandas(df)
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        m1 = sorted(rcf.write_rcf(ds, tmp).to_pandas()["path"])
        back = rcf.read_rcf(tmp).to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(back[df.columns.tolist()], df)
        proj = rcf.read_rcf(tmp, columns=["doc_id", "score"]).to_pandas()
        assert sorted(proj.columns) == ["doc_id", "score"]
        m2 = sorted(rcf.write_rcf(rd.from_pandas(df), tmp)
                    .to_pandas()["path"])
        assert m1 == m2                       # idempotent rewrite


def test_rcf_manifest_multiplicity_and_staleness(ray_session):
    """Two byte-identical blocks content-address to ONE fragment file;
    the manifest's copy count restores both logical blocks on read.
    And a read goes through the manifest, not the directory listing:
    stale fragments from an earlier differently-blocked run are
    ignored."""
    import ray.data as rd

    from s2geometry_ray.sources import rcf

    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                       "text": ["a", "b", "c"]})
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        # stale fragment: an earlier run wrote OTHER data here
        rcf.write_rcf(rd.from_pandas(
            pd.DataFrame({"doc_id": np.array([99], dtype=np.int64),
                          "text": ["stale"]})), tmp)
        m = rcf.write_rcf(rd.from_pandas([df, df.copy()]), tmp).to_pandas()
        assert len(m) == 2 and m["path"].nunique() == 1  # deduped file
        back = rcf.read_rcf(tmp).to_pandas()
        assert len(back) == 6                 # multiplicity restored
        assert 99 not in set(back["doc_id"])  # stale fragment ignored


def test_rcf_zlib_compression_roundtrip(ray_session):
    """Compressed fragments roundtrip value-exactly, shrink on
    repetitive text, keep incompressible columns raw (smaller-wins), and
    projection still skips undecoded columns."""
    import ray.data as rd

    from s2geometry_ray.sources import rcf

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "doc_id": np.arange(2000, dtype=np.int64),
        "text": ["the same repetitive sentence " * 5] * 2000,
        "x": rng.standard_normal(2000),       # incompressible
    })
    raw = rcf.encode_fragment(pa.Table.from_pandas(df, preserve_index=False))
    comp = rcf.encode_fragment(pa.Table.from_pandas(df, preserve_index=False),
                               compression="zlib")
    assert len(comp) < len(raw) // 3          # text column deflates hard
    back = rcf.decode_fragment(comp)
    pd.testing.assert_frame_equal(back.to_pandas(), df)
    # projected decode of a compressed fragment
    just_x = rcf.decode_fragment(comp, columns=["x"])
    assert just_x.column_names == ["x"]
    np.testing.assert_array_equal(just_x["x"].to_numpy(), df["x"].to_numpy())

    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        rcf.write_rcf(rd.from_pandas(df), tmp + "/c", )
        rcf.write_rcf(rd.from_pandas(df), tmp + "/z", compression="zlib")
        a = rcf.read_rcf(tmp + "/c").to_pandas().sort_values("doc_id")
        b = rcf.read_rcf(tmp + "/z").to_pandas().sort_values("doc_id")
        pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                      b.reset_index(drop=True))
    with pytest.raises(ValueError):
        rcf.encode_fragment(pa.table({"a": pa.array([1])}),
                            compression="lz4")


def test_window_twins_pre_1970_timestamps(ray_session, tmp_path):
    """The _floor_div_day_sql fix (truncating // vs flooring numpy
    division) is load-bearing only with a negative-microsecond ts;
    the driver fixtures are all post-1970, so pin it here: engine vs
    twin on a table with pre-1970 rows must still value-match
    (round-4 verdict #10)."""
    import duckdb

    from s2geometry_ray.pipelines import tpch as T

    rng = np.random.default_rng(9)
    n = 400
    # microseconds straddling the epoch, incl. exact-midnight negatives
    us = rng.integers(-5 * 86_400_000_000, 5 * 86_400_000_000, n)
    us[:4] = [-86_400_000_000, -1, 0, -2 * 86_400_000_000]
    events = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": np.array(["a", "b", "c"])[np.arange(n) % 3],
        "ts": pd.to_datetime(us, unit="us"),
        "value": rng.uniform(0, 50, n).round(2),
    })
    events.to_parquet(tmp_path / "events.parquet", index=False)

    for fn, sql in ((T.events_window_counts, T.EVENTS_WINDOW_SQL),
                    (T.events_hopping_counts, T.EVENTS_HOPPING_SQL)):
        got = fn(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * "
                f"FROM '{tmp_path}/events.parquet'")
        want = con.sql(sql).df()
        cols = sorted(got.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        assert (a.filter(like="day", axis=1).min().min() < 0
                or a.filter(like="window", axis=1).min().min() < 0)
