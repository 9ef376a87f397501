"""Relational operators Ray Data lacks natively, each built as a
composition of map_batches + hash-partitioned groupby/map_groups (the
task's "custom operators" clause): AS-OF join, bucketed range/interval
join, ordered per-key window functions (row_number / lag / rolling sum),
grouped top-N, and distributed exact order statistics (quantiles) via
histogram refinement.

Every operator documents its partitioning assumption and shuffles keys +
small payloads only; each has a value-exact DuckDB twin in the module's
*_SQL constants (windowed/ordered semantics are pinned with integer
arithmetic — cents — so float summation order can never diverge).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from s2geometry_ray.functions.sqlnum import half_even_sql
from s2geometry_ray.scale import derive_num_parts

# np.round(value * 100) twin fragment — half-to-even, NOT DuckDB ROUND()
_CENTS = half_even_sql("value * 100")

# ---------------------------------------------------------------------------
# AS-OF join: events ⋈asof orders on (user_id == o_custkey, o_orderdate <= ts)
# picking the most recent order; ties on o_orderdate break to the max
# o_orderkey so the result is fully deterministic (DuckDB's ASOF JOIN is
# tie-arbitrary, hence the ROW_NUMBER twin below).
# ---------------------------------------------------------------------------


def _asof_merge(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized as-of merge of one co-partition (both sides tagged).

    Orders sort by (key, date, okey); a composite rank
    ``key * (U+1) + date_rank`` (U = #unique dates in the partition)
    makes lexicographic (key, date) comparison a single int64
    searchsorted: the last order with composite < the event's composite
    is the latest order at-or-before ts, and among date ties the last
    array element is the max o_orderkey.  O((n+m)·log) per partition,
    zero Python loops.
    """
    ev = g[g["side"].to_numpy() == 0]
    od = g[g["side"].to_numpy() == 1]
    if not len(ev) or not len(od):
        return pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                             "user_id": pd.Series([], dtype=np.int64),
                             "o_orderkey": pd.Series([], dtype=np.int64),
                             "o_totalprice": pd.Series([], dtype=np.float64)})
    ko = od["key"].to_numpy(np.int64)
    do = od["t"].to_numpy(np.int64)
    okey = od["okey"].to_numpy(np.int64)
    price = od["price"].to_numpy(np.float64)
    order = np.lexsort((okey, do, ko))
    ko, do, okey, price = ko[order], do[order], okey[order], price[order]

    uniq = np.unique(do)
    base = np.int64(uniq.size + 1)
    if ko.size and int(ko.max()) >= (2**62) // int(base):
        raise OverflowError("as-of composite rank would overflow int64; "
                            "raise the partition count")
    comp_o = ko * base + np.searchsorted(uniq, do).astype(np.int64)

    ke = ev["key"].to_numpy(np.int64)
    te = ev["t"].to_numpy(np.int64)
    comp_e = ke * base + np.searchsorted(uniq, te, side="right").astype(np.int64)

    idx = np.searchsorted(comp_o, comp_e, side="left") - 1
    valid = idx >= 0
    safe = np.where(valid, idx, 0)
    valid &= ko[safe] == ke
    return pd.DataFrame({
        "event_id": ev["pid"].to_numpy(np.int64)[valid],
        "user_id": ke[valid],
        "o_orderkey": okey[safe[valid]],
        "o_totalprice": price[safe[valid]],
    })


def asof_join_events_orders(sf_dir: str):
    """AS-OF join as a Ray Data composition: both sides project to
    (key, t, payload), tag a side marker, union, hash-co-partition by
    key, and merge per partition with the vectorized kernel above.

    Partitioning assumption: rows co-locate by join key only — a key's
    events AND orders land in one partition (partition count ∝ total
    rows via parquet metadata), so no partition ever holds more than
    ~rows_per_part rows of the combined stream.  Only (key, t, id,
    price) columns shuffle; event payloads would stay behind and
    re-join by event_id if needed.
    """
    n = (pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
         + pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)
    num_parts = derive_num_parts(n, rows_per_part=200_000)

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def prep_events(t: pa.Table) -> pa.Table:
        key = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": key,
            "t": t["ts"].to_numpy(zero_copy_only=False)
                 .astype("datetime64[us]").view(np.int64),
            "pid": t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            "okey": np.zeros(len(t), np.int64),
            "price": np.zeros(len(t), np.float64),
            "side": np.zeros(len(t), np.int8),
            "part": key % num_parts,
        })

    def prep_orders(t: pa.Table) -> pa.Table:
        key = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": key,
            "t": t["o_orderdate"].to_numpy(zero_copy_only=False)
                 .astype("datetime64[us]").view(np.int64),
            "pid": np.zeros(len(t), np.int64),
            "okey": t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            "price": t["o_totalprice"].to_numpy(zero_copy_only=False),
            "side": np.ones(len(t), np.int8),
            "part": key % num_parts,
        })

    both = ev.map_batches(prep_events, batch_format="pyarrow",
                          batch_size=None).union(
        od.map_batches(prep_orders, batch_format="pyarrow", batch_size=None))
    return both.groupby("part").map_groups(_asof_merge, batch_format="pandas")


ASOF_JOIN_SQL = """
SELECT event_id, user_id, o_orderkey, o_totalprice FROM (
  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) WHERE rn = 1
"""

# ---------------------------------------------------------------------------
# Range (interval) join: events.value ∈ [lo, hi] per part, aggregated per
# part.  Intervals derive deterministically from part columns so the SQL
# twin reproduces them exactly.
# ---------------------------------------------------------------------------

_RJ_BUCKET_W = 16.0  # bucket width ≥ max interval width ⇒ ≤2 buckets/interval


def _part_intervals(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic [lo, hi] per part covering the events.value domain:
    lo = p_size * 9, hi = lo + p_retailprice / 100 (width ≈ 9–10)."""
    pk = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo = t["p_size"].to_numpy(zero_copy_only=False).astype(np.float64) * 9.0
    hi = lo + t["p_retailprice"].to_numpy(zero_copy_only=False) / 100.0
    return pk, lo, hi


def range_join_events_parts(sf_dir: str):
    """Bucketed range join: intervals replicate to every width-16 value
    bucket they overlap; each point lands in exactly ONE bucket, so a
    (point, interval) pair materializes exactly once — no dedup shuffle.
    Per-bucket matching is sort + two searchsorteds (O(output), no n×m
    compare).  Matches aggregate per p_partkey map-side before a small
    combine, so only (partkey, count, sum_cents) partials shuffle.

    Partitioning assumption: interval width is bounded (≤ _RJ_BUCKET_W,
    asserted) so replication is ≤2×; value skew concentrates points in
    few buckets — the groupby key is the bucket, whose population is
    bounded by the value distribution, not by key cardinality.
    """
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])
    parts_tbl = pq.read_table(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_size", "p_retailprice"])
    pk, lo, hi = _part_intervals(parts_tbl)
    if (hi - lo).max() > _RJ_BUCKET_W:
        raise ValueError("interval wider than the bucket width")
    # broadcast the (small) interval table once; workers reuse it per batch
    import ray

    b0 = np.floor(lo / _RJ_BUCKET_W).astype(np.int64)
    b1 = np.floor(hi / _RJ_BUCKET_W).astype(np.int64)
    reps = (b1 - b0 + 1).astype(np.int64)
    iv_bucket = np.repeat(b0, reps) + _ranges_within(reps)
    iv_ref = ray.put((np.repeat(pk, reps), np.repeat(lo, reps),
                      np.repeat(hi, reps), iv_bucket))

    def match(batch: pa.Table) -> pa.Table:
        ipk, ilo, ihi, ib = ray.get(iv_ref)
        val = batch["value"].to_numpy(zero_copy_only=False)
        cents = np.round(val * 100).astype(np.int64)
        pb = np.floor(val / _RJ_BUCKET_W).astype(np.int64)
        order = np.argsort(val, kind="stable")
        sval, scents, spb = val[order], cents[order], pb[order]
        out_pk, out_n, out_sum = [], [], []
        # intervals in buckets present in this batch only
        sel = np.isin(ib, np.unique(pb))
        for j in np.nonzero(sel)[0]:
            # points of the interval's bucket with lo<=v<=hi: two binary
            # searches on the value-sorted batch, then a bucket filter
            s = np.searchsorted(sval, ilo[j], side="left")
            e = np.searchsorted(sval, ihi[j], side="right")
            if s >= e:
                continue
            m = spb[s:e] == ib[j]
            cnt = int(m.sum())
            if cnt:
                out_pk.append(ipk[j])
                out_n.append(cnt)
                out_sum.append(int(scents[s:e][m].sum()))
        return pa.table({"p_partkey": pa.array(out_pk, type=pa.int64()),
                         "n": pa.array(out_n, type=pa.int64()),
                         "sum_cents": pa.array(out_sum, type=pa.int64())})

    from s2geometry_ray.stages.tile_assign import combine_partials

    partials = ev.map_batches(match, batch_format="pyarrow", batch_size=None)
    return combine_partials(partials, "p_partkey",
                            {"n": "sum", "sum_cents": "sum"})


def _ranges_within(reps: np.ndarray) -> np.ndarray:
    """[0..reps[0]-1, 0..reps[1]-1, ...] without a Python loop."""
    total = int(reps.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    starts = np.zeros(len(reps), np.int64)
    starts[1:] = np.cumsum(reps[:-1])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, reps)


RANGE_JOIN_SQL = f"""
SELECT p_partkey,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM({_CENTS}) AS BIGINT) AS sum_cents
FROM part, events
WHERE value BETWEEN p_size * 9.0 AND p_size * 9.0 + p_retailprice / 100.0
GROUP BY p_partkey
"""

# ---------------------------------------------------------------------------
# Ordered per-key window functions: row_number, lag, rolling 3-row sum,
# and a trailing time-RANGE window (sum/count over the last 60 s).
# Integer cents end-to-end so every sum is order-independent-exact.
# ---------------------------------------------------------------------------

_RANGE_WIN_US = 60_000_000  # trailing RANGE window width (60 s)


def _pack2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a, b) uint64 pairs → V16 big-endian keys whose memcmp order IS
    the lexicographic order — makes a two-key searchsorted a single
    np.searchsorted over void16 (verified in tests vs brute force)."""
    out = np.empty((len(a), 2), dtype=">u8")
    out[:, 0] = a
    out[:, 1] = b
    return out.reshape(-1).view([("k", "V16")])["k"]


def rolling_user_value(sf_dir: str):
    """Windowed aggregate over (user_id ORDER BY ts, event_id): row
    number, previous value (lag, -1 when none), the 3-row rolling sum,
    and the trailing 60-second RANGE window (count + sum, including ALL
    timestamp peers — SQL RANGE ... CURRENT ROW semantics) — one
    vectorized pass per hash partition (prefix sums with per-user window
    clamping; RANGE bounds via a two-key packed searchsorted; no per-row
    Python, no per-user map_groups calls).

    Partitioning assumption: a user's rows co-locate (shuffle key
    user_id % P with P ∝ rows); each partition sorts once with lexsort.
    """
    n_rows = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    num_parts = derive_num_parts(n_rows, rows_per_part=100_000)
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "part", pa.array((uid % num_parts).astype(np.int64)))

    def windows(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        cents = np.round(g["value"].to_numpy(np.float64) * 100).astype(np.int64)
        order = np.lexsort((eid, t, uid))
        uid, eid, cents, t = uid[order], eid[order], cents[order], t[order]
        n = len(uid)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = uid[1:] != uid[:-1]
        run_start = np.maximum.accumulate(np.where(new_run, np.arange(n), 0))
        rn = np.arange(n, dtype=np.int64) - run_start + 1
        lag = np.empty(n, dtype=np.int64)
        lag[0] = -1
        lag[1:] = np.where(new_run[1:], -1, cents[:-1])
        s = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(cents, out=s[1:])
        w = np.minimum(rn, 3)
        ar1 = np.arange(1, n + 1)
        roll3 = s[ar1] - s[ar1 - w]
        # trailing time-RANGE window [t−60s, t] per user, peers included:
        # rows are (uid, t)-sorted, so both bounds are two-key
        # searchsorteds over packed (uid, t−tmin) big-endian keys
        tb = (t - t.min()).astype(np.uint64)
        ub = uid.astype(np.uint64)
        keys = _pack2(ub, tb)
        win = np.uint64(_RANGE_WIN_US)
        lo = np.searchsorted(keys, _pack2(ub, np.maximum(tb, win) - win),
                             side="left")
        hi = np.searchsorted(keys, _pack2(ub, tb), side="right")
        win_n = (hi - lo).astype(np.int64)
        win60 = s[hi] - s[lo]
        return pd.DataFrame({"event_id": eid, "user_id": uid, "rn": rn,
                             "lag_cents": lag, "roll3_cents": roll3,
                             "win60_n": win_n, "win60_cents": win60})

    return ds.map_batches(add_part, batch_format="pyarrow",
                          batch_size=None) \
        .groupby("part").map_groups(windows, batch_format="pandas")


ROLLING_SQL = f"""
WITH e AS (SELECT event_id, user_id, ts,
                  {_CENTS} AS cents FROM events)
SELECT event_id, user_id,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(COALESCE(LAG(cents) OVER w, -1) AS BIGINT) AS lag_cents,
       CAST(SUM(cents) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS roll3_cents,
       CAST(COUNT(*) OVER r AS BIGINT) AS win60_n,
       CAST(SUM(cents) OVER r AS BIGINT) AS win60_cents
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
            r AS (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 60 SECONDS PRECEDING
                        AND CURRENT ROW)
"""

# ---------------------------------------------------------------------------
# Grouped top-N: top 3 orders by o_totalprice per market segment.
# ---------------------------------------------------------------------------

_TOPN = 3


def topn_orders_per_segment(sf_dir: str, n: int = _TOPN):
    """Per-group top-N as partial-top-N (map-side, per batch) + one tiny
    final merge per group: only n × n_batches × n_groups candidate rows
    ever shuffle — never the order table.  Ties on price break to the
    smaller o_orderkey (deterministic; mirrors the SQL ORDER BY).

    Partitioning assumption: the group key (market segment) is
    bounded-cardinality — the same contract tile_assign's
    combine_partials documents.  The customer→segment side joins via
    Ray's hash join with a scale-derived partition count.
    """
    n_ord = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(cust, join_type="inner",
                         num_partitions=derive_num_parts(
                             n_ord, rows_per_part=250_000),
                         on=("o_custkey",), right_on=("c_custkey",))

    def partial_top(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "seg": np.asarray(t["c_mktsegment"]),
            "okey": t["o_orderkey"].to_numpy(zero_copy_only=False),
            "price": t["o_totalprice"].to_numpy(zero_copy_only=False)})
        df = df.sort_values(["seg", "price", "okey"],
                            ascending=[True, False, True])
        return pa.Table.from_pandas(df.groupby("seg").head(n),
                                    preserve_index=False)

    def final_top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["price", "okey"], ascending=[False, True]).head(n)
        out = g.rename(columns={"seg": "c_mktsegment", "okey": "o_orderkey",
                                "price": "o_totalprice"}).reset_index(drop=True)
        out["rn"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out[["c_mktsegment", "rn", "o_orderkey", "o_totalprice"]]

    partials = joined.map_batches(partial_top, batch_format="pyarrow",
                                  batch_size=None)
    return partials.groupby("seg").map_groups(final_top, batch_format="pandas")


TOPN_SEGMENT_SQL = f"""
SELECT c_mktsegment, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) WHERE rn <= {_TOPN}
"""

# ---------------------------------------------------------------------------
# Distributed exact order statistics (quantile_disc) via histogram
# refinement: 3 streaming passes, no per-group full sort, no driver loop over
# rows.  DuckDB's quantile_disc convention (verified empirically):
# element at 0-based index ceil(q·n) − 1 of the sorted group.
# ---------------------------------------------------------------------------

_QS = (0.5, 0.9, 0.99)
_Q_BUCKETS = 4096


class _QuantileScaffold:
    """Passes 1–2 of the histogram-refinement quantile plan plus the
    rank→bucket locator and the pass-3 targeted gather — shared by the
    ``quantile_disc`` (quantiles_events) and ``quantile_cont``
    (quantiles_cont_events) variants.  See quantiles_events for the
    partitioning assumptions and the 100-TB posture of each pass."""

    def __init__(self, path: str):
        from s2geometry_ray.stages.tile_assign import combine_partials

        self.path = path

        # pass 1: per-group min / max / count
        def p1(t: pa.Table) -> pa.Table:
            g, c = self.to_cents(t)
            df = pd.DataFrame({"g": g, "c": c}).groupby("g")["c"] \
                .agg(["min", "max", "size"]).reset_index()
            return pa.Table.from_pandas(
                df.rename(columns={"min": "lo", "max": "hi", "size": "n"}),
                preserve_index=False)

        stats = combine_partials(
            self.read().map_batches(p1, batch_format="pyarrow",
                                    batch_size=None),
            "g", {"lo": "min", "hi": "max", "n": "sum"}) \
            .to_pandas().sort_values("g").reset_index(drop=True)
        self.groups = stats["g"].to_numpy()
        self.glo = stats["lo"].to_numpy(np.int64)
        ghi = stats["hi"].to_numpy(np.int64)
        self.gn = stats["n"].to_numpy(np.int64)
        self.gidx = {g: i for i, g in enumerate(self.groups)}
        self.width = np.maximum((ghi - self.glo + _Q_BUCKETS) // _Q_BUCKETS,
                                1)

        # pass 2: per-(group, bucket) histogram
        def p2(t: pa.Table) -> pa.Table:
            key = self.bucket_key(*self.to_cents(t))
            uk, cnt = np.unique(key, return_counts=True)
            return pa.table({"key": pa.array(uk, type=pa.int64()),
                             "cnt": pa.array(cnt.astype(np.int64))})

        hist = combine_partials(
            self.read().map_batches(p2, batch_format="pyarrow",
                                    batch_size=None),
            "key", {"cnt": "sum"}).to_pandas()
        hk = hist["key"].to_numpy(np.int64)
        hc = hist["cnt"].to_numpy(np.int64)
        order = np.argsort(hk)
        hk, hc = hk[order], hc[order]
        # per-group (bucket ids, cumulative counts) for the locator
        self._bk, self._cum = [], []
        for i in range(len(self.groups)):
            m = (hk // _Q_BUCKETS) == i
            self._bk.append(hk[m] % _Q_BUCKETS)
            self._cum.append(np.cumsum(hc[m]))

    def read(self):
        return rd.read_parquet(self.path, columns=["event_type", "value"])

    @staticmethod
    def to_cents(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        g = np.asarray(t["event_type"])
        c = np.round(t["value"].to_numpy(zero_copy_only=False) * 100
                     ).astype(np.int64)
        return g, c

    def bucket_key(self, g: np.ndarray, c: np.ndarray) -> np.ndarray:
        gi = np.fromiter((self.gidx[x] for x in g), np.int64, len(g))
        b = np.clip((c - self.glo[gi]) // self.width[gi], 0, _Q_BUCKETS - 1)
        return gi * _Q_BUCKETS + b

    def locate(self, i: int, k: int) -> tuple[int, int]:
        """Group i, 0-based rank k → (bucket key, residual rank)."""
        cum, bk = self._cum[i], self._bk[i]
        j = int(np.searchsorted(cum, k, side="right"))
        resid = k - (int(cum[j - 1]) if j else 0)
        return i * _Q_BUCKETS + int(bk[j]), resid

    def gather(self, want_keys: np.ndarray) -> dict[int, np.ndarray]:
        """Pass 3: sorted cents of ONLY the selected buckets."""
        wk = np.sort(want_keys)

        def p3(t: pa.Table) -> pa.Table:
            g, c = self.to_cents(t)
            key = self.bucket_key(g, c)
            m = np.isin(key, wk)
            return pa.table({"key": pa.array(key[m]),
                             "c": pa.array(c[m], type=pa.int64())})

        gathered = self.read().map_batches(p3, batch_format="pyarrow",
                                           batch_size=None).to_pandas()
        return {int(key): np.sort(grp["c"].to_numpy(np.int64))
                for key, grp in gathered.groupby("key")}


def quantiles_events(sf_dir: str, qs: tuple = _QS):
    """Exact per-group quantiles of integer cents with bounded memory:

    1. per-group (min, max, count) from map-side partials;
    2. per-(group, bucket) counts over a fixed _Q_BUCKETS histogram of
       the group's range — partials combine to ≤ groups × buckets rows;
    3. prefix sums locate the bucket holding each target rank; ONLY the
       rows of those buckets are gathered (expected n/buckets per
       group) and the exact order statistic is selected.

    Partitioning assumption: the group key is bounded-cardinality (the
    combine_partials contract) and no single histogram bucket is
    pathological — a near-constant column concentrates one bucket, in
    which case the gather for that bucket approaches the group size
    (documented limit; a second refinement level would bound it).

    100-TB posture: every pass is a map_batches partial + tiny combine;
    the full column never shuffles and never sorts globally.
    """
    ns = _QuantileScaffold(f"{sf_dir}/events.parquet")
    want: dict[int, list[tuple[float, int, int]]] = {}
    for i in range(len(ns.groups)):
        for q in qs:
            k = int(np.ceil(q * ns.gn[i])) - 1
            key, resid = ns.locate(i, k)
            want.setdefault(key, []).append((q, resid, i))
    vals_by_key = ns.gather(np.array(sorted(want), dtype=np.int64))
    out_g, out_q, out_v = [], [], []
    for key, items in want.items():
        vals = vals_by_key[key]
        for q, resid, i in items:
            out_g.append(ns.groups[i])
            out_q.append(int(round(q * 100)))
            out_v.append(int(vals[resid]))
    res = pa.table({"event_type": pa.array(out_g, type=pa.string()),
                    "q_pct": pa.array(out_q, type=pa.int64()),
                    "value_cents": pa.array(out_v, type=pa.int64())})
    return rd.from_arrow(res)


def quantiles_cont_events(sf_dir: str, qs: tuple = _QS):
    """INTERPOLATED per-group quantiles (``quantile_cont`` semantics:
    idx = q·(n−1), value = v⌊idx⌋ + (v⌊idx⌋₊₁ − v⌊idx⌋)·frac) through
    the same 3-pass histogram plan — both bracketing order statistics
    are located and gathered, then combined with the IDENTICAL IEEE
    expression the SQL twin spells out (the twin interpolates
    explicitly from ROW_NUMBER ranks rather than calling DuckDB's
    quantile_cont, whose internal float association is unspecified)."""
    ns = _QuantileScaffold(f"{sf_dir}/events.parquet")
    want: dict[int, list[tuple[float, int, int, int]]] = {}
    for i in range(len(ns.groups)):
        n = int(ns.gn[i])
        for q in qs:
            idx = q * (n - 1)
            k0 = int(np.floor(idx))
            for part, k in ((0, k0), (1, min(k0 + 1, n - 1))):
                key, resid = ns.locate(i, k)
                want.setdefault(key, []).append((q, resid, i, part))
    vals_by_key = ns.gather(np.array(sorted(want), dtype=np.int64))
    picked: dict[tuple[int, float], dict[int, int]] = {}
    for key, items in want.items():
        vals = vals_by_key[key]
        for q, resid, i, part in items:
            picked.setdefault((i, q), {})[part] = int(vals[resid])
    out_g, out_q, out_v = [], [], []
    for (i, q), parts in sorted(picked.items(), key=lambda kv: kv[0][0]):
        n = int(ns.gn[i])
        idx = q * (n - 1)
        f = np.floor(idx)
        lo = parts[0]
        hi = parts.get(1, lo)
        out_g.append(ns.groups[i])
        out_q.append(int(round(q * 100)))
        out_v.append(float(lo + (hi - lo) * (idx - f)))
    res = pa.table({"event_type": pa.array(out_g, type=pa.string()),
                    "q_pct": pa.array(out_q, type=pa.int64()),
                    "value_interp": pa.array(out_v, type=pa.float64())})
    return rd.from_arrow(res)


QUANTILES_SQL = " UNION ALL ".join(
    f"SELECT event_type, CAST({int(q * 100)} AS BIGINT) AS q_pct, "
    f"CAST(quantile_disc({_CENTS}, {q}) AS BIGINT) "
    f"AS value_cents FROM events GROUP BY event_type"
    for q in _QS)

# ---------------------------------------------------------------------------
# O2 breadth: parquet → JSONL → parquet roundtrip (ray.data read_json /
# write_json), value-checked like the CSV twin.
# ---------------------------------------------------------------------------


def io_roundtrip_jsonl(sf_dir: str):
    """Documents flow parquet → Ray write_json (JSONL) → Ray read_json;
    the reloaded rows are checked VALUE-EXACT against the original table
    (doc_id + exact char length survive the hop; JSON escaping bugs or
    lossy type inference would show as a mismatch)."""
    import shutil
    import tempfile

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    tmp = tempfile.mkdtemp(prefix="io_jsonl_", dir="/tmp")
    docs.write_json(tmp)
    back = rd.read_json(tmp)

    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "lang": pc.cast(t["lang"], pa.string()),
            "text_len": pc.cast(pc.utf8_length(pc.cast(t["text"], pa.string())),
                                pa.int64()),
        })

    out = back.map_batches(project, batch_format="pyarrow",
                           batch_size=None).materialize()
    shutil.rmtree(tmp, ignore_errors=True)
    return out


IO_JSONL_SQL = """
SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS text_len FROM documents
"""


def _qcont_member(q: float) -> str:
    # CAST to DOUBLE: a bare 0.9 literal is DECIMAL in DuckDB (exact
    # decimal arithmetic), which would diverge from the engine's IEEE
    # doubles in the last places of q·(n−1)
    qd = f"CAST({q!r} AS DOUBLE)"
    return f"""SELECT lo.event_type, CAST({int(round(q * 100))} AS BIGINT) AS q_pct,
       lo.c + (hi.c - lo.c)
       * ({qd} * (lo.n - 1) - floor({qd} * (lo.n - 1))) AS value_interp
FROM r lo JOIN r hi ON hi.event_type = lo.event_type
WHERE lo.rk = CAST(floor({qd} * (lo.n - 1)) AS BIGINT)
  AND hi.rk = LEAST(lo.rk + 1, lo.n - 1)"""


# interpolation spelled out from ROW_NUMBER ranks with the engine's own
# IEEE expression — NOT DuckDB's quantile_cont, whose internal float
# association is unspecified
QUANTILES_CONT_SQL = f"""
WITH e AS (SELECT event_type,
                  {_CENTS} AS c FROM events),
r AS (SELECT event_type, c,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) - 1
               AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n FROM e)
""" + "\nUNION ALL\n".join(_qcont_member(q) for q in _QS)


# ---------------------------------------------------------------------------
# ROLLUP (multi-level aggregation): per-(event_type, day) counts plus
# per-type subtotals and the grand total in one result — GROUP BY ROLLUP
# parity.  NULL grouping slots are COALESCEd to sentinels ('ALL' / -1)
# on both sides so the driver's value-hash sees identical rows.
# ---------------------------------------------------------------------------


def rollup_event_day_counts(sf_dir: str):
    """Base (event_type, day) counts come from map-side partials + the
    bounded combine (types × days keys); the subtotal and grand-total
    levels DERIVE from that aggregate on the driver — no second scan,
    no extra shuffle (the rollup of an algebraic aggregate is itself
    algebraic over the base cells)."""
    from s2geometry_ray.pipelines.tpch import _US_PER_DAY
    from s2geometry_ray.stages.tile_assign import combine_partials

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"])
        us = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        day = us // _US_PER_DAY  # numpy // floors — matches the SQL twin
        df = pd.DataFrame({"event_type": et, "day_bucket": day})
        g = df.groupby(["event_type", "day_bucket"], as_index=False) \
            .size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    base = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["event_type", "day_bucket"], {"n": "sum"}).to_pandas()
    base["lvl"] = np.int64(0)
    sub = base.groupby("event_type", as_index=False)["n"].sum()
    sub["day_bucket"] = np.int64(-1)
    sub["lvl"] = np.int64(1)
    grand = pd.DataFrame({"event_type": ["ALL"], "day_bucket": [np.int64(-1)],
                          "n": [base["n"].sum()], "lvl": [np.int64(3)]})
    cols = ["event_type", "day_bucket", "n", "lvl"]
    out = pd.concat([base[cols], sub[cols], grand], ignore_index=True)
    for c in ("day_bucket", "n", "lvl"):
        out[c] = out[c].astype(np.int64)
    return rd.from_pandas(out)


def rollup_sql() -> str:
    from s2geometry_ray.pipelines.tpch import _floor_div_day_sql

    day = _floor_div_day_sql("epoch_us(ts)")
    return f"""
SELECT COALESCE(event_type, 'ALL') AS event_type,
       CAST(COALESCE(day_bucket, -1) AS BIGINT) AS day_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(GROUPING(event_type) * 2 + GROUPING(day_bucket) AS BIGINT)
         AS lvl
FROM (SELECT event_type, {day} AS day_bucket FROM events)
GROUP BY ROLLUP(event_type, day_bucket)
"""


# ---------------------------------------------------------------------------
# O2 breadth: parquet → RCF1 (the from-scratch columnar fragment format,
# sources/rcf.py) → projected read — value-exact roundtrip with COLUMN
# PRUNING exercised (text is never decoded on the way back).
# ---------------------------------------------------------------------------


def io_roundtrip_rcf(sf_dir: str):
    """Documents flow parquet → RCF1 fragments (written inside map
    tasks, content-hash named) → ``read_rcf`` projecting only
    (doc_id, lang, n_chars); the big text column's payload is skipped
    at decode.  Value-exact vs the source table."""
    import shutil
    import tempfile

    from s2geometry_ray.sources.rcf import read_rcf, write_rcf

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang", "n_chars"])
    tmp = tempfile.mkdtemp(prefix="io_rcf_", dir="/tmp")
    manifest = write_rcf(docs, tmp)
    assert manifest.count() > 0
    out = read_rcf(tmp, columns=["doc_id", "lang", "n_chars"]).materialize()
    shutil.rmtree(tmp, ignore_errors=True)
    return out


IO_RCF_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CAST(n_chars AS BIGINT) AS n_chars FROM documents
"""
