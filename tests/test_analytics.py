"""Tests for the analytics operator family (pipelines/analytics):
HLL sketch exactness/mergeability/accuracy, cap-region distance join vs
brute force, TF-IDF tie semantics vs DuckDB, RE2 scan parity on strings
with real PII shapes, pivot loud-failure contract.
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

from s2geometry_ray.pipelines import analytics as A  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def _cmp_sql(got: pd.DataFrame, con, sql: str):
    want = con.sql(sql).df()
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    return a


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_clz64_exact():
    """Vectorized clz == python int.bit_length on edges + random u64."""
    rng = np.random.default_rng(3)
    w = np.concatenate([
        np.array([0, 1, 2, 3, (1 << 63), (1 << 64) - 1, 1 << 32],
                 dtype=np.uint64),
        rng.integers(0, 1 << 63, 10_000).astype(np.uint64),
    ])
    got = A._clz64(w)
    want = np.array([64 - int(x).bit_length() for x in w], dtype=np.int64)
    np.testing.assert_array_equal(got, want)


def test_hll_sketch_merge_associative():
    """max-merge of two half sketches == sketch of the whole — the
    mergeable-sketch contract that makes the map-side partials exact."""
    rng = np.random.default_rng(11)
    uid = rng.integers(0, 50_000, 100_000).astype(np.int64)
    b, r = A._hll_rows(uid, A._HLL_SEED)

    def regs(bk, rh):
        m = np.zeros(A._HLL_M, dtype=np.int64)
        np.maximum.at(m, bk, rh)
        return m

    whole = regs(b, r)
    h = len(uid) // 2
    merged = np.maximum(regs(b[:h], r[:h]), regs(b[h:], r[h:]))
    np.testing.assert_array_equal(whole, merged)


def test_hll_estimate_accuracy():
    """Estimate within 5% of the true cardinality across 3 orders of
    magnitude (m=1024 → theoretical ~3.25% standard error)."""
    rng = np.random.default_rng(7)
    for true_n in (300, 20_000, 500_000):
        uid = rng.choice(np.arange(true_n, dtype=np.int64) + 10_000_000,
                         size=true_n * 2, replace=True)
        b, r = A._hll_rows(uid, A._HLL_SEED)
        sk = pd.DataFrame({"event_type": "x", "bucket": b, "rho": r}) \
            .groupby(["event_type", "bucket"], as_index=False)["rho"].max() \
            .rename(columns={"rho": "max_rho"})
        est = A.hll_estimate(sk)["x"]
        true = len(np.unique(uid))
        assert abs(est - true) / true < 0.05, (true_n, est, true)


def test_hll_sketch_events_matches_sql(ray_session):
    got = A.hll_sketch_events(SF_SMOKE).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'")
    a = _cmp_sql(got, con, A.hll_sketch_sql())
    # sanity: estimates from the gate sketch track the true distincts
    est = A.hll_estimate(a)
    true = con.sql("SELECT event_type, COUNT(DISTINCT user_id) AS n "
                   "FROM events GROUP BY 1").df().set_index("event_type")["n"]
    for g, e in est.items():
        assert abs(e - true[g]) / true[g] < 0.1, (g, e, true[g])


# ---------------------------------------------------------------------------
# distance join
# ---------------------------------------------------------------------------


def test_distance_join_matches_bruteforce(ray_session):
    """Covering-pruned cap join == brute-force chord test on every
    (site, event) pair — proves the probe prunes nothing it shouldn't."""
    from s2geometry_ray.kernels.cellid import latlng_to_xyz
    from s2geometry_ray.sources.geotag import derive_lat, derive_lng

    got = A.distance_join_sites_events(SF_SMOKE).to_pandas()
    ev = pq.read_table(f"{SF_SMOKE}/events.parquet", columns=["event_id"])
    eid = ev["event_id"].to_numpy()
    xyz = latlng_to_xyz(derive_lat(eid), derive_lng(eid))
    rows = []
    for sid, cap in A._site_caps():
        d = xyz - np.asarray(cap.center)
        m = np.einsum("ij,ij->i", d, d) <= 2.0 * cap.height
        rows.append(pd.DataFrame({"site_id": sid, "event_id": eid[m]}))
    want = pd.concat(rows, ignore_index=True)
    a = got.sort_values(["site_id", "event_id"]).reset_index(drop=True)
    b = want.sort_values(["site_id", "event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(a) > 0
    assert a["site_id"].nunique() > 1


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


def test_tfidf_crafted_ties_and_empty_docs(ray_session):
    """Crafted corpus: score ties break by term asc; letter-free and
    empty docs vanish from the output on both engines; punctuation and
    case split terms identically."""
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "aa bb aa cc",          # tf tie aa=2 vs (bb, cc)=1
            "aa cc cc",
            "",                     # empty
            "123 ,,, 456",          # no letters
            "xx yy zz ww vv",       # 5 singleton terms, df all 1 → term asc
            "Aa aa AA",             # case splits terms
        ],
        "lang": ["en"] * 6,
    })
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                       os.path.join(tmp, "documents.parquet"))
        got = A.tfidf_top_terms(tmp).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{tmp}/documents.parquet'")
        a = _cmp_sql(got, con, A.TFIDF_SQL)
    assert set(a["doc_id"]) == {0, 1, 4, 5}
    top4 = a[a["doc_id"] == 4].sort_values("rn")["term"].tolist()
    assert top4 == ["vv", "ww", "xx"]  # equal scores → term ascending


def test_tfidf_smoke_table_matches_sql(ray_session):
    got = A.tfidf_top_terms(SF_SMOKE).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{SF_SMOKE}/documents.parquet'")
    a = _cmp_sql(got, con, A.TFIDF_SQL)
    assert (a.groupby("doc_id")["rn"].max() <= A._TFIDF_TOPN).all()


# ---------------------------------------------------------------------------
# regex scan + pivot
# ---------------------------------------------------------------------------


def test_regex_scan_with_real_pii(ray_session):
    """Strings with actual emails/urls/digits — Arrow RE2 counts equal
    DuckDB RE2 counts including overlapping-adjacent and null cases."""
    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [
            "mail a.b@c.d and x@y.z twice",
            "see https://ex.com/a_b and http://t.co/x now",
            "digits 123 456x789",
            "tabs table tables stack scan scn",
            "",
        ],
    })
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                       os.path.join(tmp, "documents.parquet"))
        got = A.regex_scan_docs(tmp).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{tmp}/documents.parquet'")
        a = _cmp_sql(got, con, A.REGEX_SCAN_SQL)
    assert a.loc[a["doc_id"] == 0, "n_email"].item() == 2
    assert a.loc[a["doc_id"] == 1, "n_url"].item() == 2
    assert a.loc[a["doc_id"] == 2, "n_digits"].item() == 3


def test_pivot_unknown_event_type_fails_loudly(ray_session):
    ev = pd.DataFrame({
        "user_id": np.array([1, 2], dtype=np.int64),
        "event_type": ["click", "mystery"],
    })
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                       os.path.join(tmp, "events.parquet"))
        with pytest.raises(Exception, match="unknown event_type"):
            A.pivot_user_event_counts(tmp).materialize()


def test_pivot_matches_sql(ray_session):
    got = A.pivot_user_event_counts(SF_SMOKE).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'")
    a = _cmp_sql(got, con, A.PIVOT_SQL)
    # row counts reconstruct the table size
    assert int(a[[c for c in a.columns if c.startswith("n_")]].sum().sum()) \
        == pq.read_metadata(f"{SF_SMOKE}/events.parquet").num_rows


# ---------------------------------------------------------------------------
# voronoi assignment + geofence transitions
# ---------------------------------------------------------------------------


def test_voronoi_assign_matches_bruteforce(ray_session):
    """Nearest-site assignment == driver-side argmin over every
    (event, site) distance, with first-minimum tie semantics."""
    from s2geometry_ray.kernels.cellid import latlng_to_xyz
    from s2geometry_ray.sources.geotag import derive_lat, derive_lng

    got = A.voronoi_assign_events(SF_SMOKE).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    eid = pq.read_table(f"{SF_SMOKE}/events.parquet",
                        columns=["event_id"])["event_id"].to_numpy()
    xyz = latlng_to_xyz(derive_lat(eid), derive_lng(eid))
    ids, centers, _thr = A._site_matrix()
    d = xyz[:, None, :] - centers[None, :, :]
    near = ids[np.argmin(np.einsum("nsj,nsj->ns", d, d), axis=1)]
    want = pd.DataFrame({"event_id": eid, "site_id": near}) \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["site_id"].nunique() > 1
    assert len(got) == len(eid)              # every event is assigned


def test_geofence_transitions_crafted(ray_session):
    """Crafted user journeys: an in→out→in path emits exactly the two
    flips; an always-out user emits nothing; ts ties order by event_id."""
    from s2geometry_ray.kernels.cellid import xyz_to_latlng
    from s2geometry_ray.sources.geotag import derive_lat, derive_lng

    # event_ids whose derived geotag is inside/outside the fence union
    ids = np.arange(5000, dtype=np.int64)
    from s2geometry_ray.kernels.cellid import latlng_to_xyz

    xyz = latlng_to_xyz(derive_lat(ids), derive_lng(ids))
    _sids, centers, thr = A._site_matrix()
    d = xyz[:, None, :] - centers[None, :, :]
    inside = (np.einsum("nsj,nsj->ns", d, d) <= thr[None, :]).any(axis=1)
    in_ids = ids[inside][:2]
    out_ids = ids[~inside][:3]
    assert len(in_ids) == 2 and len(out_ids) == 3
    # user 1: in, out, in  (2 flips)  — user 2: out, out (0 flips)
    ev = pd.DataFrame({
        "event_id": np.concatenate([in_ids[:1], out_ids[:1], in_ids[1:2],
                                    out_ids[1:]]).astype(np.int64),
        "user_id": np.array([1, 1, 1, 2, 2], dtype=np.int64),
        "ts": pd.to_datetime([10, 20, 30, 10, 20], unit="s"),
    })
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                       os.path.join(tmp, "events.parquet"))
        got = A.geofence_transitions_events(tmp).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{tmp}/events.parquet'")
        _cmp_sql(got, con, A.geofence_transitions_sql())
    assert set(got["user_id"]) == {1}
    assert got["entered"].tolist() in ([0, 1], [1, 0])
    assert len(got) == 2


# ---------------------------------------------------------------------------
# Bloom-filter join pruning
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_fpr():
    from s2geometry_ray.functions import bloom as B

    rng = np.random.default_rng(23)
    members = rng.choice(1 << 40, 100_000, replace=False).astype(np.int64)
    n_bits, k = B.bloom_params(len(members))
    words = np.zeros(n_bits >> 6, dtype=np.uint64)
    B._or_into(words, members, n_bits, k)
    assert B.bloom_contains(words, members, n_bits, k).all()  # NO false negs
    probe = rng.choice(1 << 40, 200_000, replace=False).astype(np.int64)
    probe = probe[~np.isin(probe, members)]
    fpr = B.bloom_contains(words, probe, n_bits, k).mean()
    assert fpr < 0.01, fpr                                    # 16b/key, k=7


def test_bloom_join_pruned_equals_unpruned_and_sql(ray_session):
    got = A.bloom_join_urgent_revenue(SF_SMOKE).to_pandas()
    plain = A.bloom_join_urgent_revenue(SF_SMOKE, prune=False).to_pandas()
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        plain[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False)
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    _cmp_sql(got, con, A.BLOOM_JOIN_SQL)


def test_bloom_prefilter_selectivity(ray_session):
    """The pruning stage actually prunes: surviving probe rows ≈ the
    build side's share (+FPR), far below the full table."""
    import ray

    from s2geometry_ray.functions import bloom as B

    import ray.data as rd

    urgent = rd.read_parquet(f"{SF_SMOKE}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(lambda t: t.filter(
            __import__("pyarrow.compute", fromlist=["equal"])
            .equal(t["o_orderpriority"], "1-URGENT")),
            batch_format="pyarrow", batch_size=None)
    n_orders = pq.read_metadata(f"{SF_SMOKE}/orders.parquet").num_rows
    n_bits, k = B.bloom_params(n_orders)
    words_ref = ray.put(B.build_bloom(urgent, "o_orderkey", n_bits, k))
    li = rd.read_parquet(f"{SF_SMOKE}/lineitem.parquet",
                         columns=["l_orderkey"])
    total = li.count()
    kept = B.bloom_prefilter(li, "l_orderkey", words_ref, n_bits, k).count()
    urgent_share = duckdb.sql(
        f"SELECT count(*) FILTER (o_orderpriority = '1-URGENT') * 1.0 "
        f"/ count(*) FROM '{SF_SMOKE}/orders.parquet'").fetchone()[0]
    assert kept < total * (urgent_share + 0.05)
    assert kept > 0


# ---------------------------------------------------------------------------
# JSON field extraction
# ---------------------------------------------------------------------------


def test_json_field_stats_garbage_and_missing(ray_session):
    """props rows that are garbage / missing the key / null count into
    n but not n_k, and never poison sum/max — matching the NULLIF'd
    DuckDB twin exactly."""
    ev = pd.DataFrame({
        "event_type": ["a", "a", "a", "b", "b"],
        "props": ['{"k": 7}', "garbage", '{"j": 1}', '{"k": 0}', None],
    })
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                       os.path.join(tmp, "events.parquet"))
        got = A.json_field_stats_events(tmp).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{tmp}/events.parquet'")
        a = _cmp_sql(got, con, A.JSON_FIELD_SQL)
    row_a = a[a["event_type"] == "a"].iloc[0]
    assert (row_a["n"], row_a["n_k"], row_a["sum_k"], row_a["max_k"]) \
        == (3, 1, 7, 7)
    row_b = a[a["event_type"] == "b"].iloc[0]
    assert (row_b["n"], row_b["n_k"], row_b["sum_k"], row_b["max_k"]) \
        == (2, 1, 0, 0)


# ---------------------------------------------------------------------------
# end-to-end corpus curation
# ---------------------------------------------------------------------------


def test_corpus_curation_with_planted_duplicates(ray_session):
    """Crafted corpus: exact duplicates collapse to the min doc_id,
    near-duplicates (one word changed in a 40-word doc) collapse via
    the LSH→Jaccard→components chain, short docs are quality-filtered,
    and the survivor set + shards match the assembled SQL twin."""
    base = " ".join(f"w{i} common word text" for i in range(12))  # 48 words
    near = base.replace("w3", "XX", 1)
    docs = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [
            base,                 # 0: representative
            base,                 # 1: exact dup of 0 → dropped
            near,                 # 2: near-dup of 0 → dropped (jac >= .5)
            "short doc",          # 3: quality-filtered
            " ".join(f"z{i} alpha beta gamma" for i in range(12)),  # 4
            " ".join(f"q{i} delta epsi zeta" for i in range(12)),   # 5
            base,                 # 6: exact dup of 0 → dropped
            " ".join(f"r{i} one two three" for i in range(12)),     # 7
        ],
    })
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                       os.path.join(tmp, "documents.parquet"))
        got = A.corpus_curation_docs(tmp).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{tmp}/documents.parquet'")
        a = _cmp_sql(got, con, A.corpus_curation_sql())
    assert set(a["doc_id"]) == {0, 4, 5, 7}
    assert a["shard"].between(0, A._CUR_SHARDS - 1).all()


def test_curation_no_near_dups_at_all(ray_session):
    """All-distinct corpus → zero LSH candidates → the pair join must
    degrade gracefully and every quality-passing doc survives."""
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": [" ".join(f"a{i}{j} foo bar baz" for j in range(12))
                 for i in range(3)],
    })
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                       os.path.join(tmp, "documents.parquet"))
        got = A.corpus_curation_docs(tmp).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{tmp}/documents.parquet'")
        a = _cmp_sql(got, con, A.corpus_curation_sql())
    assert set(a["doc_id"]) == {0, 1, 2}


def test_trajectory_distance_semantics(ray_session, tmp_path):
    """O53: step ordering is (ts, event_id), single-event users emit
    nothing, and the e9 sum matches a scalar recompute."""
    import pyarrow.parquet as pq2

    import pyarrow as pa
    import ray.data as rd

    from s2geometry_ray.kernels import cellid as vk
    from s2geometry_ray.pipelines.analytics import trajectory_distance_users
    from s2geometry_ray.sources.geotag import derive_lat, derive_lng

    # 3 users: u1 has 3 events (one ts tie broken by event_id), u2 has
    # 1 event (must not appear), u3 has 2
    eids = np.array([10, 11, 12, 20, 30, 31], dtype=np.int64)
    uids = np.array([1, 1, 1, 2, 3, 3], dtype=np.int64)
    ts = np.array([100, 100, 200, 50, 10, 5], dtype="datetime64[us]")
    tbl = pa.table({"event_id": pa.array(eids), "user_id": pa.array(uids),
                    "ts": pa.array(ts),
                    "value": pa.array(np.zeros(6))})
    pq2.write_table(tbl, tmp_path / "events.parquet")
    out = trajectory_distance_users(str(tmp_path)).to_pandas()
    out = out.set_index("user_id").sort_index()
    assert list(out.index) == [1, 3]

    def step(a, b):
        xa = vk.latlng_to_xyz(derive_lat(np.array([a])), derive_lng(np.array([a])))[0]
        xb = vk.latlng_to_xyz(derive_lat(np.array([b])), derive_lng(np.array([b])))[0]
        d = xb - xa
        return int(np.rint(np.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
                           * 1e9))

    # u1 order: (100,10) -> (100,11) -> (200,12); u3 order: ts 5 then 10
    assert out.loc[1, "chord_e9"] == step(10, 11) + step(11, 12)
    assert out.loc[1, "n_steps"] == 2
    assert out.loc[3, "chord_e9"] == step(31, 30)
    assert out.loc[3, "n_steps"] == 1


def test_colocation_pairs_semantics(ray_session, tmp_path):
    """O54: distinct-bucket co-occurrence counts vs a brute recompute;
    within-bucket duplicate events of one user count once; oversized
    buckets raise."""
    import itertools

    import pyarrow as pa
    import pyarrow.parquet as pq2

    from s2geometry_ray.kernels import cellid as vk
    from s2geometry_ray.pipelines.analytics import (_US_PER_DAY_AN,
                                                    colocation_pairs_users)
    from s2geometry_ray.sources.geotag import derive_lat, derive_lng

    rng = np.random.default_rng(5)
    n = 600
    eids = np.arange(n, dtype=np.int64)
    uids = rng.integers(0, 12, n).astype(np.int64)
    ts = (rng.integers(0, 10, n) * _US_PER_DAY_AN
          + rng.integers(0, _US_PER_DAY_AN, n)).astype("datetime64[us]")
    tbl = pa.table({"event_id": pa.array(eids), "user_id": pa.array(uids),
                    "ts": pa.array(ts), "value": pa.array(np.zeros(n))})
    pq2.write_table(tbl, tmp_path / "events.parquet")

    out = colocation_pairs_users(str(tmp_path), level=3).to_pandas()
    got = {(int(r.user_a), int(r.user_b)): int(r.n_cobuckets)
           for r in out.itertuples()}

    cell = vk.parent(vk.from_latlng(derive_lat(eids), derive_lng(eids)), 3)
    day = ts.view(np.int64) // _US_PER_DAY_AN
    buckets: dict[tuple, set] = {}
    for u, c, d in zip(uids, cell, day):
        buckets.setdefault((int(c), int(d)), set()).add(int(u))
    exp: dict[tuple, int] = {}
    for users in buckets.values():
        for a, b in itertools.combinations(sorted(users), 2):
            exp[(a, b)] = exp.get((a, b), 0) + 1
    assert got == exp
    assert max(got.values()) > 1  # multi-bucket pairs exercised

    with pytest.raises(Exception, match="users >"):
        colocation_pairs_users(str(tmp_path), level=0,
                               max_users_per_bucket=3).to_pandas()


def test_colocation_rejects_pre_1970_timestamps(ray_session, tmp_path):
    """A negative floored day would sign-extend into the packed cell|day
    bucket — the pipeline must fail loudly, never corrupt the key."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from s2geometry_ray.pipelines.analytics import colocation_pairs_users

    n = 8
    eids = np.arange(n, dtype=np.int64)
    ts = np.full(n, -86_400_000_000 * 3, dtype=np.int64) \
        .astype("datetime64[us]")
    tbl = pa.table({"event_id": pa.array(eids),
                    "user_id": pa.array(eids % 3),
                    "ts": pa.array(ts),
                    "value": pa.array(np.zeros(n))})
    pq2.write_table(tbl, tmp_path / "events.parquet")
    with pytest.raises(Exception, match="pre-1970"):
        colocation_pairs_users(str(tmp_path), level=3).to_pandas()


def test_cell_pyramid_invariants(ray_session, tmp_path):
    """O55: every level slice partitions N exactly, and each parent's
    count equals the sum of its children one level down."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from s2geometry_ray.kernels import cellid as vk
    from s2geometry_ray.pipelines.analytics import cell_pyramid_events

    n = 4000
    eids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"event_id": pa.array(eids),
                    "user_id": pa.array(eids % 7),
                    "ts": pa.array(np.zeros(n, dtype="datetime64[us]")),
                    "value": pa.array(np.ones(n) * 0.25)})
    pq2.write_table(tbl, tmp_path / "events.parquet")
    out = cell_pyramid_events(str(tmp_path), min_level=1,
                              max_level=4).to_pandas()
    for lv in range(1, 5):
        sl = out[out.level == lv]
        assert sl.n.sum() == n
        assert sl.value_cents.sum() == n * 25
    kids = out[out.level == 4].copy()
    kids["p"] = vk.parent(kids.cell_id.to_numpy().astype(np.uint64), 3)
    rolled = kids.groupby("p")["n"].sum()
    parents = out[out.level == 3].set_index("cell_id")["n"]
    assert rolled.sort_index().equals(parents.sort_index())


def test_rebalance_sample_semantics(ray_session):
    """O59: deterministic across runs, exact scalar threshold replay,
    and cells under target are kept whole."""
    from s2geometry_ray.functions.shuffle import _seed_mix, _splitmix64
    from s2geometry_ray.kernels import cellid as vk
    from s2geometry_ray.pipelines.analytics import rebalance_sample_events
    from s2geometry_ray.sources.geotag import derive_lat, derive_lng

    sf = "/root/testdata/sf0.001"
    a = rebalance_sample_events(sf, level=2, target=25, seed=21).to_pandas()
    b = rebalance_sample_events(sf, level=2, target=25, seed=21).to_pandas()
    assert sorted(a.event_id) == sorted(b.event_id)

    import pyarrow.parquet as pq2
    eid = pq2.read_table(f"{sf}/events.parquet", columns=["event_id"]) \
        ["event_id"].to_numpy(zero_copy_only=False)
    cell = vk.parent(vk.from_latlng(derive_lat(eid), derive_lng(eid)), 2)
    import collections
    n_by_cell = collections.Counter(cell.tolist())
    mix = np.uint64(_seed_mix(21))
    h = _splitmix64(eid.astype(np.uint64) ^ mix)
    kept = set()
    for e, c, hv in zip(eid, cell, h):
        n = n_by_cell[int(c)]
        thr = (1 << 64) - 1 if n <= 25 else (25 << 64) // n
        if int(hv) <= thr:
            kept.add(int(e))
    assert set(a.event_id) == kept
    # whole-kept small cells: every row of an under-target cell survives
    small = [c for c, n in n_by_cell.items() if n <= 25]
    assert small and all(
        (a.cell == np.uint64(c)).sum() == n_by_cell[c] for c in small[:5])
    # target <= 0 is a config error, not a sampling plan — fail loud
    with pytest.raises(ValueError, match="target must be >= 1"):
        rebalance_sample_events(sf, level=2, target=0)


def test_cell_smooth_matches_oracle_neighbors(ray_session, tmp_path):
    """O60: smoothed counts equal a scalar recompute using the ORACLE
    edge-neighbor function — includes cells on cube-face edges (geotags
    near ±180°), exercising the neighbor wrap."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from s2geometry_ray.kernels import cellid as vk
    from s2geometry_ray.oracle import s2 as o
    from s2geometry_ray.pipelines.analytics import cell_smooth_events
    from s2geometry_ray.sources.geotag import derive_lat, derive_lng

    n = 3000
    eids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"event_id": pa.array(eids),
                    "user_id": pa.array(eids % 5),
                    "ts": pa.array(np.zeros(n, dtype="datetime64[us]")),
                    "value": pa.array(np.zeros(n))})
    pq2.write_table(tbl, tmp_path / "events.parquet")
    out = cell_smooth_events(str(tmp_path), level=3).to_pandas()

    cells = vk.parent(vk.from_latlng(derive_lat(eids), derive_lng(eids)), 3)
    import collections
    cnt = collections.Counter(int(c) for c in cells)
    assert len(out) == len(cnt)
    for r in out.itertuples():
        c = int(r.cell_id)
        exp = cnt[c] + sum(cnt.get(nb, 0) for nb in o.edge_neighbors(c))
        assert (int(r.n), int(r.n_smooth)) == (cnt[c], exp)
    assert (out.n_smooth > out.n).any()   # neighbors actually contributed


def test_heavy_hitters_exact_with_evictions(ray_session):
    """O61: a Zipf stream with distinct keys >> k forces per-batch
    drops; the certified result must equal brute counting, and an
    uncertifiable configuration must raise rather than approximate."""
    import collections

    import pyarrow as pa
    import ray.data as rd

    from s2geometry_ray.functions.heavyhitters import heavy_hitters

    rng = np.random.default_rng(4)
    keys = rng.zipf(1.3, 60_000).astype(np.int64) % 5000  # ~3k distinct
    ds = rd.from_arrow(pa.table({"user_id": pa.array(keys)})) \
        .repartition(8)  # several batches -> several truncated partials

    got = heavy_hitters(ds, "user_id", topn=10, k=64).to_pandas()
    cnt = collections.Counter(keys.tolist())
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["user_id"], got["n"])) == want

    # same answer on a different partitioning (block-layout independence)
    got2 = heavy_hitters(ds.repartition(3), "user_id", topn=10,
                         k=64).to_pandas()
    assert got.equals(got2)

    # k too small for a near-uniform tail: certificate must fail loudly
    flat = rd.from_arrow(pa.table({
        "user_id": pa.array(np.arange(40_000, dtype=np.int64) % 2000)
    })).repartition(8)
    with pytest.raises(ValueError, match="cannot certify"):
        heavy_hitters(flat, "user_id", topn=10, k=16)
