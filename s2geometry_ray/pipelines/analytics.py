"""Web-scale analytics operators with value-exact DuckDB twins:

- ``distance_join_sites_events`` — within-radius (cap-region) spatial
  join: the range-search counterpart of kNN, run through the same
  covering-broadcast machinery as the rect joins;
- ``hll_sketch_events`` — distributed HyperLogLog distinct-count SKETCH
  (per-group register maxima) as mergeable map-side partials; the
  sketch rows are integer-exact, so the gate is hash-exact even though
  the estimate is approximate (``hll_estimate`` turns a sketch into the
  cardinality estimate — accuracy pinned in pytest);
- ``tfidf_top_terms`` — per-document top-N terms by tf·idf (linear idf
  = N/df): tokenize → in-batch tf → ONE term-partitioned shuffle that
  yields df as the term-group size (no separate df table, no join) →
  ONE doc-partitioned shuffle for the grouped top-N;
- ``regex_scan_docs`` — vectorized RE2 pattern counting (PII-shaped
  scan) via ``pyarrow.compute.count_substring_regex``; DuckDB's regex
  engine is also RE2, so ``len(regexp_extract_all(...))`` is an exact
  twin;
- ``pivot_user_event_counts`` — pivot (long → wide conditional counts)
  as map-side 2-D bincount partials + a hash-partitioned combine.

Every stage is an Arrow/numpy ``map_batches`` kernel; shuffles move
keys + small payloads only; partition counts derive from input size
(scale.derive_num_parts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from s2geometry_ray.functions.sqlnum import half_even_sql
from s2geometry_ray.scale import derive_num_parts

# ---------------------------------------------------------------------------
# Within-radius distance join (cap-region spatial join).
# Sites are FIXED query parameters (ids 0..N-1, geotagged by the same
# derive_lat/lng mixing as every gate point set), not rows of a table —
# so the SQL twin inlines their xyz centers as literals and stays valid
# at every scale factor.
# ---------------------------------------------------------------------------

_N_SITES = 12


def _site_caps():
    """The fixed site caps: center from derive_lat/lng(site_id), radius
    0.12 + 0.03·(id mod 5) rad (~7–14°).  Shared by the pipeline and
    the SQL builder so both sides use the IDENTICAL doubles."""
    from s2geometry_ray.kernels.regions import CapRegion
    from s2geometry_ray.sources.geotag import derive_lat, derive_lng

    ids = np.arange(_N_SITES, dtype=np.int64)
    lats = derive_lat(ids)
    lngs = derive_lng(ids)
    caps = []
    for i in range(_N_SITES):
        r = 0.12 + 0.03 * (i % 5)
        caps.append((i, CapRegion.from_latlng_radius(
            float(lats[i]), float(lngs[i]), r)))
    return caps


def distance_join_sites_events(sf_dir: str):
    """All events within each site's radius — (site_id, event_id) pairs.

    Plan: cover each cap once (driver — 12 regions), broadcast the
    CoveringIndex via ``ray.put``, stream event batches through the
    covering probe, and verify candidates with the exact chord-distance
    test.  ``interior`` fast-accepts are DISABLED for this gate: the
    interior flag comes from float cell predicates that are
    conservative in exact arithmetic but could (within an ulp) disagree
    with the SQL twin's chord test on a boundary-grazing point — forcing
    every candidate through the chord predicate makes engine and twin
    evaluate the IDENTICAL IEEE expression on identical inputs.  The
    interior fast path itself is exercised by the rect-join gates and
    the covering pytest oracle.

    100-TB posture: identical to the rect broadcast join — zero shuffle
    of the point table, covering table broadcast once, probe + verify
    vectorized per batch.
    """
    import ray

    from s2geometry_ray.pipelines.flagship import _points_ds
    from s2geometry_ray.stages.spatial_join import (
        CoveringIndex,
        make_spatial_join_fn,
    )

    index = CoveringIndex.build(_site_caps(), max_cells=32, max_level=10)
    index.interior = np.zeros_like(index.interior)  # exact verify for ALL
    index_ref = ray.put(index)
    pts = _points_ds(sf_dir)
    out = pts.map_batches(
        make_spatial_join_fn(index_ref, ["event_id"]),
        batch_format="pyarrow", batch_size=None)
    return out.map_batches(
        lambda t: pa.table({
            "site_id": pc.cast(t["tile_id"], pa.int64()),
            "event_id": t["event_id"]}),
        batch_format="pyarrow", batch_size=None)


def distance_join_sql() -> str:
    """Twin: cross join of the inlined site constants (repr round-trips
    every double exactly) against events, filtered by the same chord²
    predicate CapRegion.contains_points evaluates."""
    from s2geometry_ray.sources.geotag import derive_lat_sql, derive_lng_sql

    rows = []
    for sid, cap in _site_caps():
        cx, cy, cz = cap.center
        thr = 2.0 * cap.height
        rows.append(f"({sid}, {cx!r}, {cy!r}, {cz!r}, {thr!r})")
    values = ",\n         ".join(rows)
    lat = derive_lat_sql("event_id")
    lng = derive_lng_sql("event_id")
    return f"""
WITH sites AS (
  SELECT * FROM (VALUES {values})
    AS v(site_id, cx, cy, cz, thr)),
p AS (
  SELECT event_id,
         cos(radians({lat})) * cos(radians({lng})) AS px,
         cos(radians({lat})) * sin(radians({lng})) AS py,
         sin(radians({lat})) AS pz
  FROM events)
SELECT CAST(site_id AS BIGINT) AS site_id,
       CAST(event_id AS BIGINT) AS event_id
FROM sites, p
WHERE (px - cx) * (px - cx) + (py - cy) * (py - cy)
      + (pz - cz) * (pz - cz) <= thr
"""


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (p = 10, m = 1024 registers).
# The SKETCH (per-group register maxima) is the gate output: integer
# rows, bit-exact, mergeable by max — the distributed-sketch contract.
# ---------------------------------------------------------------------------

_HLL_P = 10
_HLL_M = 1 << _HLL_P
_HLL_SEED = 5

# leading zeros within one byte (index = byte value)
_CLZ8 = np.array(
    [8] + [7] + [6] * 2 + [5] * 4 + [4] * 8 + [3] * 16 + [2] * 32
    + [1] * 64 + [0] * 128, dtype=np.int64)


def _clz64(w: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros of uint64 (exact — no float log)."""
    b = np.ascontiguousarray(w, dtype=np.uint64).view(np.uint8)
    b = b.reshape(-1, 8)[:, ::-1]  # most-significant byte first (LE host)
    nz = b != 0
    first = np.argmax(nz, axis=1)
    got = _CLZ8[b[np.arange(len(w)), first]] + 8 * first
    return np.where(nz.any(axis=1), got, 64)


def _hll_rows(uid: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho) per value: splitmix64 hash → top-p-bit bucket →
    rank = clz(h << p) + 1 (the remaining 64−p bits; all-zero ⇒ 64−p+1)."""
    from s2geometry_ray.functions.shuffle import _seed_mix
    from s2geometry_ray.functions.text import _splitmix64

    h = _splitmix64(uid.astype(np.int64).view(np.uint64)
                    ^ np.uint64(_seed_mix(seed)))
    bucket = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    w = h << np.uint64(_HLL_P)
    rho = np.where(w == 0, 64 - _HLL_P + 1, _clz64(w) + 1)
    return bucket, rho


def hll_sketch_events(sf_dir: str):
    """Per-event_type HLL sketch of distinct user_ids: map-side partial
    register maxima per batch (≤ groups × m tiny rows), combined by MAX —
    the canonical mergeable-sketch reduction.  Only (group, bucket,
    max_rho) partials ever shuffle; the user column never does.

    Scale contract: output is groups × m rows regardless of input size
    (bounded-cardinality — the combine_partials contract)."""
    from s2geometry_ray.stages.tile_assign import combine_partials

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"])
        bucket, rho = _hll_rows(uid, _HLL_SEED)
        df = pd.DataFrame({"event_type": et, "bucket": bucket, "rho": rho})
        g = df.groupby(["event_type", "bucket"], as_index=False)["rho"].max()
        return pa.Table.from_pandas(
            g.rename(columns={"rho": "max_rho"}), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    return combine_partials(partials, ["event_type", "bucket"],
                            {"max_rho": "max"})


def hll_estimate(sketch: pd.DataFrame, p: int = _HLL_P) -> dict[str, float]:
    """Group → cardinality estimate from sketch rows (standard HLL with
    the linear-counting small-range correction).  Driver-side: a sketch
    is ≤ groups × m rows by construction."""
    m = 1 << p
    out = {}
    for g, grp in sketch.groupby("event_type"):
        regs = np.zeros(m, dtype=np.int64)
        regs[grp["bucket"].to_numpy(np.int64)] = grp["max_rho"].to_numpy(np.int64)
        z = np.sum(np.ldexp(1.0, -regs))
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / z
        v = int(np.sum(regs == 0))
        if e <= 2.5 * m and v > 0:
            e = m * np.log(m / v)
        out[g] = float(e)
    return out


def _sql_wrap_u64(expr: str) -> str:
    """numpy-style wrapping cast of a signed BIGINT to UBIGINT."""
    return (f"CAST(((CAST({expr} AS HUGEINT) % 18446744073709551616)"
            f" + 18446744073709551616) % 18446744073709551616 AS UBIGINT)")


def hll_sketch_sql() -> str:
    """Twin: recompute the full hash → bucket → rank chain in DuckDB.
    clz is pure-integer: bit-length = Σ_k [w ≥ 2^k] over exact UBIGINT
    comparisons, so rank = 65 − p − ... never touches a float."""
    from s2geometry_ray.functions.shuffle import _seed_mix, sql_splitmix64

    sm = _seed_mix(_HLL_SEED)
    h = sql_splitmix64(f"xor({_sql_wrap_u64('user_id')}, {sm})")
    shift = 1 << (64 - _HLL_P)
    bitlen = " + ".join(
        f"(CASE WHEN hw >= {1 << k} THEN 1 ELSE 0 END)" for k in range(64))
    return f"""
WITH h AS (SELECT event_type, {h} AS h FROM events),
w AS (SELECT event_type,
             CAST(h // {shift} AS BIGINT) AS bucket,
             CAST((CAST(h AS HUGEINT) * {_HLL_M})
                  % 18446744073709551616 AS HUGEINT) AS hw
      FROM h),
r AS (SELECT event_type, bucket,
             CASE WHEN hw = 0 THEN {64 - _HLL_P + 1}
                  ELSE 65 - ({bitlen}) END AS rho
      FROM w)
SELECT event_type, bucket, CAST(MAX(rho) AS BIGINT) AS max_rho
FROM r GROUP BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms per document (linear idf = N/df — monotone, and exact
# in IEEE doubles on both engines: one int→double cast + one division).
# ---------------------------------------------------------------------------

_TFIDF_TOPN = 3


def tfidf_top_terms(sf_dir: str, topn: int = _TFIDF_TOPN):
    """Per-doc top-N terms by tf · (N/df), tie-broken by term asc.

    Stages (two shuffles, both key-only):
    1. tokenize + tf: Arrow regex split over the utf8 buffer, parent-
       index flatten, in-batch (doc, term) counts — a doc's rows never
       leave its batch, so tf is complete map-side;
    2. df WITHOUT a join: tf rows hash-partition by term fingerprint;
       within a term-partition df(term) = row count of the term's group
       (each (doc, term) appears exactly once) — one groupby replaces
       the aggregate + re-join shuffle pair;
    3. grouped top-N: re-partition by doc_id, one lexsort per partition
       (score desc, term asc), run-length rank, keep rn ≤ N.

    Partitioning assumptions: a term's rows co-locate in stage 2 (hash
    of the term fingerprint — the vocabulary's heavy hitters are the
    skew risk and bound a partition at df_max rows); a doc's rows
    co-locate in stage 3 (≤ distinct terms per doc each).
    """
    from s2geometry_ray.functions.text import fingerprint_batch

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    p_term = derive_num_parts(n_docs, rows_per_part=20_000)
    p_doc = derive_num_parts(n_docs, rows_per_part=50_000)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def tf_batch(t: pa.Table) -> pa.Table:
        col = pc.cast(t["text"], pa.string())
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sp = pc.split_pattern_regex(col, "[^A-Za-z]+")
        parent = pc.list_parent_indices(sp).to_numpy(zero_copy_only=False)
        words = np.asarray(pc.list_flatten(sp))
        keep = words != ""
        doc = t["doc_id"].to_numpy(zero_copy_only=False)[parent[keep]]
        tf = (pd.DataFrame({"doc_id": doc, "term": words[keep]})
              .groupby(["doc_id", "term"], as_index=False).size()
              .rename(columns={"size": "tf"}))
        fp = fingerprint_batch(
            pa.table({"term": pa.array(tf["term"], type=pa.string())}),
            "term")["fp64"].to_numpy(zero_copy_only=False)
        # int64 shuffle key (uint64 group keys hit Ray's Python-int
        # overflow fallback — the documented pitfall)
        tf["part"] = (fp.view(np.uint64)
                      % np.uint64(p_term)).astype(np.int64)
        return pa.Table.from_pandas(tf, preserve_index=False)

    def with_df(g: pd.DataFrame) -> pd.DataFrame:
        df_per_term = g.groupby("term")["doc_id"].size()
        out = g[["doc_id", "term", "tf"]].copy()
        out["df"] = g["term"].map(df_per_term).to_numpy(np.int64)
        out["part2"] = out["doc_id"].to_numpy(np.int64) % p_doc
        return out

    def top_group(g: pd.DataFrame) -> pd.DataFrame:
        doc = g["doc_id"].to_numpy(np.int64)
        term = g["term"].to_numpy(object)
        tf = g["tf"].to_numpy(np.int64)
        dfv = g["df"].to_numpy(np.int64)
        score = (tf * n_docs).astype(np.float64) / dfv
        order = np.lexsort((term, -score, doc))
        doc, term, tf, dfv = doc[order], term[order], tf[order], dfv[order]
        n = len(doc)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = doc[1:] != doc[:-1]
        run_start = np.maximum.accumulate(np.where(new_run, np.arange(n), 0))
        rn = np.arange(n, dtype=np.int64) - run_start + 1
        m = rn <= topn
        return pd.DataFrame({"doc_id": doc[m], "rn": rn[m],
                             "term": term[m], "tf": tf[m], "df": dfv[m]})

    stage2 = (ds.map_batches(tf_batch, batch_format="pyarrow",
                             batch_size=None)
              .groupby("part").map_groups(with_df, batch_format="pandas"))
    return stage2.groupby("part2").map_groups(top_group,
                                              batch_format="pandas")


TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, term),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(tf.tf * n.n AS DOUBLE) / df.df DESC, tf.term
             ) AS rn
      FROM tf JOIN df USING (term), n)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(rn AS BIGINT) AS rn,
       term, tf, df
FROM s WHERE rn <= {_TFIDF_TOPN}
"""

# ---------------------------------------------------------------------------
# Vectorized regex scan (PII-shaped).  Both engines run RE2, so
# non-overlapping match counts agree exactly.
# ---------------------------------------------------------------------------

_SCAN_PATTERNS = {
    # PII-shaped (expected 0 on the synthetic corpus — the negative result
    # is part of the check)
    "n_email": r"[A-Za-z0-9_.]+@[A-Za-z0-9_.-]+",
    "n_url": r"https?://[A-Za-z0-9./_-]+",
    # discriminating patterns with real hits in the word corpus
    "n_digits": r"[0-9]+",
    "n_ta_words": r"ta[a-z]+",
    "n_sc": r"sc[a-z]*n",
}


def regex_scan_docs(sf_dir: str):
    """Per-doc counts of each scan pattern — one
    ``count_substring_regex`` kernel per pattern per batch, zero Python
    per row, no shuffle (embarrassingly parallel batch map)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def scan(t: pa.Table) -> pa.Table:
        text = pc.cast(t["text"], pa.string())
        cols = {"doc_id": t["doc_id"]}
        for name, pat in _SCAN_PATTERNS.items():
            cols[name] = pc.cast(pc.count_substring_regex(text, pat),
                                 pa.int64())
        return pa.table(cols)

    return ds.map_batches(scan, batch_format="pyarrow", batch_size=None)


REGEX_SCAN_SQL = "SELECT CAST(doc_id AS BIGINT) AS doc_id,\n" + ",\n".join(
    f"       CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
    f" AS {name}" for name, pat in _SCAN_PATTERNS.items()
) + "\nFROM documents"

# ---------------------------------------------------------------------------
# Pivot (long → wide): per-user counts of each event type.
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_user_event_counts(sf_dir: str):
    """Pivot events long → wide: one row per user, one count column per
    event type.  Map-side 2-D bincount partial per batch (≤ distinct
    users × types rows), then a hash-partitioned sum — the wide columns
    shuffle pre-aggregated, never the event rows.

    Partitioning assumption: the COLUMN dimension (event types) is an
    enum; the ROW dimension (users) is unbounded and hash-partitions.
    An unknown event type fails loudly (a silent 'other' bucket would
    diverge from the SQL twin)."""
    n_rows = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    num_parts = derive_num_parts(n_rows, rows_per_part=200_000)
    types = np.array(_EVENT_TYPES)
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(t["event_type"])
        code = np.searchsorted(types, et)
        if not (types[np.clip(code, 0, len(types) - 1)] == et).all():
            bad = sorted(set(et) - set(_EVENT_TYPES))
            raise ValueError(f"unknown event_type values: {bad}")
        uu, uinv = np.unique(uid, return_inverse=True)
        cnt = np.bincount(uinv * len(types) + code,
                          minlength=len(uu) * len(types))
        cnt = cnt.reshape(len(uu), len(types)).astype(np.int64)
        cols: dict = {"user_id": pa.array(uu),
                      "part": pa.array(uu % num_parts)}
        for j, ty in enumerate(_EVENT_TYPES):
            cols[f"n_{ty}"] = pa.array(cnt[:, j])
        return pa.table(cols)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", as_index=False)[
            [f"n_{ty}" for ty in _EVENT_TYPES]].sum()
        return out

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("part").map_groups(final, batch_format="pandas"))


PIVOT_SQL = "SELECT CAST(user_id AS BIGINT) AS user_id,\n" + ",\n".join(
    f"       CAST(SUM(CASE WHEN event_type = '{ty}' THEN 1 ELSE 0 END)"
    f" AS BIGINT) AS n_{ty}" for ty in _EVENT_TYPES
) + "\nFROM events GROUP BY user_id"

# ---------------------------------------------------------------------------
# Voronoi (nearest-site) assignment: classify every event to its nearest
# site by spherical chord distance — the "assign to nearest hub" join.
# ---------------------------------------------------------------------------


def _site_matrix() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(site_ids, centers (S,3), thresholds (S,)) as numpy constants —
    tiny; closed over by the batch fns (no object-store round trip for
    a sub-kilobyte broadcast)."""
    caps = _site_caps()
    ids = np.array([sid for sid, _ in caps], dtype=np.int64)
    centers = np.array([cap.center for _, cap in caps], dtype=np.float64)
    thr = np.array([2.0 * cap.height for _, cap in caps], dtype=np.float64)
    return ids, centers, thr


def _chord2_to_sites(t: pa.Table, centers: np.ndarray) -> np.ndarray:
    """(N, S) chord² from each batch point to each site center, with the
    SAME per-coordinate expression the SQL twin uses ((d·d) summed
    left-to-right) — NOT the |a|²+|b|²−2ab GEMM identity, which rounds
    differently and could flip an argmin/threshold on a knife-edge."""
    from s2geometry_ray.kernels.cellid import latlng_to_xyz

    lat = t["lat"].to_numpy(zero_copy_only=False)
    lng = t["lng"].to_numpy(zero_copy_only=False)
    xyz = latlng_to_xyz(lat, lng)
    d = xyz[:, None, :] - centers[None, :, :]
    return np.einsum("nsj,nsj->ns", d, d)


def voronoi_assign_events(sf_dir: str):
    """→ (event_id, site_id) nearest site per event; ties break to the
    lowest site_id (np.argmin first-minimum == the SQL twin's
    ``ORDER BY dist2, site_id``).  Embarrassingly parallel: one
    (N×S×3) vectorized distance block per batch, no shuffle — the
    classic broadcast-classify stage."""
    from s2geometry_ray.pipelines.flagship import _points_ds

    ids, centers, _thr = _site_matrix()

    def assign(t: pa.Table) -> pa.Table:
        d2 = _chord2_to_sites(t, centers)
        near = ids[np.argmin(d2, axis=1)]
        return pa.table({"event_id": t["event_id"],
                         "site_id": pa.array(near)})

    return _points_ds(sf_dir).map_batches(assign, batch_format="pyarrow",
                                          batch_size=None)


def voronoi_assign_sql() -> str:
    from s2geometry_ray.sources.geotag import derive_lat_sql, derive_lng_sql

    rows = []
    for sid, cap in _site_caps():
        cx, cy, cz = cap.center
        rows.append(f"({sid}, {cx!r}, {cy!r}, {cz!r})")
    values = ",\n         ".join(rows)
    lat = derive_lat_sql("event_id")
    lng = derive_lng_sql("event_id")
    return f"""
WITH sites AS (
  SELECT * FROM (VALUES {values}) AS v(site_id, cx, cy, cz)),
p AS (
  SELECT event_id,
         cos(radians({lat})) * cos(radians({lng})) AS px,
         cos(radians({lat})) * sin(radians({lng})) AS py,
         sin(radians({lat})) AS pz
  FROM events),
d AS (
  SELECT event_id, site_id,
         (px - cx) * (px - cx) + (py - cy) * (py - cy)
         + (pz - cz) * (pz - cz) AS dist2
  FROM p, sites)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(site_id AS BIGINT) AS site_id
FROM (SELECT event_id, site_id,
             ROW_NUMBER() OVER (PARTITION BY event_id
                                ORDER BY dist2, site_id) AS rn
      FROM d)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Geofence transitions: per-user enter/exit events of the site-cap union
# — a spatial-predicate × ordered-window composition (the streaming
# geofencing primitive).
# ---------------------------------------------------------------------------


def geofence_transitions_events(sf_dir: str):
    """Rows where a user's in-fence flag FLIPS between consecutive
    events (ordered by ts, event_id): ``entered`` = the new state.

    Stage 1 (map-only): in_fence = any site's chord² ≤ its threshold —
    the same vectorized block as the Voronoi stage.  Stage 2 (one
    shuffle): hash-partition by user_id, one lexsort + shifted-compare
    per partition — no per-user Python, the rolling-window pattern.

    Partitioning assumption: a user's rows co-locate (user_id % P,
    P ∝ rows)."""
    from s2geometry_ray.pipelines.flagship import _points_ds

    _ids, centers, thr = _site_matrix()
    n_rows = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    num_parts = derive_num_parts(n_rows, rows_per_part=100_000)

    def flags(t: pa.Table) -> pa.Table:
        d2 = _chord2_to_sites(t, centers)
        in_f = (d2 <= thr[None, :]).any(axis=1)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "event_id": t["event_id"],
            "user_id": pa.array(uid),
            "ts": t["ts"],
            "in_f": pa.array(in_f.astype(np.int64)),
            "part": pa.array(uid % num_parts),
        })

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        in_f = g["in_f"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, eid, in_f = uid[order], eid[order], in_f[order]
        n = len(uid)
        same_user = np.zeros(n, dtype=bool)
        same_user[1:] = uid[1:] == uid[:-1]
        prev = np.empty(n, dtype=np.int64)
        prev[0] = -1
        prev[1:] = in_f[:-1]
        flip = same_user & (in_f != prev)
        return pd.DataFrame({"user_id": uid[flip], "event_id": eid[flip],
                             "entered": in_f[flip]})

    pts = _points_ds(sf_dir, extra_cols=("user_id", "ts"))
    return (pts.map_batches(flags, batch_format="pyarrow", batch_size=None)
            .groupby("part").map_groups(transitions, batch_format="pandas"))


def geofence_transitions_sql() -> str:
    rows = []
    for sid, cap in _site_caps():
        cx, cy, cz = cap.center
        thr = 2.0 * cap.height
        rows.append(f"({sid}, {cx!r}, {cy!r}, {cz!r}, {thr!r})")
    values = ",\n         ".join(rows)
    from s2geometry_ray.sources.geotag import derive_lat_sql, derive_lng_sql

    lat = derive_lat_sql("event_id")
    lng = derive_lng_sql("event_id")
    return f"""
WITH sites AS (
  SELECT * FROM (VALUES {values}) AS v(site_id, cx, cy, cz, thr)),
p AS (
  SELECT event_id, user_id, ts,
         cos(radians({lat})) * cos(radians({lng})) AS px,
         cos(radians({lat})) * sin(radians({lng})) AS py,
         sin(radians({lat})) AS pz
  FROM events),
inf AS (
  SELECT p.event_id, p.user_id, p.ts,
         MAX(CASE WHEN (px - cx) * (px - cx) + (py - cy) * (py - cy)
                       + (pz - cz) * (pz - cz) <= thr
                  THEN 1 ELSE 0 END) AS in_f
  FROM p, sites GROUP BY p.event_id, p.user_id, p.ts),
lagd AS (
  SELECT event_id, user_id, in_f,
         LAG(in_f) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev_f
  FROM inf)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id,
       CAST(in_f AS BIGINT) AS entered
FROM lagd WHERE prev_f IS NOT NULL AND in_f <> prev_f
"""

# ---------------------------------------------------------------------------
# Bloom-pruned selective hash join: build side = 1-URGENT orders only,
# probe side (lineitem) is Bloom-prefiltered BEFORE the shuffle join, so
# shuffle volume tracks the build side's selectivity (~20%) instead of
# the probe table's size.  False positives die in the join — the result
# is exactly the unpruned join (pytest-pinned), which is what makes a
# value-exact gate possible for an approximate structure.
# ---------------------------------------------------------------------------


def bloom_join_urgent_revenue(sf_dir: str, prune: bool = True):
    """Revenue carried by 1-URGENT orders, via Bloom-pruned hash join.

    ``prune=False`` runs the identical plan minus the Bloom stage (the
    equality of both is the no-false-negatives contract, tested)."""
    import ray

    from s2geometry_ray.functions.bloom import (
        bloom_params,
        bloom_prefilter,
        build_bloom,
    )
    from s2geometry_ray.stages.tile_assign import combine_partials

    # materialize the (tiny: keys + priority of ~20% of orders) build
    # side: build_bloom drains it once and the join consumes it again —
    # without this the lazy scan+filter would re-execute (the measured
    # lazy-re-execution pitfall)
    urgent = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(
            lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")),
            batch_format="pyarrow", batch_size=None).materialize()

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows

    if prune:
        # size from the UNfiltered order count (metadata — no extra
        # scan); oversizing only lowers the FPR
        n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
        n_bits, k = bloom_params(n_orders)
        words_ref = ray.put(build_bloom(urgent, "o_orderkey", n_bits, k))
        li = bloom_prefilter(li, "l_orderkey", words_ref, n_bits, k)

    joined = li.join(urgent, join_type="inner",
                     num_partitions=derive_num_parts(
                         n_li, rows_per_part=250_000),
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        rev = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
            * 10000).astype(np.int64)
        return pa.table({
            "o_orderpriority": pa.array(["1-URGENT"]),
            "n": pa.array([len(t)], type=pa.int64()),
            "revenue_e4": pa.array([int(rev.sum())], type=pa.int64())})

    partials = joined.map_batches(partial, batch_format="pyarrow",
                                  batch_size=None)
    return combine_partials(partials, "o_orderpriority",
                            {"n": "sum", "revenue_e4": "sum"})


BLOOM_JOIN_SQL = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM({half_even_sql('l_extendedprice * (1 - l_discount) * 10000')})
            AS BIGINT) AS revenue_e4
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderpriority
"""

# ---------------------------------------------------------------------------
# Semi-structured extraction: pull "k" out of the events.props JSON blob
# with an RE2 named group (both engines are RE2; DuckDB's no-match ''
# is NULLIF'd to align with Arrow's no-match null) and aggregate per
# event type — the props column never shuffles, only tiny partials do.
# ---------------------------------------------------------------------------


def json_field_stats_events(sf_dir: str):
    """Per-event_type stats of the ``props`` JSON field ``k``:
    row count, matched count, sum and max of k — map-side partials +
    bounded combine (event_type is an enum)."""
    from s2geometry_ray.stages.tile_assign import combine_partials

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"])
        ex = pc.struct_field(
            pc.extract_regex(pc.cast(t["props"], pa.string()),
                             r'"k": (?P<v>[0-9]+)'), "v")
        has = pc.is_valid(ex).to_numpy(zero_copy_only=False)
        vi = pc.cast(pc.fill_null(ex, "0"), pa.int64()).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({"event_type": et, "n": 1,
                           "n_k": has.astype(np.int64), "sum_k": vi,
                           "max_k": np.where(has, vi, np.int64(-1))})
        g = df.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), n_k=("n_k", "sum"), sum_k=("sum_k", "sum"),
            max_k=("max_k", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return combine_partials(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "event_type", {"n": "sum", "n_k": "sum", "sum_k": "sum",
                       "max_k": "max"})


JSON_FIELD_SQL = """
WITH x AS (
  SELECT event_type,
         CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '')
              AS BIGINT) AS k
  FROM events)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(k) AS BIGINT) AS n_k,
       CAST(COALESCE(SUM(k), 0) AS BIGINT) AS sum_k,
       CAST(COALESCE(MAX(k), -1) AS BIGINT) AS max_k
FROM x GROUP BY event_type
"""

# ---------------------------------------------------------------------------
# End-to-end corpus curation: the composed training-data pipeline a
# 100-TB text corpus actually runs — quality filter → exact dedup →
# MinHash-LSH + exact-Jaccard near-dup → connected-component
# representative keep → deterministic shard assignment.  Every stage is
# an existing engine operator; the DuckDB twin is ASSEMBLED from the
# same generated-SQL building blocks (minhash_ctes, the Jaccard verify
# chain, the recursive-CTE components oracle, the splitmix shard key),
# so the whole composition is value-exact end-to-end.
# ---------------------------------------------------------------------------

_CUR_MIN_WORDS = 30   # quality gate: ≥ 30 letter-words (~22% filtered)
_CUR_TAU = 0.5        # near-dup Jaccard threshold
_CUR_SHARDS = 8
_CUR_SEED = 13


def corpus_curation_docs(sf_dir: str):
    """→ (doc_id, shard) for every SURVIVING document.

    Stages (each documented at its operator):
    1. quality filter — map-only RE2 word count ≥ _CUR_MIN_WORDS;
    2. exact dedup — fingerprint partition, keep min doc_id per group
       (fp64 grouping == text grouping at birthday-2⁻⁶⁴; the SQL twin
       partitions by text itself);
    3. near-dup — LSH candidates + exact shingle-Jaccard ≥ τ
       (functions/dedup.jaccard_verified_pairs), then min-label
       connected components over the pair graph; keep representatives;
    4. shard — splitmix64(doc_id ⊕ mix(seed)) mod _CUR_SHARDS, the
       deterministic epoch-shuffle key.

    Scale note: survivors materialize once mid-pipeline because three
    downstream consumers read them (pair sides + node list) — at
    cluster scale this is the natural checkpoint boundary
    (state/manifests.py would write it as partitioned parquet and the
    three consumers would read the checkpoint)."""
    from s2geometry_ray.functions.dedup import (
        connected_components,
        jaccard_verified_pairs,
    )
    from s2geometry_ray.functions.shuffle import _seed_mix
    from s2geometry_ray.functions.text import _splitmix64, fingerprint_batch

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    num_parts = derive_num_parts(n_docs, rows_per_part=100_000)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def qual(t: pa.Table) -> pa.Table:
        nw = pc.count_substring_regex(pc.cast(t["text"], pa.string()),
                                      "[A-Za-z]+")
        return t.filter(pc.greater_equal(nw, _CUR_MIN_WORDS))

    def add_fp(t: pa.Table) -> pa.Table:
        out = fingerprint_batch(t, "text")
        fp = out["fp64"].to_numpy(zero_copy_only=False)
        part = (fp.view(np.uint64) % np.uint64(num_parts)).astype(np.int64)
        return out.append_column("part", pa.array(part))

    def reps(g: pd.DataFrame) -> pd.DataFrame:
        rep = g.groupby("fp64")["doc_id"].transform("min")
        keep = g["doc_id"].to_numpy() == rep.to_numpy()
        return g.loc[keep, ["doc_id", "text"]]

    survivors = (docs.map_batches(qual, batch_format="pyarrow",
                                  batch_size=None)
                 .map_batches(add_fp, batch_format="pyarrow",
                              batch_size=None)
                 .groupby("part").map_groups(reps, batch_format="pandas")
                 .materialize())

    pairs = jaccard_verified_pairs(survivors, tau=_CUR_TAU,
                                   n_rows_hint=n_docs)
    comp = connected_components(pairs.select_columns(["key_a", "key_b"]),
                                survivors.select_columns(["doc_id"]))

    sm = np.uint64(_seed_mix(_CUR_SEED))

    def finish(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rep = t["rep"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = doc == rep
        doc = doc[keep]
        shard = (_splitmix64(doc.view(np.uint64) ^ sm)
                 % np.uint64(_CUR_SHARDS)).astype(np.int64)
        return pa.table({"doc_id": pa.array(doc),
                         "shard": pa.array(shard)})

    return comp.map_batches(finish, batch_format="pyarrow", batch_size=None)


def corpus_curation_sql() -> str:
    """The composed twin: quality/window CTEs + the minhash_ctes chain
    (retargeted at the survivor CTE) + the Jaccard verify chain + the
    recursive-CTE components oracle + the splitmix shard key."""
    from s2geometry_ray.functions.gate_oracles import (
        jaccard_verify_ctes,
        minhash_ctes,
    )
    from s2geometry_ray.functions.shuffle import (
        _seed_mix,
        sql_splitmix64,
    )

    mc = minhash_ctes(table="s1").lstrip()
    assert mc.startswith("WITH"), "minhash_ctes contract changed"
    sm = _seed_mix(_CUR_SEED)
    wrapped = _sql_wrap_u64("doc_id")
    shard = (f"CAST({sql_splitmix64(f'xor({wrapped}, {sm})')}"
             f" % {_CUR_SHARDS} AS BIGINT)")
    prefix = f"""WITH RECURSIVE
q AS (SELECT doc_id, text FROM documents
      WHERE len(regexp_extract_all(text, '[A-Za-z]+')) >= {_CUR_MIN_WORDS}),
s1 AS (SELECT doc_id, text FROM (
         SELECT doc_id, text,
                MIN(doc_id) OVER (PARTITION BY text) AS rep1 FROM q)
       WHERE doc_id = rep1),
"""
    body = mc[len("WITH"):].rstrip()
    # the minhash chain ends with its final CTE ")" — continue the list
    return prefix + body + f""",
sizes AS (SELECT k, count(*) AS c FROM sh GROUP BY k),
inter AS (
  SELECT p.key_a, p.key_b, count(*) AS i
  FROM pairs p
  JOIN sh x ON x.k = p.key_a
  JOIN sh y ON y.k = p.key_b AND y.h = x.h
  GROUP BY p.key_a, p.key_b),
iu AS (
  SELECT p.key_a, p.key_b, COALESCE(i.i, 0) AS i,
         sa.c + sb.c - COALESCE(i.i, 0) AS u
  FROM pairs p
  LEFT JOIN inter i ON i.key_a = p.key_a AND i.key_b = p.key_b
  JOIN sizes sa ON sa.k = p.key_a
  JOIN sizes sb ON sb.k = p.key_b),
verified AS (
  SELECT key_a, key_b FROM iu
  WHERE CAST(i AS DOUBLE) / CAST(u AS DOUBLE) >= {_CUR_TAU}),
sym AS (SELECT key_a AS u, key_b AS v FROM verified
        UNION ALL SELECT key_b, key_a FROM verified),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM s1
  UNION
  SELECT s.v, r.lbl FROM reach r JOIN sym s ON s.u = r.node),
rep2 AS (SELECT node AS doc_id, MIN(lbl) AS rep FROM reach GROUP BY node)
SELECT CAST(doc_id AS BIGINT) AS doc_id, {shard} AS shard
FROM rep2 WHERE rep = doc_id
"""


# --- O38: semantic dedup over embeddings (SemDeDup-shaped) ------------

_SEMDEDUP_TAU = 0.9


def semantic_dedup_embeddings(sf_dir: str, tau: float = _SEMDEDUP_TAU):
    """Semantic (embedding-space) dedup clustering, SemDeDup-shaped:
    cosine-≥τ near-duplicate pairs from the bucketed LSH-style operator
    feed the distributed connected-components labeller → one row per
    vector with its cluster representative (min vec_id).  ``rep ==
    vec_id`` rows are the dedup survivors.

    The natural embeddings table has no pairs above ~0.52 cosine, so —
    like the cosine_neardup gate — exact duplicates of every 10th
    vector are planted (vec_id + 1_000_000), making the expected
    clustering fully determined and the DuckDB twin exact (brute-force
    cosine cross-join + recursive-CTE reachability).

    Scale: pair generation is the √N-bucketed multi-probe operator
    (never all-pairs), components shuffle int labels only; nothing here
    is quadratic in the corpus."""
    import pyarrow.parquet as pq

    from s2geometry_ray.functions.ann import cosine_neardup_pairs
    from s2geometry_ray.functions.dedup import connected_components

    base = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        keep = t.filter(pa.array(ids % 10 == 0))
        return keep.set_column(
            keep.schema.get_field_index("vec_id"), "vec_id",
            pa.array(keep["vec_id"].to_numpy(zero_copy_only=False)
                     + 1_000_000))

    ds = base.union(base.map_batches(plant, batch_format="pyarrow"))
    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    n_all = n + (n + 9) // 10
    pairs = cosine_neardup_pairs(ds, tau=tau, n_rows_hint=n_all)
    return connected_components(pairs, ds.select_columns(["vec_id"]),
                                key_col="vec_id", n_nodes_hint=n_all)


SEMANTIC_DEDUP_SQL = f"""
WITH RECURSIVE
all_vecs AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding
  FROM embeddings WHERE vec_id % 10 = 0),
edges AS (
  SELECT a.vec_id AS key_a, b.vec_id AS key_b
  FROM all_vecs a JOIN all_vecs b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding)
        >= {_SEMDEDUP_TAU}),
sym AS (SELECT key_a AS u, key_b AS v FROM edges
        UNION ALL SELECT key_b, key_a FROM edges),
reach(node, lbl) AS (
  SELECT vec_id, vec_id FROM all_vecs
  UNION
  SELECT s.v, r.lbl FROM reach r JOIN sym s ON s.u = r.node)
SELECT CAST(node AS BIGINT) AS vec_id, CAST(MIN(lbl) AS BIGINT) AS rep
FROM reach GROUP BY node
"""


# --- O43: corpus bigram top terms --------------------------------------

_BIGRAM_TOPN = 100


def bigram_top_terms(sf_dir: str, topn: int = _BIGRAM_TOPN):
    """Corpus-level bigram frequencies, top ``topn`` by (count desc,
    term asc) — the n-gram corpus-statistics primitive (stopword-pair
    mining, boilerplate detection, contamination screens).

    Scale shape: per-batch PARTIAL counts (an Arrow split + one numpy
    adjacency pass + value_counts — the full pair stream never leaves
    the task), then a hash shuffle of (term, c) partials, per-partition
    sum + per-partition top-``topn`` (a term lives in exactly one
    partition, so the global top is a subset of the union of partition
    tops), and a driver-side merge over the ≤ parts·topn survivors."""
    import pyarrow.parquet as pq

    from s2geometry_ray.functions.text import _WS, fingerprint_batch
    from s2geometry_ray.scale import derive_num_parts

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    num_parts = derive_num_parts(n_docs, rows_per_part=100_000)
    ws_pat = f"[{_WS}]+"

    def partial(t: pa.Table) -> pa.Table:
        texts = pc.cast(t["text"], pa.string())
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(texts, ws_pat)
        counts = np.asarray(lists.value_lengths())
        vals = np.asarray(lists.flatten())
        doc_idx = np.repeat(np.arange(len(counts)), counts)
        nz = vals != ""          # split artifacts at text edges only
        vals, doc_idx = vals[nz], doc_idx[nz]
        if vals.size < 2:
            return pa.table({"term": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64())})
        adj = doc_idx[1:] == doc_idx[:-1]
        terms = np.char.add(np.char.add(
            vals[:-1][adj].astype(str), " "), vals[1:][adj].astype(str))
        vc = pd.Series(terms).value_counts()
        return pa.table({"term": pa.array(vc.index.to_numpy(), type=pa.string()),
                         "c": pa.array(vc.to_numpy(), type=pa.int64())})

    def add_part(t: pa.Table) -> pa.Table:
        fp = fingerprint_batch(
            pa.table({"text": t["term"]}), "text")["fp64"] \
            .to_numpy(zero_copy_only=False)
        part = (fp.view(np.uint64) % np.uint64(num_parts)).astype(np.int64)
        return t.append_column("part", pa.array(part))

    def part_top(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("term", as_index=False)["c"].sum()
        s = s.sort_values(["c", "term"], ascending=[False, True],
                          kind="mergesort").head(topn)
        return s[["term", "c"]]

    cand = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .map_batches(add_part, batch_format="pyarrow", batch_size=None) \
        .groupby("part").map_groups(part_top, batch_format="pandas") \
        .to_pandas()  # bounded: ≤ num_parts · topn rows
    out = cand.sort_values(["c", "term"], ascending=[False, True],
                           kind="mergesort").head(topn)
    return out.reset_index(drop=True)


def bigram_top_terms_sql(topn: int = _BIGRAM_TOPN,
                         table: str = "documents") -> str:
    from s2geometry_ray.functions.text import TOKEN_PATTERN

    tok = TOKEN_PATTERN.replace("'", "''")
    return rf"""
WITH toks AS (
  SELECT regexp_extract_all(text, '{tok}') AS ts FROM {table}),
bg AS (
  SELECT unnest(list_transform(range(1, len(ts)),
                               i -> ts[i] || ' ' || ts[i + 1])) AS term
  FROM toks)
SELECT term, CAST(count(*) AS BIGINT) AS c
FROM bg GROUP BY term
ORDER BY c DESC, term LIMIT {topn}
"""


def trajectory_distance_users(sf_dir: str):
    """O53 per-user trajectory length: the sum of unit-sphere CHORD
    step lengths between a user's consecutive events (ordered by ts
    then event_id), carried as e9 integers so the per-user sum is
    order-insensitive-exact (round first, integer sum after — the
    engine's standard float policy).  Chord (not arc) is the step
    metric precisely so the twin shares every IEEE op: the chord² is
    the knn twin's algebraic expression and sqrt is correctly rounded,
    whereas atan2/asin are libm-dependent.

    One shuffle (user key), KEYS ONLY: the geotag derives from
    event_id, so the exchange carries just (user, ts, event_id, part)
    — xyz is recomputed vectorized AFTER the shuffle inside each
    partition (measured at 10M rows: shipping the three xyz doubles
    instead costs ~40% more exchange volume for zero work saved).
    Hash-partition by user_id, one lexsort + shifted-diff per
    partition — the rolling-window pattern.  Users with a single event
    emit nothing (no step), matching the twin's LAG NULL filter."""
    import ray.data as _rd

    from s2geometry_ray.kernels import cellid as vk
    from s2geometry_ray.sources.geotag import derive_lat, derive_lng

    n_rows = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    num_parts = derive_num_parts(n_rows, rows_per_part=100_000)

    def prep(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "user_id": pa.array(uid),
            "ts": t["ts"],
            "event_id": t["event_id"],
            "part": pa.array(uid % num_parts),
        })

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        P = vk.latlng_to_xyz(derive_lat(eid), derive_lng(eid))
        order = np.lexsort((eid, ts, uid))
        uid, P = uid[order], P[order]
        same = uid[1:] == uid[:-1]
        dx = P[1:, 0] - P[:-1, 0]
        dy = P[1:, 1] - P[:-1, 1]
        dz = P[1:, 2] - P[:-1, 2]
        v = np.sqrt(dx * dx + dy * dy + dz * dz) * 1000000000.0
        e9 = np.rint(v[same]).astype(np.int64)
        df = pd.DataFrame({"user_id": uid[1:][same], "e9": e9})
        out = df.groupby("user_id", as_index=False).agg(
            n_steps=("e9", "size"), chord_e9=("e9", "sum"))
        return out

    pts = _rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["event_id", "user_id", "ts"])
    return (pts.map_batches(prep, batch_format="pyarrow", batch_size=None)
            .groupby("part").map_groups(per_part, batch_format="pandas"))


def trajectory_distance_sql() -> str:
    from s2geometry_ray.sources.geotag import derive_lat_sql, derive_lng_sql

    lat = derive_lat_sql("event_id")
    lng = derive_lng_sql("event_id")
    return f"""
WITH p AS (
  SELECT user_id, epoch_us(ts) AS t, event_id,
         cos(radians({lat})) * cos(radians({lng})) AS px,
         cos(radians({lat})) * sin(radians({lng})) AS py,
         sin(radians({lat})) AS pz
  FROM events),
l AS (
  SELECT user_id, px, py, pz,
         LAG(px) OVER w AS qx, LAG(py) OVER w AS qy, LAG(pz) OVER w AS qz
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
s AS (
  SELECT user_id,
         sqrt((px - qx) * (px - qx) + (py - qy) * (py - qy)
              + (pz - qz) * (pz - qz)) * 1000000000.0 AS v
  FROM l WHERE qx IS NOT NULL)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_steps,
       CAST(SUM(CAST(floor(v) AS BIGINT)
                + CASE WHEN v - floor(v) > 0.5 THEN 1
                       WHEN v - floor(v) = 0.5 THEN CAST(floor(v) AS BIGINT) % 2
                       ELSE 0 END) AS BIGINT) AS chord_e9
FROM s GROUP BY 1
"""


_COLOC_LEVEL = 5
_US_PER_DAY_AN = 86_400_000_000


def colocation_pairs_users(sf_dir: str, level: int = _COLOC_LEVEL,
                           max_users_per_bucket: int = 4096):
    """O54 co-location pairs (spatio-temporal self-join): user pairs
    with events in the SAME level-``level`` cell on the SAME day;
    ``n_cobuckets`` = number of distinct shared (cell, day) buckets.

    Plan (two bounded exchanges, no payload ever moves):
      1. map: geotag → cell prefix; bucket = cell_bits | day (a level-17
         -or-coarser parent has bits 0..2·(30−17)−1 zero, so the day
         packs into the id's low bits losslessly); per-batch DISTINCT
         (bucket, user) — the co-visitation dedup happens map-side.
      2. bucket-key shuffle → per-partition global distinct + sorted
         per-bucket pair triangles (vectorized repeat/cumsum explode —
         users sorted in-bucket so user_a < user_b by construction).
         A bucket over ``max_users_per_bucket`` raises loudly
         (quadratic blowup — coarsen the level or shrink the window).
      3. pair-key shuffle of (pair, partial n) only → per-pair sum.

    The DuckDB twin recomputes the cell with the pure-SQL S2 kernel and
    the pairs with a DISTINCT self-join."""
    from s2geometry_ray.pipelines.flagship import _points_ds

    n_rows = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    num_parts = derive_num_parts(n_rows, rows_per_part=200_000)
    if level > 17:
        raise ValueError("level > 17 collides with the packed day bits")

    from s2geometry_ray.kernels import cellid as vk

    def buckets(t: pa.Table) -> pa.Table:
        cid = t["cell_id"].to_numpy(zero_copy_only=False).view(np.uint64)
        cell = vk.parent(cid, level).view(np.int64)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view(np.int64)
        day = ts // _US_PER_DAY_AN
        if day.size and day.min() < 0:
            # a negative floored day sign-extends into the cell bits of
            # the packed key, silently corrupting the bucket — fail loud
            # (matching the level>17 and 31-bit user-id guards)
            raise ValueError("pre-1970 timestamps produce negative days; "
                             "the cell|day bucket packing requires day >= 0")
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = cell | day
        bu = np.unique(np.stack([bucket, uid], axis=1), axis=0)
        part = ((bu[:, 0].view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(33)).astype(np.int64) % num_parts
        return pa.table({
            "bucket": pa.array(bu[:, 0], type=pa.int64()),
            "user_id": pa.array(bu[:, 1], type=pa.int64()),
            "part": pa.array(part, type=pa.int64()),
        })

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        bu = np.unique(np.stack([g["bucket"].to_numpy(np.int64),
                                 g["user_id"].to_numpy(np.int64)],
                                axis=1), axis=0)
        bucket, user = bu[:, 0], bu[:, 1]
        if user.size and (user.min() < 0 or user.max() >= (1 << 31)):
            raise ValueError("user ids must be non-negative 31-bit ints "
                             "for pair packing")
        # run boundaries per bucket (rows are sorted by (bucket, user))
        starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
        run_id = np.cumsum(np.r_[True, bucket[1:] != bucket[:-1]]) - 1
        run_len = np.diff(np.r_[starts, bucket.size])
        if run_len.size and run_len.max() > max_users_per_bucket:
            raise ValueError(
                f"co-location bucket holds {int(run_len.max())} users > "
                f"{max_users_per_bucket}: coarsen the cell level or "
                f"shrink the time window")
        o = np.arange(bucket.size, dtype=np.int64) - starts[run_id]
        tot = int(o.sum())
        if not tot:
            return pd.DataFrame({"pair": np.empty(0, np.int64),
                                 "n": np.empty(0, np.int64)})
        first = np.cumsum(o) - o
        pos = np.arange(tot, dtype=np.int64) - np.repeat(first, o)
        ua = user[np.repeat(starts[run_id], o) + pos]
        ub = np.repeat(user, o)
        pair = ua * (1 << 32) + ub
        keys, counts = np.unique(pair, return_counts=True)
        return pd.DataFrame({"pair": keys, "n": counts.astype(np.int64)})

    def add_part2(t: pa.Table) -> pa.Table:
        p = t["pair"].to_numpy(zero_copy_only=False)
        part2 = ((p.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                 >> np.uint64(29)).astype(np.int64) % num_parts
        return t.append_column("part2", pa.array(part2, type=pa.int64()))

    def pair_totals(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("pair", as_index=False)["n"].sum()
        p = s["pair"].to_numpy(np.int64)
        return pd.DataFrame({"user_a": p >> 32, "user_b": p & ((1 << 32) - 1),
                             "n_cobuckets": s["n"].to_numpy(np.int64)})

    pts = _points_ds(sf_dir, extra_cols=("user_id", "ts"))
    pairs = (pts.map_batches(buckets, batch_format="pyarrow", batch_size=None)
             .groupby("part").map_groups(pair_partials, batch_format="pandas"))
    return (pairs.map_batches(add_part2, batch_format="pyarrow",
                              batch_size=None)
            .groupby("part2").map_groups(pair_totals, batch_format="pandas"))


def colocation_pairs_sql(level: int = _COLOC_LEVEL) -> str:
    from s2geometry_ray.functions.cellid_sql import cell_id_ctes, parent_sql
    from s2geometry_ray.pipelines.tpch import _floor_div_day_sql
    from s2geometry_ray.sources.geotag import derive_lat_sql, derive_lng_sql

    ctes = cell_id_ctes(
        derive_lat_sql("event_id"), derive_lng_sql("event_id"),
        extra_cols=", user_id, day",
        extra_select=(", user_id, "
                      f"{_floor_div_day_sql('epoch_us(ts)')} AS day"))
    return ctes + f""",
b AS (SELECT DISTINCT user_id, {parent_sql('cell_id', level)} AS cell, day
      FROM cell)
SELECT CAST(a.user_id AS BIGINT) AS user_a,
       CAST(c.user_id AS BIGINT) AS user_b,
       CAST(count(*) AS BIGINT) AS n_cobuckets
FROM b a JOIN b c
  ON a.cell = c.cell AND a.day = c.day AND a.user_id < c.user_id
GROUP BY 1, 2
"""


def cell_pyramid_events(sf_dir: str, min_level: int = 0, max_level: int = 6):
    """O55 aggregation pyramid: event counts + exact value cents at
    EVERY level in [min_level, max_level] — the multi-resolution tile
    pyramid a map service serves (each zoom level is one slice).

    Map-only + bounded combine: each batch emits one (ancestor, n,
    cents) row per distinct ancestor per level — the ancestor id
    encodes its own level, so a single packed uint64 key carries the
    whole pyramid (the O50 trick); cardinality ≤ Σ_L min(6·4^L, N)."""
    from s2geometry_ray.kernels import cellid as vk
    from s2geometry_ray.pipelines.flagship import _points_ds
    from s2geometry_ray.stages.tile_assign import combine_partials

    levels = tuple(range(min_level, max_level + 1))

    def partial(t: pa.Table) -> pa.Table:
        cid = t["cell_id"].to_numpy(zero_copy_only=False).view(np.uint64)
        cents = np.round(t["value"].to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        anc = np.concatenate([vk.parent(cid, lv) for lv in levels])
        c_all = np.tile(cents, len(levels))
        df = pd.DataFrame({"cell_bits": anc.view(np.int64), "c": c_all})
        g = df.groupby("cell_bits", as_index=False).agg(
            n=("c", "size"), cents=("c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    pts = _points_ds(sf_dir, extra_cols=("value",))
    out = combine_partials(
        pts.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "cell_bits", {"n": "sum", "cents": "sum"})

    def finalize(t: pa.Table) -> pa.Table:
        cells = t["cell_bits"].to_numpy(zero_copy_only=False).view(np.uint64)
        return pa.table({
            "cell_id": pa.array(cells, type=pa.uint64()),
            "level": pa.array(vk.level(cells), type=pa.int64()),
            "n": t["n"],
            "value_cents": t["cents"],
        })

    return out.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def cell_pyramid_sql(min_level: int = 0, max_level: int = 6) -> str:
    from s2geometry_ray.functions.cellid_sql import cell_id_ctes, parent_sql
    from s2geometry_ray.sources.geotag import derive_lat_sql, derive_lng_sql

    ctes = cell_id_ctes(
        derive_lat_sql("event_id"), derive_lng_sql("event_id"),
        extra_cols=", cents",
        extra_select=f", {half_even_sql('value * 100')} AS cents")
    sels = []
    for lv in range(min_level, max_level + 1):
        sels.append(f"""
SELECT {parent_sql('cell_id', lv)} AS cell_id,
       CAST({lv} AS BIGINT) AS level,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS value_cents
FROM cell GROUP BY 1""")
    return ctes + " UNION ALL ".join(sels)


def rebalance_sample_events(sf_dir: str, level: int = 4,
                            target: int = 120, seed: int = 21):
    """O59 geo-rebalanced sampling: downsample each level-``level``
    cell to ≈``target`` rows (keep probability min(1, target/n_cell)) —
    the geographic rebalancing a web-scale image corpus needs so dense
    cities don't dominate training.  Deterministic and replayable: keep
    iff splitmix64(key ⊕ mix(seed)) ≤ floor(target·2⁶⁴ / n_cell), all
    integer arithmetic, so the SQL twin recomputes the EXACT row set
    (no VALUES pins — counts, threshold and hash all re-derived).

    Two passes, the salt-plan shape: per-cell counts via map-side
    partials + bounded combine (≤ 6·4^level keys), thresholds built
    once driver-side and broadcast; pass 2 is a stateless map filter
    (searchsorted cell → threshold, compare).  The point table never
    shuffles."""
    import ray

    from s2geometry_ray.functions.shuffle import _seed_mix, _splitmix64
    from s2geometry_ray.pipelines.flagship import _points_ds
    from s2geometry_ray.stages.broadcast import get_broadcast
    from s2geometry_ray.stages.tile_assign import combine_partials

    if level > 8:
        raise ValueError("rebalance level > 8 breaks the bounded "
                         "counts-table contract (6·4^level cells)")
    if target <= 0:
        # target=0 would keep only h==0 rows (prob 2^-64) and a negative
        # target would overflow the uint64 threshold build — both are
        # config errors, not sampling plans (round-4 verdict #9 review)
        raise ValueError(f"rebalance target must be >= 1, got {target}")

    col = "cell_l8"  # _points_ds assigns JOIN_LEVEL=8; derive ours below
    from s2geometry_ray.kernels import cellid as vk

    pts = _points_ds(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        cid = t["cell_id"].to_numpy(zero_copy_only=False).view(np.uint64)
        cells, counts = np.unique(vk.parent(cid, level), return_counts=True)
        return pa.table({
            "cell_bits": pa.array(cells.view(np.int64), type=pa.int64()),
            "n": pa.array(counts.astype(np.int64)),
        })

    cnt = combine_partials(
        pts.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "cell_bits", {"n": "sum"}).to_pandas()
    cells = cnt["cell_bits"].to_numpy().view(np.uint64)
    order = np.argsort(cells)
    cells = cells[order]
    ns = cnt["n"].to_numpy()[order]
    full = (1 << 64) - 1
    thr = np.array([full if int(n) <= target
                    else (target << 64) // int(n) for n in ns],
                   dtype=np.uint64)
    plan_ref = ray.put((cells, thr))
    mix = np.uint64(_seed_mix(seed))

    def keep(t: pa.Table) -> pa.Table:
        sc, sthr = get_broadcast(plan_ref)
        cid = t["cell_id"].to_numpy(zero_copy_only=False).view(np.uint64)
        cell = vk.parent(cid, level)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        h = _splitmix64(eid.astype(np.uint64) ^ mix)
        idx = np.searchsorted(sc, cell)
        if idx.size and (np.any(idx >= sc.size)
                         or np.any(sc[np.minimum(idx, sc.size - 1)] != cell)):
            raise ValueError("rebalance plan is missing a cell — counts "
                             "pass and filter pass saw different inputs")
        mask = h <= sthr[np.minimum(idx, sc.size - 1)]
        return pa.table({
            "event_id": pa.array(eid[mask]),
            "cell": pa.array(cell[mask], type=pa.uint64()),
        })

    del col
    return pts.map_batches(keep, batch_format="pyarrow", batch_size=None)


def rebalance_sample_sql(level: int = 4, target: int = 120,
                         seed: int = 21) -> str:
    from s2geometry_ray.functions.cellid_sql import cell_id_ctes, parent_sql
    from s2geometry_ray.functions.shuffle import _seed_mix, sql_splitmix64
    from s2geometry_ray.sources.geotag import derive_lat_sql, derive_lng_sql

    ctes = cell_id_ctes(derive_lat_sql("event_id"),
                        derive_lng_sql("event_id"))
    h = sql_splitmix64(
        f"xor(CAST(event_id AS UBIGINT), {_seed_mix(seed)})")
    two64 = 1 << 64
    return ctes + f""",
cl AS (SELECT event_id, {parent_sql('cell_id', level)} AS cell FROM cell),
cnt AS (SELECT cell, count(*) AS n FROM cl GROUP BY 1)
SELECT CAST(cl.event_id AS BIGINT) AS event_id, cl.cell AS cell
FROM cl JOIN cnt ON cl.cell = cnt.cell
WHERE CAST({h} AS HUGEINT) <=
      CASE WHEN cnt.n <= {target} THEN CAST({two64 - 1} AS HUGEINT)
           ELSE CAST({target} AS HUGEINT) * {two64} // cnt.n END
"""


def cell_smooth_events(sf_dir: str, level: int = 4):
    """O60 neighborhood smoothing: for every occupied level-``level``
    cell, its own event count plus the counts of its 4 edge neighbors
    (S15, face wraps included) — the spatial convolution a density/
    anomaly screen runs over the cell grid.  The edge-neighbor relation
    is symmetric (including across cube-face boundaries), so scatter
    equals gather: each cell SENDS its count to its neighbors and the
    smoothed value is the per-target sum.

    Plan: bounded per-cell counts (map-side partials + combine —
    ≤ 6·4^level keys) → one vectorized scatter/searchsorted pass over
    the single combined block (the adaptive-tiling single-block
    contract).  The SQL twin re-derives counts and the neighbor-join
    sum; the 4-neighbor map itself is generated from the S15 kernel
    (pytest-pinned bit-exact against the scalar oracle) and embedded
    as VALUES."""
    from s2geometry_ray.kernels import cellid as vk
    from s2geometry_ray.pipelines.flagship import _points_ds
    from s2geometry_ray.stages.tile_assign import combine_partials

    pts = _points_ds(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        cid = t["cell_id"].to_numpy(zero_copy_only=False).view(np.uint64)
        cells, counts = np.unique(vk.parent(cid, level), return_counts=True)
        return pa.table({
            "cell_bits": pa.array(cells.view(np.int64)),
            "n": pa.array(counts.astype(np.int64)),
        })

    combined = combine_partials(
        pts.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "cell_bits", {"n": "sum"})

    def smooth(t: pa.Table) -> pa.Table:
        cells = t["cell_bits"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = t["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(cells)
        sc, sn = cells[order], n[order]
        nbrs = vk.edge_neighbors(sc)             # (N, 4), symmetric
        sm = sn.copy()
        for k in range(4):
            idx = np.searchsorted(sc, nbrs[:, k])
            ok = (idx < sc.size) & (sc[np.minimum(idx, sc.size - 1)]
                                    == nbrs[:, k])
            # neighbor present → its count joins this cell's sum
            sm[ok] += sn[idx[ok]]
        return pa.table({
            "cell_id": pa.array(sc, type=pa.uint64()),
            "n": pa.array(sn),
            "n_smooth": pa.array(sm),
        })

    return combined.map_batches(smooth, batch_format="pyarrow",
                                batch_size=None)


def cell_smooth_sql(level: int = 4) -> str:
    """Twin: counts via the pure-SQL S2 kernel; the smoothed sum joins a
    neighbor map generated from the vectorized S15 kernel (pinned by
    the pytest oracle's scalar cross-check).  The map enumerates ALL
    6·4^level cells (the Hilbert id space at a level is the uniform
    progression ``i·2·lsb + lsb``), so one static twin is complete at
    ANY scale factor with zero fixture reads at oracle-build time —
    unoccupied map rows are inert (they only activate through the join
    against that run's counts)."""
    from s2geometry_ray.functions.cellid_sql import cell_id_ctes, parent_sql
    from s2geometry_ray.kernels import cellid as vk
    from s2geometry_ray.sources.geotag import derive_lat_sql, derive_lng_sql

    if level > 5:
        raise ValueError(
            f"cell_smooth_sql enumerates all 6*4^level cells; level={level} "
            "would embed >24k VALUES rows — keep the gate level <= 5")
    lsb = np.uint64(1) << np.uint64(2 * (30 - level))
    occupied = (np.arange(6 * 4 ** level, dtype=np.uint64)
                * (np.uint64(2) * lsb) + lsb)
    nbrs = vk.edge_neighbors(occupied)
    rows = ", ".join(
        f"(CAST({int(c)} AS UBIGINT), CAST({int(nb)} AS UBIGINT))"
        for c, row in zip(occupied, nbrs) for nb in row)
    ctes = cell_id_ctes(derive_lat_sql("event_id"),
                        derive_lng_sql("event_id"))
    return ctes + f""",
cnt AS (SELECT {parent_sql('cell_id', level)} AS cell,
               CAST(count(*) AS BIGINT) AS n
        FROM cell GROUP BY 1),
nb(cell, nbr) AS (VALUES {rows})
SELECT cnt.cell AS cell_id, cnt.n,
       CAST(cnt.n + COALESCE(SUM(c2.n), 0) AS BIGINT) AS n_smooth
FROM cnt
LEFT JOIN nb ON nb.cell = cnt.cell
LEFT JOIN cnt c2 ON c2.cell = nb.nbr
GROUP BY 1, 2
"""
