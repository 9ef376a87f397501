"""Deterministic epoch shuffle — the training-data reshuffle operator.

``epoch_shuffle`` orders a dataset by a seeded splitmix64 hash of its
key column: a different, uniformly-random-looking permutation per
epoch/seed that is fully DETERMINISTIC and reproducible across runs and
cluster layouts (``ds.random_shuffle`` gives no such replay guarantee —
and a training job that crashes mid-epoch must resume the same
permutation).  The sort is Ray's native range-partitioned sort: the
hash destroys key locality by design, so the exchange is a true
balanced all-to-all with no hot ranges.

``shuffle_sql`` emits a DuckDB twin whose splitmix64 is bit-exact
(wrap-around u64 multiplies via 32-bit-split HUGEINT arithmetic), so
the permutation key is value-checked by the driver gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from s2geometry_ray.functions.text import _splitmix64

_GOLD = 0x9E3779B97F4A7C15


def _seed_mix(seed: int) -> int:
    return int(_splitmix64(np.array([np.uint64(seed * _GOLD & ((1 << 64) - 1))],
                                    dtype=np.uint64))[0])


def add_shuffle_key(ds, key_col: str = "doc_id", seed: int = 0,
                    out_col: str = "shuf64"):
    """Append the deterministic shuffle key: splitmix64(key ⊕ mix(seed))."""
    sm = np.uint64(_seed_mix(seed))

    def fn(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix64(k ^ sm)
        return t.append_column(out_col, pa.array(h, type=pa.uint64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def epoch_shuffle(ds, key_col: str = "doc_id", seed: int = 0,
                  out_col: str = "shuf64"):
    """→ the dataset in its epoch-``seed`` permutation order.  The sort
    key includes ``key_col`` as tie-break: at billions of rows splitmix
    collisions are expected (birthday), and equal-key order would
    otherwise depend on cluster layout — breaking replayability."""
    return add_shuffle_key(ds, key_col, seed, out_col).sort([out_col, key_col])


def _sql_mulmod(a: str, c: int) -> str:
    """a·c mod 2⁶⁴ with u64 operands: split a into 32-bit halves so every
    HUGEINT product stays < 2⁹⁶."""
    return (f"CAST(((CAST({a} // 4294967296 AS HUGEINT) * {c} % 4294967296)"
            f" * 4294967296 + CAST({a} % 4294967296 AS HUGEINT) * {c})"
            f" % 18446744073709551616 AS UBIGINT)")


def sql_splitmix64(expr: str) -> str:
    """Bit-exact splitmix64 of a UBIGINT expression in DuckDB."""
    s1 = (f"CAST((CAST({expr} AS HUGEINT) + {0x9E3779B97F4A7C15})"
          f" % 18446744073709551616 AS UBIGINT)")
    x1 = f"xor({s1}, {s1} // {1 << 30})"
    s2 = _sql_mulmod(f"({x1})", 0xBF58476D1CE4E5B9)
    x2 = f"xor({s2}, {s2} // {1 << 27})"
    s3 = _sql_mulmod(f"({x2})", 0x94D049BB133111EB)
    return f"xor({s3}, {s3} // {1 << 31})"


def shuffle_sql(key_col: str = "doc_id", seed: int = 0,
                table: str = "documents") -> str:
    sm = _seed_mix(seed)
    # wrap negative keys exactly like numpy's astype(uint64) — a plain
    # CAST(negative AS UBIGINT) raises in DuckDB
    wrapped = (f"CAST(((CAST({key_col} AS HUGEINT) % 18446744073709551616)"
               f" + 18446744073709551616) % 18446744073709551616 AS UBIGINT)")
    h = sql_splitmix64(f"xor({wrapped}, {sm})")
    return f"""
SELECT CAST({key_col} AS BIGINT) AS {key_col}, {h} AS shuf64
FROM {table}
"""

# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------


def _rate_threshold(rate: float) -> int:
    """Inclusive keep-threshold for ``h <= thr``: a uniform u64 hash is
    kept with probability ``rate``.  rate=1 keeps everything (threshold
    2⁶⁴−1); rates must be in (0, 1] — a 0 rate would wrap to keep-all.
    Rates below 2⁻⁶⁴ clamp to the smallest representable keep
    probability (threshold 0 ⇒ keep iff h == 0) instead of truncating
    to -1, which would wrap to keep-ALL and invert the semantics."""
    if not 0.0 < rate <= 1.0:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    return max(min(int(rate * 2.0**64), 1 << 64), 1) - 1


def stratified_sample(ds, stratum_col: str, rates: dict, default_rate: float,
                      key_col: str = "doc_id", seed: int = 0):
    """Deterministic per-stratum Bernoulli sample: a row is kept iff
    splitmix64(key ⊕ mix(seed)) ≤ threshold(stratum) — the training-data
    downsampling primitive (e.g. keep 25% of 'en', all of 'zh').
    Content-hash deterministic: the same row set survives on any
    cluster layout, any epoch resume, any partitioning — unlike
    ``ds.random_sample``.  Pure per-batch filter, no shuffle."""
    sm = np.uint64(_seed_mix(seed))
    thr_map = {s: np.uint64(_rate_threshold(r)) for s, r in rates.items()}
    thr_def = np.uint64(_rate_threshold(default_rate))

    def fn(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix64(k ^ sm)
        strat = np.asarray(t[stratum_col])
        thr = np.full(len(k), thr_def, dtype=np.uint64)
        for s, ti in thr_map.items():
            thr[strat == s] = ti
        return t.filter(pa.array(h <= thr))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample_sql(stratum_col: str, rates: dict, default_rate: float,
                          key_col: str = "doc_id", seed: int = 0,
                          table: str = "documents",
                          extra_cols: str = "") -> str:
    """DuckDB twin of ``stratified_sample`` (bit-exact splitmix64 +
    identical inclusive thresholds)."""
    sm = _seed_mix(seed)
    wrapped = (f"CAST(((CAST({key_col} AS HUGEINT) % 18446744073709551616)"
               f" + 18446744073709551616) % 18446744073709551616 AS UBIGINT)")
    h = sql_splitmix64(f"xor({wrapped}, {sm})")
    cases = " ".join(
        f"WHEN '{s}' THEN CAST({_rate_threshold(r)} AS UBIGINT)"
        for s, r in rates.items())
    thr = (f"CASE {stratum_col} {cases} "
           f"ELSE CAST({_rate_threshold(default_rate)} AS UBIGINT) END")
    return f"""
SELECT CAST({key_col} AS BIGINT) AS {key_col}, {stratum_col}{extra_cols}
FROM (SELECT {key_col}, {stratum_col}{extra_cols}, {h} AS h FROM {table})
WHERE h <= {thr}
"""


# ---------------------------------------------------------------------------
# O42: deterministic per-group cap (domain capping)
# ---------------------------------------------------------------------------


def cap_per_group(ds, group_col: str, k: int, key_col: str = "doc_id",
                  seed: int = 0, num_parts: int | None = None,
                  n_rows_hint=None):
    """Keep at most ``k`` rows per group — the web-corpus domain-capping
    primitive (bound any one source/domain's share of the training
    mix).  WHICH k rows survive is content-hash deterministic: the k
    smallest (splitmix64(key ⊕ mix(seed)), key) per group — a seeded
    uniform draw that replays identically on any cluster layout, with
    the key tie-break making hash collisions harmless.

    Scale: one hash shuffle on the GROUP key co-locates each group
    (assumption, SURVEY §3.6 policy: a single group's rows fit one
    partition — sources/domains are bounded; the partition count
    derives from the row count); ranking is one lexsort per partition.
    """
    import pandas as pd

    from s2geometry_ray.scale import dataset_count_hint, derive_num_parts

    if num_parts is None:
        if n_rows_hint is None:
            n_rows_hint = dataset_count_hint(ds)
        num_parts = derive_num_parts(n_rows_hint, rows_per_part=100_000)

    sm = np.uint64(_seed_mix(seed))

    def add_keys(t: pa.Table) -> pa.Table:
        from s2geometry_ray.functions.text import fingerprint_batch

        kk = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix64(kk ^ sm)
        # int64 bit-views for the shuffle (the documented uint64 pitfall)
        t = t.append_column("h64", pa.array(h.view(np.int64)))
        # stable group→part: word-packed fingerprint of the group string
        gid = pa.compute.cast(t[group_col], pa.string())
        fp = fingerprint_batch(pa.table({"text": gid}), "text")["fp64"] \
            .to_numpy(zero_copy_only=False)
        part = (fp.view(np.uint64) % np.uint64(num_parts)).astype(np.int64)
        return t.append_column("part", pa.array(part))

    def cap(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h64"].to_numpy().view(np.uint64)
        key = g[key_col].to_numpy()
        grp = g[group_col].to_numpy().astype(str)
        order = np.lexsort((key, h, grp))
        grp_o = grp[order]
        new = np.ones(len(grp_o), dtype=bool)
        new[1:] = grp_o[1:] != grp_o[:-1]
        # rank within group along the sorted order
        idx = np.arange(len(grp_o))
        start = np.maximum.accumulate(np.where(new, idx, 0))
        rank = idx - start
        keep = order[rank < k]
        return g.iloc[np.sort(keep)].drop(columns=["h64", "part"])

    return ds.map_batches(add_keys, batch_format="pyarrow",
                          batch_size=None) \
        .groupby("part").map_groups(cap, batch_format="pandas")


def cap_per_group_sql(group_col: str, k: int, key_col: str = "doc_id",
                      seed: int = 0, table: str = "documents",
                      cols: str = "") -> str:
    """DuckDB twin: row_number over (group ORDER BY bit-exact splitmix
    hash, key) ≤ k."""
    sm = _seed_mix(seed)
    wrapped = (f"CAST(((CAST({key_col} AS HUGEINT) % 18446744073709551616)"
               f" + 18446744073709551616) % 18446744073709551616 AS UBIGINT)")
    h = sql_splitmix64(f"xor({wrapped}, {sm})")
    return f"""
SELECT CAST({key_col} AS BIGINT) AS {key_col}, {group_col}{cols}
FROM {table}
QUALIFY row_number() OVER (PARTITION BY {group_col}
                           ORDER BY {h}, {key_col}) <= {k}
"""


# ---------------------------------------------------------------------------
# O45: weighted mixture resampling (epoch repetition factors)
# ---------------------------------------------------------------------------


def mixture_resample(ds, stratum_col: str, weights: dict,
                     default_weight: float = 1.0, key_col: str = "doc_id",
                     seed: int = 0):
    """Deterministic weighted resampling: a row in stratum s appears
    ``floor(w_s)`` times plus one more with probability ``frac(w_s)``
    — the training-mixture primitive (e.g. upsample 'zh' 2.5×,
    downsample 'en' 0.25×, keep the rest).  The stochastic-rounding
    draw is splitmix64(key ⊕ mix(seed)), so the realized corpus is
    content-hash deterministic and replays on any cluster layout; the
    output carries a ``rep`` replica index so copies of a row remain
    distinguishable through downstream shuffles.  Pure per-batch
    explode, no shuffle."""
    import pandas as pd

    sm = np.uint64(_seed_mix(seed))

    def plan(w: float) -> tuple[int, np.uint64]:
        if w < 0:
            raise ValueError(f"weight must be >= 0, got {w}")
        base = int(np.floor(w))
        frac = w - base
        # inclusive keep-threshold for the extra copy; frac==0 → never
        thr = np.uint64(_rate_threshold(frac)) if frac > 0 else None
        return base, thr

    plans = {s: plan(w) for s, w in weights.items()}
    plan_def = plan(default_weight)

    def fn(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix64(k ^ sm)
        strat = np.asarray(t[stratum_col])
        n = np.full(len(k), plan_def[0], dtype=np.int64)
        extra = (np.zeros(len(k), dtype=np.int64) if plan_def[1] is None
                 else (h <= plan_def[1]).astype(np.int64))
        for s, (base, thr) in plans.items():
            m = strat == s
            n[m] = base
            extra[m] = 0 if thr is None else (h[m] <= thr).astype(np.int64)
        n = n + extra
        idx = np.repeat(np.arange(len(k)), n)
        rep = (np.arange(idx.size, dtype=np.int64)
               - np.repeat(np.concatenate([[0], np.cumsum(n)[:-1]]), n))
        out = t.take(pa.array(idx))
        return out.append_column("rep", pa.array(rep))

    return ds.map_batches(fn, batch_format="pyarrow")


def mixture_n_sql(stratum_col: str, weights: dict,
                  default_weight: float = 1.0) -> str:
    """CASE expression for the per-row copy count given a UBIGINT hash
    column ``hh`` — shared by the standalone twin and composed twins so
    the stochastic-rounding SQL can never diverge."""

    def n_expr(w: float) -> str:
        base = int(np.floor(w))
        frac = w - base
        if frac <= 0:
            return str(base)
        thr = _rate_threshold(frac)
        return (f"({base} + CASE WHEN hh <= CAST({thr} AS UBIGINT)"
                f" THEN 1 ELSE 0 END)")

    cases = " ".join(f"WHEN '{s}' THEN {n_expr(w)}"
                     for s, w in weights.items())
    return f"CASE {stratum_col} {cases} ELSE {n_expr(default_weight)} END"


def mixture_resample_sql(stratum_col: str, weights: dict,
                         default_weight: float = 1.0,
                         key_col: str = "doc_id", seed: int = 0,
                         table: str = "documents") -> str:
    """DuckDB twin: base copies + a bit-exact splitmix stochastic-
    rounding extra, exploded with generate_series."""
    sm = _seed_mix(seed)
    wrapped = (f"CAST(((CAST({key_col} AS HUGEINT) % 18446744073709551616)"
               f" + 18446744073709551616) % 18446744073709551616 AS UBIGINT)")
    h = sql_splitmix64(f"xor({wrapped}, {sm})")

    n = mixture_n_sql(stratum_col, weights, default_weight)
    return f"""
WITH h AS (
  SELECT {key_col}, {stratum_col}, {h} AS hh FROM {table}),
n AS (SELECT {key_col}, {stratum_col}, {n} AS n FROM h)
SELECT CAST({key_col} AS BIGINT) AS {key_col}, {stratum_col},
       CAST(unnest(generate_series(0, n - 1)) AS BIGINT) AS rep
FROM n WHERE n > 0
"""


# ---------------------------------------------------------------------------
# O47: training feed (epoch-deterministic multi-consumer split)
# ---------------------------------------------------------------------------


def training_feed(ds, key_col: str = "doc_id", seed: int = 0, k: int = 1,
                  equal: bool = True):
    """Trainer-facing ingest surface: the deterministic epoch-``seed``
    permutation (``epoch_shuffle`` — replayable across runs and cluster
    layouts, unlike ``random_shuffle``) fanned out to ``k``
    data-parallel consumers via Ray Data's ``streaming_split``.

    Returns k iterators; each trainer rank consumes one CONCURRENTLY
    (streaming_split coordinates the ranks — sequential consumption of
    one split starves the others).  ``equal`` balances rows per rank
    so gradient steps stay in lockstep.  The epoch's CONTENT per rank
    is the permutation split by block boundary: change ``seed`` per
    epoch for a fresh permutation."""
    if k < 1:
        raise ValueError("k must be >= 1")
    return epoch_shuffle(ds, key_col, seed).streaming_split(
        k, equal=equal)
