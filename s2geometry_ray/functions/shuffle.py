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
    2⁶⁴−1); rates must be in (0, 1] — a 0 rate would wrap to keep-all."""
    if not 0.0 < rate <= 1.0:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    return min(int(rate * 2.0**64), 1 << 64) - 1


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
