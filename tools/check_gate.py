"""Simulate the driver's correctness gate: run every queries() entry at a
given sf_dir and compare against oracle_sql() via DuckDB (row count,
schema, order-insensitive values).  Usage:

    PYTHONPATH=/root/repo python tools/check_gate.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    df = result.to_pandas()  # ray Dataset
    if df.empty and len(df.columns) == 0:
        # Ray 2.49 to_pandas drops columns when every block is empty;
        # recover them from the dataset schema so empty-vs-empty
        # compares stay meaningful (only reachable at tiny sf)
        try:
            df = result.schema().base_schema.empty_table().to_pandas()
        except Exception:
            pass
    return df


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"rowcount ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns ray={list(a.columns)} sql={list(b.columns)}")
        return problems
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(f"dtype[{c}] ray={a[c].dtype} sql={b[c].dtype}")
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f":
                eq = (av == bv) | (np.isnan(av.astype(float)) & np.isnan(bv.astype(float)))
            else:
                eq = av == bv
            bad = int((~eq).sum())
            if bad:
                k = np.nonzero(~eq)[0][0]
                problems.append(f"values[{c}]: {bad} mismatches, first row {k}: "
                                f"ray={av[k]!r} sql={bv[k]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(ray_df)} rows ({dt:.1f}s)")
            continue
        sql_df = con.sql(oracles[name]).df()
        problems = compare(name, ray_df, sql_df)
        if problems:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"PASS {name}: {len(ray_df)} rows ({dt:.1f}s)")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
