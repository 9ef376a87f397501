"""Driver-contract smoke: entry(), queries()/oracle_sql() consistency,
plus an in-test replay of a few SQL-checked queries at sf0.001."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as E  # noqa: E402

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def test_contract_shapes():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 20
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 12
    for name, fn in qs.items():
        assert callable(fn), name


def test_entry_smoke(ray_session):
    res = E.entry()
    df = res.to_pandas()
    assert len(df) >= 0
    assert {"tile_key", "n", "value_cents"} <= set(df.columns)


@pytest.mark.parametrize("name", ["spatial_join_rect", "spatial_join_rect_hash",
                                  "knn_events", "events_window_counts",
                                  "dedup_doc_prefix16", "tile_assign_salted",
                                  "sessionize_events", "order_priority_revenue",
                                  # round-4 generated-oracle conversions
                                  "simhash_docs", "simhash_pairs_docs",
                                  "decode_images", "covering_mixed_tiles",
                                  "phash_band_buckets", "audio_features_av",
                                  # round-4 relational operators
                                  "asof_join_events_orders",
                                  "range_join_events_parts",
                                  "rolling_user_value",
                                  "topn_orders_per_segment",
                                  "quantiles_events", "io_roundtrip_jsonl"])
def test_gate_queries_vs_duckdb(ray_session, name):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    ray_df = E.queries()[name](SF)
    ray_df = ray_df.to_pandas() if hasattr(ray_df, "to_pandas") else ray_df
    sql_df = con.sql(E.oracle_sql()[name]).df()
    cols = sorted(ray_df.columns)
    assert cols == sorted(sql_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = sql_df[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b)
    for c in cols:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert (av == bv).all(), (name, c, np.nonzero(av != bv)[0][:3])
