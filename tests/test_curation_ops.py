"""Normalization / per-group cap / bigram top terms (round-4 curation
additions): ASCII-only lowering contract, cap determinism across
partition counts, and a brute-force bigram oracle."""
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_normalize_text_ascii_only_and_idempotent(ray_session):
    import ray.data as rd

    from s2geometry_ray.functions.text import NormalizeText

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["  Hello\t\tWORLD \n", "İstanbul ẞ Straße",
                 "already normal", "\f\va\r\nb\t"],
    })
    out = rd.from_pandas(df).map_batches(
        NormalizeText, batch_format="pyarrow", concurrency=1).to_pandas()
    got = dict(zip(out["doc_id"], out["norm_text"]))
    assert got[0] == "hello world"
    # non-ASCII letters are NOT lowered (explicit ASCII-only contract —
    # Python/DuckDB unicode lower() rules differ); the ASCII S still is
    assert got[1] == "İstanbul ẞ straße"
    assert got[2] == "already normal"
    assert got[3] == "a b"
    # idempotence
    out2 = rd.from_pandas(out.drop(columns=["text"])
                          .rename(columns={"norm_text": "text"})
                          [["doc_id", "text"]]).map_batches(
        NormalizeText, batch_format="pyarrow", concurrency=1).to_pandas()
    assert (out2["norm_text"] == out2["text"]).all()


def test_cap_per_group_partition_invariance_and_bound(ray_session):
    import ray.data as rd

    from s2geometry_ray.functions.shuffle import cap_per_group

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "source"])
    a = cap_per_group(ds, "source", k=7, seed=5, num_parts=2).to_pandas()
    b = cap_per_group(ds, "source", k=7, seed=5, num_parts=16).to_pandas()
    sa = a.sort_values("doc_id").reset_index(drop=True)
    sb = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(sa, sb)
    assert (a.groupby("source").size() <= 7).all()
    # a different seed draws a different (same-sized) survivor set
    c = cap_per_group(ds, "source", k=7, seed=6, num_parts=4).to_pandas()
    assert len(c) == len(a)
    assert set(c["doc_id"]) != set(a["doc_id"])


def test_cap_per_group_small_groups_survive_whole(ray_session):
    import ray.data as rd

    from s2geometry_ray.functions.shuffle import cap_per_group

    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "source": ["a"] * 2 + ["b"] * 8,
    })
    out = cap_per_group(rd.from_pandas(df), "source", k=5,
                        num_parts=3).to_pandas()
    g = out.groupby("source").size()
    assert g["a"] == 2 and g["b"] == 5


def test_bigram_top_terms_vs_brute(ray_session):
    import pyarrow.parquet as pq

    from s2geometry_ray.functions.text import TOKEN_PATTERN
    from s2geometry_ray.pipelines.analytics import bigram_top_terms

    got = bigram_top_terms(SF, topn=50)
    rx = re.compile(TOKEN_PATTERN)
    cnt = Counter()
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    for s in texts:
        ts = rx.findall(str(s))
        cnt.update(f"{a} {b}" for a, b in zip(ts, ts[1:]))
    ref = (pd.DataFrame(sorted(cnt.items()), columns=["term", "c"])
           .sort_values(["c", "term"], ascending=[False, True],
                        kind="mergesort").head(50).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"c": "int64"}), ref.astype({"c": "int64"}))


def test_mixture_resample_contract(ray_session):
    """floor(w) copies always appear; the extra copy rate is plausible;
    rep indexes are dense 0..n-1; integer weights are exact; weight 0
    drops the stratum entirely."""
    import ray.data as rd

    from s2geometry_ray.functions.shuffle import mixture_resample

    df = pd.DataFrame({
        "doc_id": np.arange(2000, dtype=np.int64),
        "lang": np.where(np.arange(2000) % 4 == 0, "zh",
                         np.where(np.arange(2000) % 4 == 1, "en", "de")),
    })
    out = mixture_resample(rd.from_pandas(df), "lang",
                           {"zh": 2.5, "en": 0.25, "de": 3.0},
                           default_weight=1.0, seed=9).to_pandas()
    g = out.groupby(["lang", "doc_id"]).size()
    zh = g.loc["zh"]
    assert zh.min() >= 2 and zh.max() <= 3          # floor + extra
    assert abs(zh.mean() - 2.5) < 0.1               # stochastic rounding
    assert (g.loc["de"] == 3).all()                 # integer weight exact
    en_total = (out["lang"] == "en").sum()
    assert 0.15 * 500 < en_total < 0.35 * 500       # ~0.25 Bernoulli
    # rep dense per row
    reps = out.groupby("doc_id")["rep"].agg(["min", "max", "size"])
    assert (reps["min"] == 0).all()
    assert (reps["max"] == reps["size"] - 1).all()
    # weight 0 drops the stratum
    out0 = mixture_resample(rd.from_pandas(df), "lang", {"zh": 0.0},
                            default_weight=1.0, seed=9).to_pandas()
    assert (out0["lang"] != "zh").all()
    # determinism across runs
    out2 = mixture_resample(rd.from_pandas(df), "lang",
                            {"zh": 2.5, "en": 0.25, "de": 3.0},
                            default_weight=1.0, seed=9).to_pandas()
    a = out.sort_values(["doc_id", "rep"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "rep"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_decontaminate_exact_and_negative(ray_session):
    """A doc containing a query verbatim is flagged; a disjoint-alphabet
    doc has zero hits; n_hits counts DISTINCT shared shingles (repeats
    in the doc don't inflate)."""
    import ray.data as rd

    from s2geometry_ray.functions.dedup import _shingle_hashes, decontaminate

    q = "the quick brown fox"
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [f"prefix {q} suffix",          # verbatim containment
                 "zzz www qqq vvv",              # disjoint
                 f"{q} {q} {q}",                 # repeats → same distinct set
                 "THE QUICK BROWN FOX is cased"  # lowercased shingles match
                 ],
    })
    out = decontaminate(rd.from_pandas(df), [q], min_hits=3).to_pandas() \
        .set_index("doc_id")
    nq = len(_shingle_hashes(q))
    assert out.loc[0, "n_hits"] >= nq          # all query shingles present
    assert out.loc[0, "contaminated"]
    assert out.loc[1, "n_hits"] == 0 and not out.loc[1, "contaminated"]
    # repeats add only the joining shingles ("x t", etc.), never n×
    assert out.loc[2, "n_hits"] < 2 * nq
    assert out.loc[3, "n_hits"] >= nq          # case-insensitive
    with pytest.raises(ValueError):
        decontaminate(rd.from_pandas(df), [])


def test_training_feed_multiset_and_balance(ray_session):
    """Two concurrently-consumed ranks together see EXACTLY the input
    multiset, balanced to within one block; a second epoch (different
    seed) yields a different within-rank order over the same multiset."""
    from concurrent.futures import ThreadPoolExecutor

    import ray.data as rd

    from s2geometry_ray.functions.shuffle import training_feed

    df = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(8)

    def drain(split):
        out = []
        for b in split.iter_batches(batch_format="pandas", batch_size=64):
            out.append(b)
        return pd.concat(out) if out else pd.DataFrame({"doc_id": []})

    def epoch(seed):
        splits = training_feed(ds, seed=seed, k=2)
        with ThreadPoolExecutor(2) as ex:
            return list(ex.map(drain, splits))

    a0, a1 = epoch(1)
    got = sorted(pd.concat([a0, a1])["doc_id"])
    assert got == list(range(400))                 # exact multiset
    assert abs(len(a0) - len(a1)) <= 64            # equalized (±1 block)
    b0, b1 = epoch(2)
    assert sorted(pd.concat([b0, b1])["doc_id"]) == list(range(400))
    # different epoch ⇒ different permutation (overwhelmingly)
    assert (list(a0["doc_id"]) != list(b0["doc_id"])
            or list(a1["doc_id"]) != list(b1["doc_id"]))
    import pytest as _pt

    with _pt.raises(ValueError):
        training_feed(ds, k=0)


def test_leakage_safe_split_properties(ray_session):
    """O62: (a) every member of a dup cluster gets its cluster's split —
    no exact/prefix duplicate pair straddles train/eval; (b) fractions
    are approximately honored over many singleton clusters; (c) bad
    fraction configs raise."""
    import pyarrow as pa
    import ray.data as rd

    from s2geometry_ray.functions.dedup import (leakage_safe_split,
                                                split_thresholds)

    n = 900
    texts = []
    for i in range(n):
        if i < 300:  # 100 exact-dup clusters of 3 (distinct prefixes)
            texts.append(f"{i % 100:05d} duplicated training document body")
        else:
            texts.append(f"{i:05d}u unique document " + "x" * (i % 37))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts)}))
    out = leakage_safe_split(ds, {"train": 0.8, "val": 0.1, "test": 0.1},
                             seed=19).to_pandas()
    assert len(out) == n and set(out.columns) == {"doc_id", "rep", "split"}
    # (a) one split per cluster rep
    per_rep = out.groupby("rep")["split"].nunique()
    assert (per_rep == 1).all()
    dup = out[out["doc_id"] < 300]
    assert (dup.groupby(dup["doc_id"] % 100)["split"].nunique() == 1).all()
    # (b) fractions roughly honored (binomial noise over ~700 clusters)
    frac = out.groupby("split")["doc_id"].count() / n
    assert abs(frac.get("train", 0) - 0.8) < 0.08
    # (c) loud config failures
    with pytest.raises(ValueError, match="sum to 1"):
        split_thresholds({"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError, match="positive"):
        split_thresholds({"train": 1.2, "val": -0.2})
