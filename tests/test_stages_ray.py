"""Ray-level stage tests: join/knn/dedup/decode/salting through real
Dataset pipelines on the session-scoped Ray (SURVEY.md §6.2.3/4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from s2geometry_ray.kernels import cellid as vk
from s2geometry_ray.oracle import s2 as o
from s2geometry_ray.sources.geotag import derive_lat, derive_lng


@pytest.fixture(scope="module")
def points_ds(ray_session):
    import ray.data as rd

    from s2geometry_ray.stages.cell_assign import make_geotag_and_assign

    keys = pa.table({"pt_key": pa.array(np.arange(20000, dtype=np.int64))})
    ds = rd.from_arrow(keys)
    return ds.map_batches(make_geotag_and_assign("pt_key", levels=(4, 8)),
                          batch_format="pyarrow").materialize()


def test_cell_assign_stage(points_ds):
    df = points_ds.to_pandas()
    assert len(df) == 20000
    key = df["pt_key"].to_numpy()
    assert np.array_equal(df["lat"].to_numpy(), derive_lat(key))
    # cell ids match the scalar oracle
    for i in range(0, 20000, 2500):
        assert int(df["cell_id"][i]) == o.from_lat_lng(df["lat"][i], df["lng"][i])
        assert int(df["cell_l8"][i]) == o.parent(int(df["cell_id"][i]), 8)


def test_spatial_join_stage_vs_sql(points_ds, ray_session):
    import duckdb

    from s2geometry_ray.stages.spatial_join import (
        CoveringIndex,
        make_spatial_join_fn,
        tiles_from_keys,
    )

    tiles = tiles_from_keys(np.arange(25))
    index = CoveringIndex.build(tiles, max_cells=64, max_level=14)
    ref = ray_session.put(index)
    out = points_ds.map_batches(make_spatial_join_fn(ref, ["pt_key"]),
                                batch_format="pyarrow").to_pandas()
    got = {(int(r.pt_key), r.tile_id) for r in out.itertuples()}
    k = np.arange(20000)
    lat, lng = derive_lat(k), derive_lng(k)
    want = set()
    from s2geometry_ray.sources.geotag import tile_bounds

    b = tile_bounds(np.arange(25))
    for t in range(25):
        inside = ((lat >= b["lat_lo"][t]) & (lat <= b["lat_hi"][t])
                  & (lng >= b["lng_lo"][t]) & (lng <= b["lng_hi"][t]))
        for i in np.nonzero(inside)[0]:
            want.add((int(i), f"tile{t}"))
    assert got == want
    del duckdb


def test_knn_stage_exact(points_ds):
    from s2geometry_ray.stages.knn import knn

    qk = np.arange(1, 31, dtype=np.int64) * 700
    qlat, qlng = derive_lat(qk), derive_lng(qk)
    for level in (None, 4):
        res = knn(points_ds, qk, qlat, qlng, 5, "pt_key",
                  leaf_col="cell_id", level=level).to_pandas()
        # brute-force oracle
        k = np.arange(20000)
        plat, plng = derive_lat(k), derive_lng(k)
        pxyz = vk.latlng_to_xyz(plat, plng)
        qxyz = vk.latlng_to_xyz(qlat, qlng)
        for qi, qid in enumerate(qk):
            d2 = ((pxyz - qxyz[qi]) ** 2).sum(axis=1)
            order = np.lexsort((k, d2))[:5]
            want = set(k[order].tolist())
            got = set(res[res["query_id"] == qid]["pt_key"].tolist())
            assert got == want, (level, qid)


def test_salted_groupby_equals_oracle(ray_session):
    import ray.data as rd

    from s2geometry_ray.stages.tile_assign import (
        grouped_stats,
        salt_plan,
        salted_map_groups,
    )

    # skew fixture: 30% of rows in ONE key (SURVEY.md §7.3.4)
    rng = np.random.default_rng(4)
    n = 50000
    keys = rng.integers(0, 200, n, dtype=np.int64)
    keys[: int(0.3 * n)] = 7
    vals = rng.uniform(0, 10, n)
    t = pa.table({"k": keys, "v": vals, "row": np.arange(n, dtype=np.int64)})
    ds = rd.from_arrow(t).repartition(8).materialize()

    # grouped_stats (algebraic path) vs pandas
    got = grouped_stats(ds, "k", "v").to_pandas().sort_values("k").reset_index(drop=True)
    want = (pd.DataFrame({"k": keys, "v": vals}).groupby("k", as_index=False)
            .agg(n=("v", "size"), s=("v", "sum"), mn=("v", "min"), mx=("v", "max"))
            .sort_values("k").reset_index(drop=True))
    assert np.array_equal(got["n"].to_numpy(), want["n"].to_numpy())
    assert np.allclose(got["s"].to_numpy(), want["s"].to_numpy(), rtol=1e-12)
    assert np.array_equal(got["mn"].to_numpy(), want["mn"].to_numpy())

    # salting plan marks the hot key
    plan = salt_plan(ds, "k", target_rows_per_group=2000, sample_fraction=0.2)
    assert plan.get(7, 1) > 1

    # salted map_groups == unsalted oracle for a non-algebraic agg (median-ish)
    def partial(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [g["k"].iloc[0]], "n": [len(g)],
                             "s": [g["v"].sum()]})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # no salted sub-group may exceed ~2x the target (skew bounded)
        assert (g["n"] <= 8000).all(), g["n"].max()
        return pd.DataFrame({"k": [g["k"].iloc[0]], "n": [g["n"].sum()],
                             "s": [g["s"].sum()]})

    out = salted_map_groups(ds, "k", "row", partial, merge,
                            target_rows_per_group=2000,
                            sample_fraction=0.2).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert np.array_equal(out["n"].to_numpy(), want["n"].to_numpy())
    assert np.allclose(out["s"].to_numpy(), want["s"].to_numpy(), rtol=1e-9)


def test_exact_dedup_with_real_duplicates(ray_session):
    import ray.data as rd

    from s2geometry_ray.functions.dedup import exact_dedup_groups

    texts = [f"document body {i % 40}" for i in range(400)]  # 40 distinct, 10 copies
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(np.arange(400, dtype=np.int64)),
                                 "text": pa.array(texts)}))
    out = exact_dedup_groups(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 40
    assert (out["n_copies"] == 10).all()
    assert out["doc_id"].tolist() == list(range(40))  # min doc_id kept


def test_minhash_finds_near_duplicates(ray_session):
    import ray.data as rd

    from s2geometry_ray.functions.dedup import minhash_candidate_pairs, ngram_jaccard

    rng = np.random.default_rng(11)
    base = ("the quick brown fox jumps over the lazy dog while the band plays "
            "a long tune about distributed systems and spherical geometry")
    docs, ids = [], []
    for i in range(30):
        docs.append(f"totally unrelated document number {i} " + "".join(
            rng.choice(list("abcdefghij "), 80)))
        ids.append(i)
    docs.append(base)
    ids.append(100)
    docs.append(base.replace("lazy", "sleepy"))  # near-dup of 100
    ids.append(101)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
                                 "text": pa.array(docs)}))
    pairs = minhash_candidate_pairs(ds, concurrency=2).to_pandas()
    assert ((pairs["key_a"] == 100) & (pairs["key_b"] == 101)).any()
    # verified jaccard confirms
    sim = ngram_jaccard([base], [base.replace("lazy", "sleepy")])[0]
    assert sim > 0.8
    assert ngram_jaccard([docs[0]], [base])[0] < 0.3


def test_minhash_bulk_matches_scalar():
    """The Arrow-buffer bulk signature path must be bit-identical to the
    per-text scalar path (same pack/mix/affine formula)."""
    from s2geometry_ray.functions.dedup import MinHasher

    mh = MinHasher()
    texts = ["the quick brown fox", "", "ab", "x" * 4, "hello world " * 40,
             "Ünïcode tëxt with ümlaut", "exact", "exact",
             "tab\tand\nnewline chars", "1234567890"]
    bulk = mh.signatures_bulk(pa.array(texts))
    for i, t in enumerate(texts):
        assert (bulk[i] == mh.signature(t)).all(), f"doc {i} ({t!r}) differs"


@pytest.mark.parametrize("small_thr", [2_000_000, 0],
                         ids=["fast-path", "distributed-loop"])
def test_connected_components_chain(ray_session, small_thr):
    """Min-label propagation must converge on a long CHAIN (worst-case
    diameter), star edges, and singletons — on BOTH plans: the
    driver-side small-graph fast path and the fused distributed loop
    (forced with small_edge_threshold=0)."""
    import ray.data as rd

    from s2geometry_ray.functions.dedup import connected_components

    # chain 0-1-2-...-9 (diameter 9), star 20<-{21,22,23}, singletons 30,31
    ea = list(range(9)) + [20, 20, 20]
    eb = list(range(1, 10)) + [21, 22, 23]
    edges = rd.from_arrow(pa.table({
        "key_a": pa.array(ea, type=pa.int64()),
        "key_b": pa.array(eb, type=pa.int64()),
    }))
    nodes = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(10)) + [20, 21, 22, 23, 30, 31],
                           type=pa.int64()),
    }))
    out = connected_components(edges, nodes,
                               small_edge_threshold=small_thr).to_pandas()
    rep = dict(zip(out["doc_id"], out["rep"]))
    assert all(rep[i] == 0 for i in range(10))
    assert all(rep[i] == 20 for i in (20, 21, 22, 23))
    assert rep[30] == 30 and rep[31] == 31


def test_connected_components_paths_agree(ray_session):
    """Fast path == distributed loop on a random multi-component graph."""
    import ray.data as rd

    from s2geometry_ray.functions.dedup import connected_components

    rng = np.random.default_rng(6)
    n = 500
    ea = rng.integers(0, n, 300)
    eb = rng.integers(0, n, 300)
    edges = rd.from_arrow(pa.table({"key_a": pa.array(ea, type=pa.int64()),
                                    "key_b": pa.array(eb, type=pa.int64())}))
    nodes = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64))}))
    fast = connected_components(edges, nodes).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    loop = connected_components(edges, nodes, small_edge_threshold=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, loop, check_dtype=False)


def test_group_star_edges(ray_session):
    import ray.data as rd

    from s2geometry_ray.functions.dedup import group_star_edges

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([5, 3, 9, 7, 1], type=pa.int64()),
        "fp64": pa.array([10, 10, 10, 20, 30], type=pa.int64()),
    }))
    edges = group_star_edges(ds, "fp64").to_pandas()
    got = {(int(a), int(b)) for a, b in zip(edges["key_a"], edges["key_b"])}
    assert got == {(3, 5), (3, 9)}  # min of group 10 links the others


def test_minhash_oph_scheme():
    """OPH signatures: deterministic, identical docs → identical sigs,
    near-dups mostly agree, scalar wrapper == bulk, densification fills
    every bin."""
    from s2geometry_ray.functions.dedup import MinHasher

    mh = MinHasher(scheme="oph")
    texts = ["the quick brown fox jumps over the lazy dog " * 6,
             "the quick brown fox jumps over the lazy dog " * 6,
             "the quick brown fox jumps over the sleepy dog " * 6,
             "completely different text about ray data pipelines " * 6,
             "x",  # shorter than shingle width → padded single shingle
             ""]
    sigs = mh.signatures_bulk(pa.array(texts))
    assert (sigs[0] == sigs[1]).all()  # identical docs
    near = np.mean(sigs[0] == sigs[2])
    far = np.mean(sigs[0] == sigs[3])
    assert near > 0.5 and far < near
    assert (sigs != np.uint64(0xFFFFFFFFFFFFFFFF)).all()  # densified
    for i in (0, 3, 4, 5):
        assert (mh.signature(texts[i]) == sigs[i]).all()


def test_minhash_oph_finds_planted_duplicates(ray_session):
    import ray.data as rd

    from s2geometry_ray.functions.dedup import minhash_candidate_pairs

    rng = np.random.default_rng(9)
    words = [f"w{k}" for k in range(300)]
    base = [" ".join(rng.choice(words, 60)) for _ in range(80)]
    texts = base + [t + " tail" for t in base[:20]]  # 20 planted near-dups
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(100, dtype=np.int64)),
        "text": pa.array(texts),
    }))
    pairs = minhash_candidate_pairs(ds, concurrency=2, scheme="oph").to_pandas()
    found = {(int(a), int(b)) for a, b in zip(pairs["key_a"], pairs["key_b"])}
    planted = {(i, 80 + i) for i in range(20)}
    recall = len(found & planted) / 20
    assert recall >= 0.9, recall


def test_jaccard_verified_pairs(ray_session):
    """Every returned pair is EXACTLY >= tau (verified), the e4 value
    matches brute shingle Jaccard, and planted near-dups are found."""
    import ray.data as rd

    from s2geometry_ray.functions.dedup import (_shingle_hashes,
                                                jaccard_verified_pairs)

    rng = np.random.default_rng(17)
    words = [f"w{k}" for k in range(200)]
    base = [" ".join(rng.choice(words, 50)) for _ in range(60)]
    texts = base + [t + " extra tail" for t in base[:15]]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    }))
    out = jaccard_verified_pairs(ds, tau=0.5).to_pandas()
    assert len(out) >= 15  # planted near-dups all well above 0.5
    shingles = [set(_shingle_hashes(t).tolist()) for t in texts]
    for a, b, e4 in zip(out["key_a"], out["key_b"], out["jaccard_e4"]):
        sa, sb = shingles[int(a)], shingles[int(b)]
        jac = len(sa & sb) / len(sa | sb)
        assert jac >= 0.5
        assert int(round(jac * 10_000)) == int(e4)
    planted = {(i, 60 + i) for i in range(15)}
    found = {(int(a), int(b)) for a, b in zip(out["key_a"], out["key_b"])}
    assert len(found & planted) >= 14  # LSH recall on planted dups


def test_simhash_pairs_exact_vs_brute(ray_session):
    """Multi-index banding is EXACT for hamming ≤ r (pigeonhole): the
    operator's pair set must equal the brute all-pairs computation."""
    import ray.data as rd

    from s2geometry_ray.functions.dedup import (
        SimHasher, hamming64, simhash_candidate_pairs)

    rng = np.random.default_rng(21)
    words = [f"tok{k}" for k in range(120)]
    base = [" ".join(rng.choice(words, 40)) for _ in range(150)]
    texts = list(base)
    for i in range(40):  # near-dups: change one token
        toks = base[i].split()
        toks[rng.integers(0, len(toks))] = "changed"
        texts.append(" ".join(toks))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    }))
    r = 3
    got = simhash_candidate_pairs(ds, r=r).to_pandas()
    got_set = {(int(a), int(b)) for a, b in zip(got["key_a"], got["key_b"])}
    hs = SimHasher().simhash_bulk(pa.array(texts))
    ia, ib = np.triu_indices(len(texts), k=1)
    d = hamming64(hs[ia], hs[ib])
    want = {(int(a), int(b)) for a, b in zip(ia[d <= r], ib[d <= r])}
    assert want, "fixture must produce close pairs"
    assert got_set == want
    assert (got["hamming"] <= r).all()


def test_simhash_pairs_duplicate_heavy_exact(ray_session):
    """Round-2 advisory: duplicate-heavy corpora (all docs share a band
    bucket) must emit the FULL pair triangle — no silent max_bucket
    truncation.  300 identical docs → C(300,2) = 44850 pairs, every doc
    present in ≥1 pair."""
    import ray.data as rd

    from s2geometry_ray.functions.dedup import simhash_candidate_pairs

    n = 300
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["the same exact document text repeated"] * n),
    }))
    out = simhash_candidate_pairs(ds, r=3).to_pandas()
    assert len(out) == n * (n - 1) // 2
    present = set(out["key_a"]) | set(out["key_b"])
    assert len(present) == n
    # pairs are distinct and ordered
    assert (out["key_a"] < out["key_b"]).all()
    assert not out.duplicated(["key_a", "key_b"]).any()


def test_simhash_pairs_string_keys(ray_session):
    """String doc ids flow through banding, the pair shard hash, and the
    empty-batch schema (round-2 advisory: the empty branch hardcoded
    int64 and broke concatenation)."""
    import ray.data as rd

    from s2geometry_ray.functions.dedup import simhash_candidate_pairs

    texts = ["common shared text body number " + str(i % 5) for i in range(30)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([f"doc-{i:03d}" for i in range(30)]),
        "text": pa.array(texts),
    }))
    out = simhash_candidate_pairs(ds, r=2).to_pandas()
    # each group of 6 identical docs yields C(6,2)=15 pairs at hamming 0
    assert len(out) >= 5 * 15
    assert out["key_a"].map(type).eq(str).all()
    assert (out["key_a"] < out["key_b"]).all()


def test_connected_components_missing_node_raises(ray_session):
    """Round-2 advisory: an edge endpoint absent from nodes_ds must fail
    loudly, not propagate -1 as the component label."""
    import pytest
    import ray.data as rd

    from s2geometry_ray.functions.dedup import connected_components

    edges = rd.from_arrow(pa.table({
        "key_a": pa.array([1], type=pa.int64()),
        "key_b": pa.array([99], type=pa.int64()),  # 99 not in nodes
    }))
    nodes = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2], type=pa.int64())}))
    with pytest.raises(Exception) as ei:
        connected_components(edges, nodes).to_pandas()
    assert "not present in" in str(ei.value)


def test_simhash_bulk_consistency():
    """Bulk simhash over a column equals the per-text wrapper, and docs
    with shared token multisets hash closer than unrelated docs."""
    from s2geometry_ray.functions.dedup import SimHasher, hamming64

    sh = SimHasher()
    texts = ["alpha beta gamma delta", "", "  ", "alpha beta gamma delta",
             "sömé ünicode wörds", "punct! only?? here..", "a b c d e f"]
    bulk = sh.simhash_bulk(pa.array(texts))
    singles = np.array([sh.simhash(t) for t in texts], dtype=np.uint64)
    assert (bulk == singles).all()
    assert bulk[0] == bulk[3]  # identical docs → identical simhash
    assert bulk[1] == 0 and bulk[5] != 0


def test_simhash_hamming(ray_session):
    from s2geometry_ray.functions.dedup import SimHasher, hamming64

    sh = SimHasher()
    a = sh.simhash("the quick brown fox jumps over the lazy dog again and again")
    b = sh.simhash("the quick brown fox jumps over the sleepy dog again and again")
    c = sh.simhash("completely different text about ray data pipelines and arrow")
    ab = hamming64(np.array([a]), np.array([b]))[0]
    ac = hamming64(np.array([a]), np.array([c]))[0]
    assert ab < ac


def test_decode_stage_e2e(ray_session):
    from s2geometry_ray.sources.synth import gen_pixels, images_dataset
    from s2geometry_ray.stages.decode import decode_stage

    out = decode_stage(images_dataset(120), concurrency=2, with_boxes=True).to_pandas()
    assert len(out) == 120
    assert out["phash_ok"].all()  # bit-exact decode ⇒ phash reproduces
    # captions pass through unchanged (caption equality clause)
    from s2geometry_ray.sources.synth import gen_image_row

    row = gen_image_row(5)
    got = out[out["image_id"] == row["image_id"]].iloc[0]
    assert got["caption"] == row["caption"]
    # feature values match a direct decode
    px = gen_pixels(row["image_id"], row["w"], row["h"])
    assert got["mean_r"] == px[:, :, 0].mean()


def test_ann_brute_vs_numpy(ray_session):
    import ray.data as rd

    from s2geometry_ray.functions.ann import brute_topk

    rng = np.random.default_rng(3)
    emb = rng.normal(size=(500, 16)).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(500, dtype=np.int64)),
        "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float32())),
    }))
    q = emb[:3].astype(np.float64)
    res = brute_topk(ds, q, k=7, concurrency=2).to_pandas()
    x = emb.astype(np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = xn @ qn.T
    for qi in range(3):
        order = np.lexsort((np.arange(500), -sims[:, qi]))[:7]
        want = set(order.tolist())
        got = set(res[res["query_idx"] == qi]["vec_id"].tolist())
        assert got == want


def test_ivf_recall_vs_brute(ray_session):
    """IVF approximate top-k must reach high recall vs brute on clustered
    embeddings (the honest measurement promised in functions/ann.py)."""
    import ray.data as rd

    from s2geometry_ray.functions.ann import brute_topk, ivf_topk

    rng = np.random.default_rng(8)
    centers = rng.normal(size=(8, 24))
    emb = np.concatenate([
        c + 0.15 * rng.normal(size=(80, 24)) for c in centers
    ]).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(emb), dtype=np.int64)),
        "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float32())),
    })).repartition(4).materialize()
    q = emb[::160].astype(np.float64)  # 4 queries, one per cluster-ish
    k = 10
    brute = brute_topk(ds, q, k=k, concurrency=2).to_pandas()
    approx = ivf_topk(ds, q, k=k, n_centroids=8, nprobe=3, concurrency=2).to_pandas()
    recalls = []
    for qi in range(len(q)):
        want = set(brute[brute["query_idx"] == qi]["vec_id"])
        got = set(approx[approx["query_idx"] == qi]["vec_id"])
        recalls.append(len(want & got) / k)
    assert np.mean(recalls) >= 0.9, recalls


def test_cosine_neardup_finds_planted_pairs(ray_session):
    import ray.data as rd

    from s2geometry_ray.functions.ann import cosine_neardup_pairs

    rng = np.random.default_rng(12)
    emb = rng.normal(size=(300, 16)).astype(np.float32)
    emb[250:] = emb[:50] + 0.01 * rng.normal(size=(50, 16)).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(300, dtype=np.int64)),
        "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float32())),
    }))
    pairs = cosine_neardup_pairs(ds, tau=0.98, n_centroids=6,
                                 concurrency=2).to_pandas()
    found = [(int(a), int(b)) for a, b in zip(pairs["key_a"], pairs["key_b"])]
    # multi-probe must not emit a pair twice (min-common-bucket rule)
    assert len(found) == len(set(found)), "duplicate pairs emitted"
    # recall vs the brute O(N²) oracle at the same tau
    x = emb.astype(np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = xn @ xn.T
    oa, ob = np.nonzero(np.triu(sims >= 0.98, k=1))
    oracle = {(int(a), int(b)) for a, b in zip(oa, ob)}
    assert oracle, "fixture must plant pairs"
    recall = len(set(found) & oracle) / len(oracle)
    assert recall >= 0.9, (recall, len(oracle))
    # precision is exact: every emitted pair really is >= tau
    assert set(found) <= oracle


def test_cosine_neardup_subbucket_recall_no_truncation(ray_session):
    """Round-2 verdict item 4: buckets far beyond max_bucket_rows (the
    post-centroid-clip regime) must sub-bucket via in-bucket LSH —
    recall ≥ 0.9 on planted near-dups with ZERO silent truncation."""
    import ray.data as rd

    from s2geometry_ray.functions.ann import cosine_neardup_pairs

    rng = np.random.default_rng(31)
    n_base = 2000
    emb = rng.normal(size=(n_base, 16)).astype(np.float64)
    dup = emb[:200] + 0.01 * rng.normal(size=(200, 16))
    allv = np.vstack([emb, dup])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(allv), dtype=np.int64)),
        "embedding": pa.array(allv.tolist(), type=pa.list_(pa.float64())),
    }))
    # n_centroids=2 forces ~1100-row buckets; max_bucket_rows=200 forces
    # the sub-LSH path (h = ceil(log2(1100/200)) = 3 planes, 3 reps)
    raw = cosine_neardup_pairs(ds, tau=0.98, n_centroids=2,
                               max_bucket_rows=200, concurrency=2,
                               expose_truncation=True).to_pandas()
    assert (raw["truncated"] == 0).all(), "unexpected truncation"
    found = {(int(a), int(b)) for a, b in zip(raw["key_a"], raw["key_b"])}
    xn = allv / np.linalg.norm(allv, axis=1, keepdims=True)
    sims = xn @ xn.T
    oa, ob = np.nonzero(np.triu(sims >= 0.98, k=1))
    oracle = {(int(a), int(b)) for a, b in zip(oa, ob)}
    assert len(oracle) >= 200
    assert found <= oracle  # precision exact
    recall = len(found & oracle) / len(oracle)
    assert recall >= 0.9, (recall, len(oracle))
    assert len(found) == len(raw), "duplicate pairs across sub-LSH reps"


def test_cosine_neardup_truncation_is_counted(ray_session):
    """When max_pairs_per_bucket bites, the dropped-pair count must be
    emitted as a counter row — never silent (round-2 advisory)."""
    import ray.data as rd

    from s2geometry_ray.functions.ann import cosine_neardup_pairs

    rng = np.random.default_rng(7)
    v = rng.normal(size=16)
    emb = np.tile(v, (30, 1)) + 0.001 * rng.normal(size=(30, 16))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(30, dtype=np.int64)),
        "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float64())),
    }))
    raw = cosine_neardup_pairs(ds, tau=0.9, n_centroids=2,
                               max_pairs_per_bucket=50, concurrency=2,
                               expose_truncation=True).to_pandas()
    counters = raw[raw["key_a"] == -1]
    real = raw[raw["key_a"] != -1]
    # 30 near-identical vectors → C(30,2)=435 pairs; 50 kept, 385 counted
    assert len(real) == 50
    assert counters["truncated"].sum() == 435 - 50
    # default path hides counter rows but keeps the 50 real pairs
    slim = cosine_neardup_pairs(ds, tau=0.9, n_centroids=2,
                                max_pairs_per_bucket=50,
                                concurrency=2).to_pandas()
    assert len(slim) == 50 and list(slim.columns) == ["key_a", "key_b", "sim"]


def test_salt_plan_uint64_cell_keys(ray_session):
    """Regression: salting must work when the group key is a uint64 S2
    prefix column (plan keys are int64 bit-views — lookups must match)."""
    import ray.data as rd

    from s2geometry_ray.stages.tile_assign import add_salt, salt_plan

    hot = np.uint64((5 << 61) | (1 << 44))  # face-5 cell id with the top bit set
    keys = np.full(20000, hot, dtype=np.uint64)
    keys[:5000] = np.uint64((1 << 61) | (1 << 44))
    t = pa.table({"cell": pa.array(keys, type=pa.uint64()),
                  "row": pa.array(np.arange(20000, dtype=np.int64))})
    ds = rd.from_arrow(t).repartition(4).materialize()
    plan = salt_plan(ds, "cell", target_rows_per_group=2000, sample_fraction=0.5)
    assert plan, "hot uint64 key not detected"
    salted = add_salt(ds, "cell", plan, "row").to_pandas()
    hot_rows = salted[salted["cell"] == hot]
    assert hot_rows["salt"].nunique() > 1, "hot uint64 key was not salted"


def test_circumradius_bound_safe():
    """The analytic circumradius bound used by the vectorized kNN ring
    expansion must dominate the exact circumradius at every level."""
    from s2geometry_ray.stages.knn import QueryIndex, _cell_circumradius

    rng2 = np.random.default_rng(31)
    for level in (2, 4, 6, 8, 10, 14):
        ids = vk.parent(vk.from_latlng(rng2.uniform(-89, 89, 40),
                                       rng2.uniform(-180, 180, 40)), level)
        bound = 0.5 * QueryIndex._CIRCUM_DERIV * (2.0 ** (-level))
        for c in ids:
            assert _cell_circumradius(int(c)) <= bound, (level, hex(int(c)))


def test_join_plans_agree_on_exact_boundaries(ray_session):
    """Points landing EXACTLY on rect boundaries must be included by both
    join plans (closed intervals, BETWEEN semantics), identically."""
    import ray.data as rd

    from s2geometry_ray.kernels.regions import RectRegion
    from s2geometry_ray.stages.cell_assign import assign_cells
    from s2geometry_ray.stages.spatial_join import (
        CoveringIndex,
        make_spatial_join_fn,
        spatial_join_hash_plan,
    )

    # tile with integer-degree bounds; points exactly on every edge/corner
    tile = ("7", RectRegion.from_degrees(-75.0, -70.0, 10.0, 18.0))
    lats = np.array([-75.0, -70.0, -72.5, -75.0, -70.0, -74.999999, -75.000001])
    lngs = np.array([10.0, 18.0, 14.0, 18.0, 10.0, 10.0, 10.0])
    want_in = np.array([True, True, True, True, True, True, False])
    t = pa.table({"event_id": pa.array(np.arange(len(lats), dtype=np.int64)),
                  "lat": pa.array(lats), "lng": pa.array(lngs)})
    pts = rd.from_arrow(t).map_batches(
        lambda b: assign_cells(b, levels=()), batch_format="pyarrow")

    idx = CoveringIndex.build([tile], max_cells=64, max_level=14)
    ref = ray_session.put(idx)
    bc = pts.map_batches(make_spatial_join_fn(ref, ["event_id"]),
                         batch_format="pyarrow").to_pandas()
    hj = spatial_join_hash_plan(pts, [tile], join_level=8,
                                keep_cols=("event_id",)).to_pandas()
    want = set(np.nonzero(want_in)[0].tolist())
    assert set(bc["event_id"]) == want, "broadcast plan boundary semantics"
    assert set(hj["event_id"]) == want, "hash plan boundary semantics"


def test_join_plans_agree_on_dateline_wrap(ray_session):
    """A ±180°-wrapping rect must behave identically in both plans."""
    import ray.data as rd

    from s2geometry_ray.kernels.regions import RectRegion
    from s2geometry_ray.stages.cell_assign import assign_cells
    from s2geometry_ray.stages.spatial_join import (
        CoveringIndex,
        make_spatial_join_fn,
        spatial_join_hash_plan,
    )

    tile = ("3", RectRegion.from_degrees(-10.0, 10.0, 170.0, -165.0))
    rng2 = np.random.default_rng(77)
    lats = rng2.uniform(-15.0, 15.0, 3000)
    lngs = np.concatenate([rng2.uniform(160.0, 180.0, 1500),
                           rng2.uniform(-180.0, -155.0, 1500)])
    t = pa.table({"event_id": pa.array(np.arange(3000, dtype=np.int64)),
                  "lat": pa.array(lats), "lng": pa.array(lngs)})
    pts = rd.from_arrow(t).map_batches(
        lambda b: assign_cells(b, levels=()), batch_format="pyarrow").materialize()

    idx = CoveringIndex.build([tile], max_cells=64, max_level=14)
    ref = ray_session.put(idx)
    bc = pts.map_batches(make_spatial_join_fn(ref, ["event_id"]),
                         batch_format="pyarrow").to_pandas()
    hj = spatial_join_hash_plan(pts, [tile], join_level=8,
                                keep_cols=("event_id",)).to_pandas()
    want = set(np.nonzero(
        (lats >= -10.0) & (lats <= 10.0) & ((lngs >= 170.0) | (lngs <= -165.0))
    )[0].tolist())
    assert set(bc["event_id"]) == want
    assert set(hj["event_id"]) == want
    assert len(want) > 100  # the fixture actually exercises the wrap


def test_source_format_roundtrips(tmp_path, ray_session):
    """O2 source coverage: the events slice survives parquet→csv/json
    round trips through Ray's readers/writers."""
    import ray.data as rd

    src = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                          columns=["event_id", "event_type", "value"]).limit(500)
    want = src.to_pandas().sort_values("event_id").reset_index(drop=True)
    csv_dir = str(tmp_path / "csv")
    json_dir = str(tmp_path / "json")
    src.write_csv(csv_dir)
    src.write_json(json_dir)
    got_csv = rd.read_csv(csv_dir).to_pandas().sort_values("event_id").reset_index(drop=True)
    got_json = rd.read_json(json_dir).to_pandas().sort_values("event_id").reset_index(drop=True)
    for got in (got_csv, got_json):
        assert got["event_id"].tolist() == want["event_id"].tolist()
        assert got["event_type"].tolist() == want["event_type"].tolist()
        assert np.allclose(got["value"].to_numpy(), want["value"].to_numpy())


def test_shuffle_order_insensitivity(ray_session):
    """O13/O14: random_shuffle and shuffled repartition must not change
    any order-insensitive aggregate the engine produces."""
    import ray.data as rd

    from s2geometry_ray.stages.tile_assign import grouped_stats

    t = pa.table({"k": pa.array(np.arange(5000, dtype=np.int64) % 17),
                  "v": pa.array(np.arange(5000, dtype=np.float64))})
    base = rd.from_arrow(t)
    a = grouped_stats(base, "k", "v").to_pandas().sort_values("k").reset_index(drop=True)
    b = grouped_stats(base.random_shuffle(seed=3), "k", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    c = grouped_stats(base.repartition(7, shuffle=True), "k", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    for other in (b, c):
        assert a["n"].tolist() == other["n"].tolist()
        assert np.allclose(a["s"].to_numpy(), other["s"].to_numpy())
        assert a["mn"].tolist() == other["mn"].tolist()
        assert a["mx"].tolist() == other["mx"].tolist()


def test_streaming_consumption_iter_batches(ray_session):
    """Streaming driver-side consumption (iter_batches) matches the
    materialized result — the pattern large outputs are drained with."""
    import ray.data as rd

    from s2geometry_ray.stages.cell_assign import make_geotag_and_assign

    ds = rd.from_arrow(pa.table({"pt_key": pa.array(np.arange(8000, dtype=np.int64))}))
    pts = ds.map_batches(make_geotag_and_assign("pt_key", levels=(6,)),
                         batch_format="pyarrow")
    total = 0
    cells = set()
    for b in pts.iter_batches(batch_size=1024, batch_format="pyarrow"):
        total += len(b)
        cells.update(b["cell_l6"].to_numpy(zero_copy_only=False).tolist())
    assert total == 8000
    assert len(cells) > 100


def test_knn_fallback_path_exact(points_ds):
    """Force the completeness guard to fail (level too deep, no rings)
    so the brute fallback runs — results must still be exact."""
    from s2geometry_ray.stages.knn import knn

    qk = np.array([11, 222, 3333], dtype=np.int64)
    qlat, qlng = derive_lat(qk), derive_lng(qk)
    res = knn(points_ds, qk, qlat, qlng, 8, "pt_key",
              leaf_col="cell_id", level=12, rings=0).to_pandas()
    k = np.arange(20000)
    pxyz = vk.latlng_to_xyz(derive_lat(k), derive_lng(k))
    qxyz = vk.latlng_to_xyz(qlat, qlng)
    for qi, qid in enumerate(qk):
        d2 = ((pxyz - qxyz[qi]) ** 2).sum(axis=1)
        want = set(k[np.lexsort((k, d2))[:8]].tolist())
        got = set(res[res["query_id"] == qid]["pt_key"].tolist())
        assert got == want, qid


def test_spatial_join_actor_pool_variant(points_ds, ray_session):
    """The actor-pool join stage must produce the same rows as the
    stateless broadcast stage."""
    from s2geometry_ray.stages.spatial_join import (
        CoveringIndex,
        SpatialJoinActor,
        make_spatial_join_fn,
        tiles_from_keys,
    )

    tiles = tiles_from_keys(np.arange(10))
    index = CoveringIndex.build(tiles, max_cells=32, max_level=12)
    ref = ray_session.put(index)
    stateless = points_ds.map_batches(
        make_spatial_join_fn(ref, ["pt_key"]), batch_format="pyarrow").to_pandas()
    pooled = points_ds.map_batches(
        SpatialJoinActor, fn_constructor_args=(ref, ["pt_key"]),
        batch_format="pyarrow", concurrency=2).to_pandas()
    a = {(int(r.pt_key), r.tile_id) for r in stateless.itertuples()}
    b = {(int(r.pt_key), r.tile_id) for r in pooled.itertuples()}
    assert a == b and len(a) > 0


def test_covering_deterministic():
    from s2geometry_ray.kernels.regions import CapRegion
    from s2geometry_ray.kernels.covering import get_covering

    r = CapRegion.from_latlng_radius(1.5, 2.5, 0.04)
    assert get_covering(r, max_cells=24, max_level=14) == \
        get_covering(r, max_cells=24, max_level=14)


def test_query_index_distributed_build_matches(ray_session, monkeypatch):
    """QueryIndex built via the Ray-task fan-out must be identical to
    the driver-loop build (forced by lowering the distribute threshold
    below the fixture's query count)."""
    from s2geometry_ray.stages import knn as K

    rng = np.random.default_rng(3)
    qlat = rng.uniform(-85, 85, 300)
    qlng = rng.uniform(-180, 180, 300)
    ids = np.arange(300, dtype=np.int64)
    a = K.QueryIndex(ids, qlat, qlng, level=5, rings=2)
    monkeypatch.setattr(K, "_DISTRIBUTE_Q", 10)
    b = K.QueryIndex(ids, qlat, qlng, level=5, rings=2)
    assert (a.bounds_chord2 == b.bounds_chord2).all()
    assert (a.range_min == b.range_min).all()
    assert (a.range_max == b.range_max).all()
    assert (a.csr_cells == b.csr_cells).all()
    assert (a.csr_off == b.csr_off).all()
    # csr_q order within a cell may differ between builds only if sort
    # stability differs — both use stable argsort on identical arrays
    assert (a.csr_q == b.csr_q).all()


def test_dataset_count_hint(ray_session):
    """Metadata-cheap count on bare reads; None once transforms exist
    (counting would execute the plan).  Pins the private-API probe in
    scale.py against Ray version drift."""
    import ray.data as rd

    from s2geometry_ray.scale import dataset_count_hint, derive_num_parts

    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet")
    n = dataset_count_hint(ds)
    assert n == ds.count() and n > 0
    transformed = ds.map_batches(lambda t: t, batch_format="pyarrow")
    assert dataset_count_hint(transformed) is None
    # derive_num_parts contract
    assert derive_num_parts(None) == 32
    assert derive_num_parts(10) == 8
    assert derive_num_parts(10_000_000, rows_per_part=100_000) == 100
    assert derive_num_parts(10**12, rows_per_part=100_000) == 1024


def test_knn_pruned_query_with_empty_neighborhood(ray_session):
    """Round-3 review finding: a query whose candidate cells contain no
    points emits no partial rows — it must still fall back to brute and
    return its true k nearest, not vanish from the output."""
    import ray.data as rd

    from s2geometry_ray.stages.knn import knn

    rng = np.random.default_rng(2)
    lat = 10.0 + rng.uniform(-0.5, 0.5, 2000)
    lng = 10.0 + rng.uniform(-0.5, 0.5, 2000)
    cid = vk.from_latlng(lat, lng)
    ds = rd.from_arrow(pa.table({
        "pt_key": pa.array(np.arange(2000, dtype=np.int64)),
        "lat": pa.array(lat), "lng": pa.array(lng),
        "cell_id": pa.array(cid, type=pa.uint64()),
    }))
    qlat = np.array([10.0, 50.0])   # query 1 is ~40 degrees from all points
    qlng = np.array([10.0, 50.0])
    qids = np.array([0, 1], dtype=np.int64)
    res = knn(ds, qids, qlat, qlng, 3, "pt_key", leaf_col="cell_id",
              level=8, keep_dist=True).to_pandas()
    assert set(res["query_id"]) == {0, 1}
    # exactness for the far query via brute oracle
    pxyz = vk.latlng_to_xyz(lat, lng)
    q1 = vk.latlng_to_xyz(qlat[1:], qlng[1:])[0]
    d2 = ((pxyz - q1) ** 2).sum(axis=1)
    want = set(np.lexsort((np.arange(2000), d2))[:3].tolist())
    got = set(res[res["query_id"] == 1]["pt_key"].tolist())
    assert got == want


def test_knn_pruned_all_queries_empty_neighborhood(ray_session):
    """ADVICE r4: when EVERY query's candidate cells hold zero points the
    merged pruned result is empty (possibly schema-less) — the plan must
    short-circuit to the brute fallback for all queries and stay exact."""
    import ray.data as rd

    from s2geometry_ray.stages.knn import knn

    rng = np.random.default_rng(3)
    lat = 10.0 + rng.uniform(-0.5, 0.5, 1000)
    lng = 10.0 + rng.uniform(-0.5, 0.5, 1000)
    cid = vk.from_latlng(lat, lng)
    ds = rd.from_arrow(pa.table({
        "pt_key": pa.array(np.arange(1000, dtype=np.int64)),
        "lat": pa.array(lat), "lng": pa.array(lng),
        "cell_id": pa.array(cid, type=pa.uint64()),
    }))
    # both queries ~40+ degrees from every point: zero candidates each
    qlat = np.array([50.0, -60.0])
    qlng = np.array([50.0, -120.0])
    qids = np.array([7, 8], dtype=np.int64)
    res = knn(ds, qids, qlat, qlng, 4, "pt_key", leaf_col="cell_id",
              level=8, rings=1).to_pandas()
    assert set(res["query_id"]) == {7, 8}
    pxyz = vk.latlng_to_xyz(lat, lng)
    qxyz = vk.latlng_to_xyz(qlat, qlng)
    for qi, qid in enumerate(qids):
        d2 = ((pxyz - qxyz[qi]) ** 2).sum(axis=1)
        want = set(np.lexsort((np.arange(1000), d2))[:4].tolist())
        got = set(res[res["query_id"] == qid]["pt_key"].tolist())
        assert got == want, qid


def test_topk_bound_fn_unknown_id_raises():
    """ADVICE r4: make_bound_fn must fail loudly on ids outside its
    table instead of returning a silently-wrong bound."""
    import pytest

    from s2geometry_ray.stages.topk import make_bound_fn

    fn = make_bound_fn(np.array([3, 1, 2]), np.array([0.3, 0.1, 0.2]))
    assert np.allclose(fn(np.array([1, 3, 2])), [0.1, 0.3, 0.2])
    with pytest.raises(KeyError):
        fn(np.array([1, 99]))       # past-the-end id
    with pytest.raises(KeyError):
        fn(np.array([0]))           # interior miss


def test_fingerprint_null_text_raises():
    import pytest

    from s2geometry_ray.functions.text import fingerprint_batch

    t = pa.table({"doc_id": [1, 2], "text": ["abc", None]})
    with pytest.raises(ValueError, match="null"):
        fingerprint_batch(t)


def test_brute_cosine_actor_empty_batch():
    """Round-3 review finding: the IVF prune stage empties whole blocks;
    the brute actor must emit an empty partial, not IndexError."""
    import ray

    from s2geometry_ray.functions.ann import BruteCosineActor

    q = np.eye(2, 8)
    actor = BruteCosineActor(q, k=5, key_col="vec_id", emb_col="embedding")
    empty = pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float64())),
    })
    out = actor(empty)
    assert out.num_rows == 0
    assert out.column_names == ["query_idx", "vec_id", "sim"]
    del ray


def test_neardup_truncation_unsigned_keys_raise(ray_session):
    """-1 wraps to a legal uint64 key; truncation with unsigned keys
    must fail loudly instead of emitting an invisible counter row."""
    import pytest
    import ray.data as rd

    from s2geometry_ray.functions.ann import cosine_neardup_pairs

    rng = np.random.default_rng(7)
    v = rng.normal(size=16)
    emb = np.tile(v, (30, 1)) + 0.001 * rng.normal(size=(30, 16))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(30, dtype=np.uint64)),
        "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float64())),
    }))
    with pytest.raises(Exception, match="non-signed-integer"):
        cosine_neardup_pairs(ds, tau=0.9, n_centroids=2,
                             max_pairs_per_bucket=50,
                             concurrency=2).to_pandas()


def test_epoch_shuffle_deterministic_permutation(ray_session):
    """Deterministic epoch shuffle: same seed → identical order across
    runs; different seeds → different permutations of the same rows."""
    import ray.data as rd

    from s2geometry_ray.functions.shuffle import epoch_shuffle

    t = pa.table({"doc_id": pa.array(np.arange(500, dtype=np.int64)),
                  "text": pa.array([f"d{i}" for i in range(500)])})
    a1 = epoch_shuffle(rd.from_arrow(t), seed=1).to_pandas()
    a2 = epoch_shuffle(rd.from_arrow(t), seed=1).to_pandas()
    b = epoch_shuffle(rd.from_arrow(t), seed=2).to_pandas()
    assert a1["doc_id"].tolist() == a2["doc_id"].tolist()
    assert a1["doc_id"].tolist() != b["doc_id"].tolist()
    assert sorted(b["doc_id"]) == list(range(500))
    # keys look uniform: sorted output interleaves ids thoroughly
    pos = np.empty(500, dtype=np.int64)
    pos[a1["doc_id"].to_numpy()] = np.arange(500)
    assert abs(np.corrcoef(np.arange(500), pos)[0, 1]) < 0.2


def test_stratified_sample_deterministic_rates(ray_session):
    """Per-stratum Bernoulli sample: deterministic across runs and
    partitionings, per-stratum keep rates near their targets, rate 1.0
    keeps every row of its stratum, invalid rates raise."""
    import ray.data as rd

    from s2geometry_ray.functions.shuffle import (_rate_threshold,
                                                  stratified_sample)

    n = 4000
    langs = np.array(["en", "de", "zh"])[np.arange(n) % 3]
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "lang": pa.array(langs)})
    rates = {"en": 0.25, "zh": 1.0}
    a = stratified_sample(rd.from_arrow(t), "lang", rates, 0.5,
                          seed=3).to_pandas()
    b = stratified_sample(rd.from_arrow(t).repartition(7), "lang", rates,
                          0.5, seed=3).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    got = a.groupby("lang")["doc_id"].count()
    per = n // 3
    assert got["zh"] == per + (1 if n % 3 > 2 else 0) or got["zh"] == per
    assert abs(got["en"] / per - 0.25) < 0.08
    assert abs(got["de"] / per - 0.5) < 0.08
    # all zh kept exactly
    assert got["zh"] == int((langs == "zh").sum())
    with pytest.raises(ValueError):
        _rate_threshold(0.0)
    with pytest.raises(ValueError):
        _rate_threshold(1.5)
    # sub-2⁻⁶⁴ rates clamp to threshold 0 (keep iff hash == 0), never
    # wrap to -1 / keep-all
    assert _rate_threshold(2.0 ** -70) == 0
    assert _rate_threshold(1.0) == (1 << 64) - 1


def test_image_thumb_stage_matches_driver(ray_session):
    """Actor-pool still-image resize == driver-side decode+resize for
    every row, and the thumbnail is the exact box average when the
    dimensions divide evenly."""
    from s2geometry_ray.kernels import codecs
    from s2geometry_ray.kernels.av import resize_area
    from s2geometry_ray.sources.synth import gen_image_row, images_dataset
    from s2geometry_ray.stages.decode import image_thumb_stage, thumb_features

    n = 48
    out = image_thumb_stage(images_dataset(n), thumb=8,
                            concurrency=2).to_pandas()
    out = out.set_index("image_id").sort_index()
    assert len(out) == n
    for i in range(n):
        r = gen_image_row(i, with_bytes=True)
        px = codecs.DECODERS[r["fmt"]](r["bytes"])
        tm, tr, tg, tb = thumb_features(px, 8)
        row = out.loc[r["image_id"]]
        assert (row["thumb_mean"], row["thumb_r"], row["thumb_g"],
                row["thumb_b"]) == (tm, tr, tg, tb)
        if px.shape[0] % 8 == 0 and px.shape[1] % 8 == 0:
            fh, fw = px.shape[0] // 8, px.shape[1] // 8
            want = (px.astype(np.uint32)
                    .reshape(8, fh, 8, fw, 3).sum(axis=(1, 3))
                    // (fh * fw)).astype(np.uint8)
            assert np.array_equal(resize_area(px, 8, 8), want)


def test_augment_pixels_properties():
    """Flip bits are involutions, rot90 swaps dims pre-crop, crop is
    3/4-center; the synthetic corpus exercises every augmentation
    combination (bit coverage)."""
    import numpy as np

    from s2geometry_ray.sources.synth import _hash_u64, gen_image_row
    from s2geometry_ray.stages.decode import augment_pixels

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    # flips are involutions (apply twice via direct slicing)
    assert (augment_pixels(px[:, ::-1], 1)
            == augment_pixels(px, 0)).all()
    assert (augment_pixels(px[::-1], 2) == augment_pixels(px, 0)).all()
    # crop only (h64=0): 3/4 of each side, center
    out = augment_pixels(px, 0)
    assert out.shape == (9, 12, 3)
    assert (out == px[1:10, 2:14]).all()
    # rot90 swaps dims before the crop
    assert augment_pixels(px, 4).shape == (12, 9, 3)
    # sum is crop-independent of flips (same crop window content only
    # when dims symmetric — so just check determinism instead)
    assert (augment_pixels(px, 5) == augment_pixels(px, 5)).all()
    # bit coverage over the synthetic ids
    bits = {_hash_u64(gen_image_row(i, with_bytes=False)["image_id"],
                      "aug") & 7 for i in range(64)}
    assert bits == set(range(8))


def test_augment_stage_matches_driver_recompute(ray_session):
    from s2geometry_ray.functions.gate_oracles import augment_images_sql
    from s2geometry_ray.pipelines.extras import augment_images
    import duckdb

    got = augment_images(None, n=60).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    ref = duckdb.sql(augment_images_sql(60)).df() \
        .sort_values("image_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got[ref.columns], ref)


def test_caption_geo_check_detects_corruption(ray_session):
    """All synthetic captions are consistent by construction; a
    corrupted caption (wrong coords / unparseable) is flagged."""
    import pyarrow as pa

    from s2geometry_ray.pipelines.extras import CaptionGeoCheck, \
        caption_geo_check_images
    from s2geometry_ray.sources.synth import gen_image_row

    out = caption_geo_check_images(None, n=80).to_pandas()
    assert out["consistent"].all()

    rows = [gen_image_row(i, with_bytes=False) for i in range(3)]
    t = pa.table({
        "image_id": pa.array([r["image_id"] for r in rows]),
        "caption": pa.array([
            rows[0]["caption"],                       # intact
            "busy plaza near (11.1111,-22.2222)",     # wrong coords
            "no coordinates here at all",             # unparseable
        ]),
    })
    got = CaptionGeoCheck()(t).to_pandas()
    assert list(got["consistent"]) == [True, False, False]


def test_ivf_prune_recompute_matches_ray_path(ray_session):
    """The ivf_topk SQL oracle pins the PRUNE SET via a single-process
    numpy recompute (ann.ivf_prune_ids); this pins the parity
    assumption directly: the distributed assign+prune path must keep
    exactly the same vec_ids on the real fixture table."""
    import pyarrow.parquet as pq2
    import ray
    import ray.data as rd

    from s2geometry_ray.functions.ann import (IvfAssignActor, _ivf_defaults,
                                              _normalize_rows, ivf_prune_ids,
                                              train_centroids)

    sf = "/root/testdata/sf0.001"
    t = pq2.read_table(f"{sf}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    keys = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    qm = emb[keys < 5][np.argsort(keys[keys < 5])]
    want = ivf_prune_ids(emb, keys, qm)

    ds = rd.read_parquet(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).repartition(5)
    n = len(keys)
    n_centroids, nprobe = _ivf_defaults(n, None, None)
    c = train_centroids(ds, "embedding", n_centroids, n_rows_hint=n)
    q = _normalize_rows(np.asarray(qm, dtype=np.float64))
    probed = np.unique(np.argsort(-(q @ c.T), axis=1)[:, :nprobe])
    assigned = ds.map_batches(
        IvfAssignActor, fn_constructor_args=(ray.put(c), "vec_id", "embedding"),
        batch_format="pyarrow", concurrency=2)
    got = np.sort(np.concatenate([
        b["vec_id"].to_numpy(zero_copy_only=False)[
            np.isin(b["bucket"].to_numpy(zero_copy_only=False), probed)]
        for b in assigned.iter_batches(batch_format="pyarrow")]))
    np.testing.assert_array_equal(got, want)
    assert 0 < len(want) < n  # the prune actually prunes
