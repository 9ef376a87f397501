"""Sequence packing / chunking / semantic dedup (pipelines/packing.py,
analytics O38): partition-count invariance of the distributed prefix
sum, packing invariants vs a scalar reference, chunk windows vs a brute
per-doc loop, and the planted-duplicate clustering contract."""
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.fixture(scope="module")
def doc_tokens():
    import re

    import pyarrow.parquet as pq

    from s2geometry_ray.functions.text import TOKEN_PATTERN

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    df = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    rx = re.compile(TOKEN_PATTERN)
    df["nt"] = [len(rx.findall(s)) for s in df["text"].astype(str)]
    return df


def test_pack_span_invariance(ray_session):
    """The piece table must be IDENTICAL whatever the key-range width —
    span=7 forces ~72 partitions through the two-phase prefix sum,
    span=10_000 collapses to one; both must equal the metadata-derived
    default."""
    from s2geometry_ray.pipelines.packing import pack_sequences_docs

    a = _sorted(pack_sequences_docs(SF, budget=64, span=7,
                                    force_shuffle=True).to_pandas())
    b = _sorted(pack_sequences_docs(SF, budget=64, span=10_000,
                                    force_shuffle=True).to_pandas())
    c = _sorted(pack_sequences_docs(SF, budget=64).to_pandas())
    pd.testing.assert_frame_equal(a, b)
    # the zero-shuffle sorted-source fast path must equal the shuffle plan
    pd.testing.assert_frame_equal(a, c)


def test_pack_invariants_vs_scalar_reference(ray_session, doc_tokens):
    """Concat-and-chop reference computed with a plain Python loop over
    the doc_id-ordered token counts must reproduce the distributed
    result exactly; plus structural invariants (pack fill, piece
    bounds)."""
    from s2geometry_ray.pipelines.packing import pack_sequences_docs

    budget = 128
    got = _sorted(pack_sequences_docs(SF, budget=budget, span=13,
                                      force_shuffle=True).to_pandas())

    rows, off = [], 0
    for did, nt in zip(doc_tokens["doc_id"], doc_tokens["nt"]):
        if nt == 0:
            continue
        for p in range(off // budget, (off + nt - 1) // budget + 1):
            lo = max(off, p * budget)
            hi = min(off + nt, (p + 1) * budget)
            rows.append((did, p, lo - p * budget, hi - lo))
        off += nt
    ref = _sorted(pd.DataFrame(
        rows, columns=["doc_id", "pack_id", "begin_tok", "n_tok"]))
    pd.testing.assert_frame_equal(
        got.astype("int64"), ref.astype("int64"))

    # structural: every pack but the last is exactly full; pieces stay
    # inside their pack
    fill = got.groupby("pack_id")["n_tok"].sum()
    assert (fill.iloc[:-1] == budget).all() and 0 < fill.iloc[-1] <= budget
    assert ((got["begin_tok"] >= 0)
            & (got["begin_tok"] + got["n_tok"] <= budget)).all()
    assert (got["n_tok"] > 0).all()
    # per-doc pieces reassemble the doc
    per_doc = got.groupby("doc_id")["n_tok"].sum()
    nz = doc_tokens[doc_tokens["nt"] > 0].set_index("doc_id")["nt"]
    assert per_doc.sort_index().equals(nz.sort_index().astype("int64"))


def test_chunk_docs_vs_brute(ray_session, doc_tokens):
    from s2geometry_ray.pipelines.packing import chunk_docs

    size, overlap = 48, 12
    got = _sorted(chunk_docs(SF, size=size, overlap=overlap).to_pandas())

    stride = size - overlap
    rows = []
    for did, nt in zip(doc_tokens["doc_id"], doc_tokens["nt"]):
        n = 1 if nt <= size else -(-(nt - size) // stride) + 1
        for j in range(n):
            rows.append((did, j, j * stride, min(j * stride + size, nt)))
    ref = _sorted(pd.DataFrame(
        rows, columns=["doc_id", "chunk_id", "begin_tok", "end_tok"]))
    pd.testing.assert_frame_equal(got.astype("int64"), ref.astype("int64"))
    # every doc appears (even empty ones yield one [0,0) chunk)
    assert set(got["doc_id"]) == set(doc_tokens["doc_id"])


def test_chunk_docs_rejects_bad_overlap(ray_session):
    from s2geometry_ray.pipelines.packing import chunk_docs

    with pytest.raises(ValueError):
        chunk_docs(SF, size=16, overlap=16)


def test_semantic_dedup_planted_contract(ray_session):
    """Every planted duplicate (vec_id ≥ 1e6) must cluster to its
    source vector; every natural vector is its own representative."""
    from s2geometry_ray.pipelines.analytics import semantic_dedup_embeddings

    out = semantic_dedup_embeddings(SF).to_pandas()
    planted = out[out["vec_id"] >= 1_000_000]
    natural = out[out["vec_id"] < 1_000_000]
    assert len(planted) > 0
    assert (planted["rep"] == planted["vec_id"] - 1_000_000).all()
    assert (natural["rep"] == natural["vec_id"]).all()
    # survivors = natural rows only
    assert (out["rep"] == out["vec_id"]).sum() == len(natural)


def test_pack_unsorted_source_falls_back_and_matches(ray_session, tmp_path):
    """A shuffled (non-doc_id-sorted) source must NOT take the
    zero-shuffle fast path — the auto-detection falls back to the
    hash-partitioned plan and the result equals the sorted source's
    (packing is defined by doc_id order, not physical order)."""
    import pyarrow.parquet as pq

    import pyarrow as pa

    from s2geometry_ray.pipelines.packing import pack_sequences_docs

    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    rng = np.random.default_rng(5)
    perm = rng.permutation(src.num_rows)
    shuffled = src.take(pa.array(perm))
    d = tmp_path / "unsorted"
    d.mkdir()
    # two row groups so multiple blocks exist, each internally unsorted
    pq.write_table(shuffled, str(d / "documents.parquet"),
                   row_group_size=src.num_rows // 3)

    a = _sorted(pack_sequences_docs(str(d), budget=96, span=11)
                .to_pandas())
    b = _sorted(pack_sequences_docs(SF, budget=96).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_pack_rejects_null_text(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s2geometry_ray.pipelines.packing import chunk_docs

    d = tmp_path / "nulls"
    d.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                             "text": pa.array(["ok", None])}),
                   str(d / "documents.parquet"))
    with pytest.raises(Exception, match="null text"):
        chunk_docs(str(d)).to_pandas()


def test_training_prep_composition_invariants(ray_session):
    """End-to-end invariants of the composed pipeline: every packed doc
    survived decontamination + capping, replica multiplicity matches
    the mixture weights, zh docs appear exactly twice, packs are full,
    and per-(doc,rep) pieces reassemble the doc's token count."""
    import pyarrow.parquet as pq

    from s2geometry_ray.pipelines.training_prep import (
        _TP_BUDGET, _TP_CAP, prepare_training_docs)

    out = prepare_training_docs(SF).to_pandas()
    meta = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "source"]).to_pandas()
    lang = meta.set_index("doc_id")["lang"]
    src = meta.set_index("doc_id")["source"]

    per = out.groupby("doc_id")["rep"].nunique()
    # zh upsampled exactly 2x (integer weight), en <= 1, others == 1
    assert (per[lang.loc[per.index] == "zh"] == 2).all()
    assert (per[lang.loc[per.index] != "zh"] == 1).all()
    # domain cap respected (count distinct docs per source)
    docs = out["doc_id"].drop_duplicates()
    assert (src.loc[docs].value_counts() <= _TP_CAP).all()
    # packs dense and full except the last
    fill = out.groupby("pack_id")["n_tok"].sum()
    assert (fill.iloc[:-1] == _TP_BUDGET).all()
    assert (out["begin_tok"] + out["n_tok"] <= _TP_BUDGET).all()
