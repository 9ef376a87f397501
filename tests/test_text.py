"""Unit parity tests for the vectorized text kernels (the SQL gate
checks doc_quality/token_stats end-to-end; these pin the vectorized
paths against straightforward per-row reference semantics)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from s2geometry_ray.functions.text import LangId, QualityScore

TEXTS = [
    "The quick brown fox and the lazy dog, for it is that time.",
    "",
    "der die und den ein schONE ich che nde ter",
    "les que des ent ion ous...",
    "THE AND OF A TO IN IS IT THAT FOR",
    "no stopwords here xyzzy plugh 12345",
    "Ünïcode tëxt the and der",
    "a" * 500,
    "que que que los ado con cio sta del una par",
]


def test_quality_stopword_count_matches_reference():
    qs = QualityScore()
    out = qs(pa.table({"text": TEXTS})).to_pandas()
    import re

    word_re = re.compile(r"[A-Za-z]+")
    stop = set(qs.STOPWORDS)
    for i, t in enumerate(TEXTS):
        words = word_re.findall(t)
        n_words = len(words)
        n_stop = sum(1 for w in words if w.lower() in stop)
        assert out["n_words"].iloc[i] == n_words, t
        want = n_stop / max(n_words, 1) if n_words else 0.0
        assert np.isclose(out["stop_ratio"].iloc[i], want), (t, n_stop)


def test_langid_vectorized_matches_scalar():
    li = LangId()
    out = li(pa.table({"text": TEXTS})).to_pandas()
    for i, t in enumerate(TEXTS):
        assert out["lang_pred"].iloc[i] == li._score(t), t


def test_langid_unknown_on_no_overlap():
    li = LangId()
    out = li(pa.table({"text": ["zzz qqq", ""]})).to_pandas()
    assert list(out["lang_pred"]) == ["unknown", "unknown"]
