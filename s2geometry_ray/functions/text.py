"""Text analysis kernels for the documents table: token counting,
quality scoring, language-ID heuristic, rolling-hash fingerprinting.

All stages are vectorized ``map_batches`` transforms; the regex-holding
stages are callable CLASSES so patterns compile once per actor
(SURVEY.md §7.1).  SQL-expressible outputs (token/char/punct counts,
ratios as int/int divisions) are bit-comparable against DuckDB; the
n-gram language scorer is engine-only (rows-only check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


class TokenStats:
    """Per-doc token/char/punct counts.  DuckDB twin:
    length(regexp_extract_all(text, '\\S+')) etc."""

    def __init__(self):
        import re

        self.token_re = re.compile(r"\S+")
        self.punct_re = re.compile(r"[.,!?;:]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].astype(str)
        batch = batch.copy()
        batch["n_tokens"] = text.str.count(self.token_re).astype("int64")
        batch["n_punct"] = text.str.count(self.punct_re).astype("int64")
        batch["text_len"] = text.str.len().astype("int64")
        return batch


class QualityScore:
    """Heuristic quality features: mean token length, stopword ratio,
    uppercase ratio, digit ratio.  Ratios are int/int double divisions
    (deterministic across engines)."""

    STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it", "that", "for")

    def __init__(self):
        import re

        self.word_re = re.compile(r"[A-Za-z]+")
        # one compiled pattern per stopword: a maximal [A-Za-z]+ run whose
        # lowercase equals the stopword (same semantics as the former
        # per-word Python loop, but counted by vectorized str.count)
        self.stop_res = [
            re.compile(rf"(?<![A-Za-z]){w}(?![A-Za-z])", re.IGNORECASE)
            for w in self.STOPWORDS
        ]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].astype(str)
        n_words = text.str.count(self.word_re).astype("int64")
        n_stop = sum(text.str.count(p) for p in self.stop_res).astype("int64")
        n_alpha = text.str.count(r"[A-Za-z]").astype("int64")
        n_upper = text.str.count(r"[A-Z]").astype("int64")
        n_digit = text.str.count(r"[0-9]").astype("int64")
        n_chars = text.str.len().astype("int64")
        out = batch.copy()
        out["n_words"] = n_words
        out["stop_ratio"] = np.where(n_words > 0, n_stop / n_words.clip(lower=1), 0.0)
        out["upper_ratio"] = np.where(n_chars > 0, n_upper / n_chars.clip(lower=1), 0.0)
        out["digit_ratio"] = np.where(n_chars > 0, n_digit / n_chars.clip(lower=1), 0.0)
        out["alpha_ratio"] = np.where(n_chars > 0, n_alpha / n_chars.clip(lower=1), 0.0)
        return out


# character-trigram profiles for a tiny deterministic language-ID heuristic
_LANG_TRIGRAMS = {
    "en": ("the", "and", "ing", "ion", "ent", "her", "for", "tha", "nth", "int"),
    "de": ("der", "die", "und", "den", "ein", "sch", "ich", "che", "nde", "ter"),
    "fr": ("les", "ent", "des", "que", "ion", "ous", "ait", "eur", "ant", "our"),
    "es": ("que", "ent", "los", "ado", "con", "cio", "sta", "del", "una", "par"),
}


class LangId:
    """n-gram-overlap language scorer (engine-only heuristic).

    Vectorized: per language, the score is the number of its 10 profile
    trigrams PRESENT in the doc (substring containment, counted with
    pandas str.contains — no per-row Python).  Ties keep profile order;
    all-zero → 'unknown' — identical semantics to the former per-row
    set-intersection loop."""

    def __init__(self):
        self.langs = list(_LANG_TRIGRAMS)
        self.trigrams = [list(_LANG_TRIGRAMS[k]) for k in self.langs]

    def _score(self, text: str) -> str:  # kept for unit parity checks
        t = text.lower()
        grams = {t[i : i + 3] for i in range(len(t) - 2)}
        best, best_s = "unknown", 0
        for lang, prof in zip(self.langs, self.trigrams):
            s = len(grams & set(prof))
            if s > best_s:
                best, best_s = lang, s
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].astype(str).str.lower()
        scores = np.stack([
            sum(text.str.contains(tri, regex=False).to_numpy(dtype=np.int64)
                for tri in prof)
            for prof in self.trigrams
        ], axis=1)  # (N, n_langs)
        pred = np.asarray(self.langs, dtype=object)[np.argmax(scores, axis=1)]
        pred[scores.max(axis=1) == 0] = "unknown"
        batch = batch.copy()
        batch["lang_pred"] = pred
        return batch


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit blake2b content fingerprint per doc (one C-speed hash call
    per row) — the exact-dedup key; deterministic across processes."""
    import hashlib

    texts = pc.cast(batch[text_col], pa.string()).to_pylist()
    out = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(t.encode("utf-8", "surrogatepass"),
                                           digest_size=8).digest(), "big")
            for t in texts
        ),
        dtype=np.uint64,
        count=len(texts),
    )
    # int64 bit-view: fp64 is a groupby key and Ray aggregates hash int64
    # natively but mis-handle uint64 (overflow fallback path)
    return batch.append_column("fp64", pa.array(out.view(np.int64), type=pa.int64()))
