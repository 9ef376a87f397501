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


# GPT-2-style pre-tokenizer classes, simplified to an RE2-compatible
# form so the DuckDB oracle runs the IDENTICAL pattern: contractions,
# space-prefixed letter runs, digit runs, symbol runs, whitespace runs.
# Counting these pieces is the standard cheap proxy for BPE token cost.
# Whitespace is an EXPLICIT ASCII class: Python-\s matches unicode
# whitespace and RE2-\s does not, so \s would silently diverge on
# non-ASCII docs (round-3 review finding).
_WS = " \\t\\n\\r\\f\\v"
BPE_ISH_PATTERN = (rf"'[a-z]+| ?[A-Za-z]+| ?[0-9]+"
                   rf"| ?[^A-Za-z0-9{_WS}]+|[{_WS}]+")
# \S is unicode in Python but ASCII in RE2 — the token pattern uses the
# explicit ASCII class on BOTH engines (same divergence class as _WS)
TOKEN_PATTERN = rf"[^{_WS}]+"


def token_stats_sql(table: str = "documents") -> str:
    """DuckDB twin of TokenStats, with every pattern interpolated from
    the shared constants so the two engines can never drift."""
    bpe = BPE_ISH_PATTERN.replace("'", "''")
    tok = TOKEN_PATTERN.replace("'", "''")
    return rf"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_extract_all(text, '{tok}')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
       CAST(length(text) AS BIGINT) AS text_len,
       CAST(len(regexp_extract_all(text, '{bpe}')) AS BIGINT) AS n_bpe_tokens
FROM {table}
"""


class TokenStats:
    """Per-doc token/char/punct counts + a BPE-ish subword-piece count.
    DuckDB twin: length(regexp_extract_all(text, '\\S+')) etc.; the
    BPE-ish column uses BPE_ISH_PATTERN verbatim on both engines.

    Arrow-native (round-5 verdict #5): ``pc.count_substring_regex`` is
    the SAME RE2 engine DuckDB runs, so engine/twin parity is by
    construction; the former pandas path paid an Arrow→pandas copy of
    the full text column per batch AND trusted Python-re ≡ RE2 on these
    patterns."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.cast(batch["text"], pa.string())
        i64 = lambda a: pc.cast(a, pa.int64())  # noqa: E731
        return (batch
                .append_column("n_tokens", i64(
                    pc.count_substring_regex(text, TOKEN_PATTERN)))
                .append_column("n_punct", i64(
                    pc.count_substring_regex(text, "[.,!?;:]")))
                .append_column("text_len", i64(pc.utf8_length(text)))
                .append_column("n_bpe_tokens", i64(
                    pc.count_substring_regex(text, BPE_ISH_PATTERN))))


class QualityScore:
    """Heuristic quality features: word count, stopword ratio, uppercase
    ratio, digit ratio.  Ratios are int/int double divisions
    (deterministic across engines).

    Arrow-native (round-5 verdict #5).  RE2 has no lookarounds, so the
    stopword count (a maximal [A-Za-z]+ run whose lowercase equals a
    stopword — the former ``(?<![A-Za-z])w(?![A-Za-z])`` Python-re
    semantics) is computed by splitting on ``[^A-Za-z]+`` and set-
    membership over the flattened word stream — same answer, zero
    per-row Python, no pandas copy."""

    STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it", "that", "for")

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.cast(batch["text"], pa.string())
        n = len(batch)
        cnt = lambda p: pc.count_substring_regex(text, p) \
            .to_numpy(zero_copy_only=False).astype(np.int64)  # noqa: E731
        n_words = cnt("[A-Za-z]+")
        n_alpha = cnt("[A-Za-z]")
        n_upper = cnt("[A-Z]")
        n_digit = cnt("[0-9]")
        n_chars = pc.utf8_length(text).to_numpy(
            zero_copy_only=False).astype(np.int64)
        words = pc.split_pattern_regex(text, "[^A-Za-z]+")
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        flat = pc.utf8_lower(pc.list_flatten(words))
        hit = pc.is_in(flat, value_set=pa.array(self.STOPWORDS)) \
            .to_numpy(zero_copy_only=False)
        n_stop = np.bincount(parent[hit], minlength=n).astype(np.int64)
        wc = np.maximum(n_words, 1)
        cc = np.maximum(n_chars, 1)
        return (batch
                .append_column("n_words", pa.array(n_words))
                .append_column("stop_ratio", pa.array(
                    np.where(n_words > 0, n_stop / wc, 0.0)))
                .append_column("upper_ratio", pa.array(
                    np.where(n_chars > 0, n_upper / cc, 0.0)))
                .append_column("digit_ratio", pa.array(
                    np.where(n_chars > 0, n_digit / cc, 0.0)))
                .append_column("alpha_ratio", pa.array(
                    np.where(n_chars > 0, n_alpha / cc, 0.0))))


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

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Arrow-native (round-5 verdict #5): plain substring containment
        # per trigram — no pandas copy of the text column
        text = pc.utf8_lower(pc.cast(batch["text"], pa.string()))
        scores = np.stack([
            sum(pc.match_substring(text, tri).to_numpy(zero_copy_only=False)
                .astype(np.int64) for tri in prof)
            for prof in self.trigrams
        ], axis=1)  # (N, n_langs)
        pred = np.asarray(self.langs, dtype=object)[np.argmax(scores, axis=1)]
        pred[scores.max(axis=1) == 0] = "unknown"
        return batch.append_column(
            "lang_pred", pa.array(pred, type=pa.string()))


def lang_id_sql(table: str = "documents") -> str:
    """DuckDB twin of LangId: per-language trigram-presence sums with
    first-wins ties in profile order and all-zero → 'unknown' —
    generated from the SAME _LANG_TRIGRAMS profiles the engine uses, so
    the two can never drift."""
    langs = list(_LANG_TRIGRAMS)
    scores = ", ".join(
        "(" + " + ".join(
            f"CASE WHEN contains(lower(text), '{tri}') THEN 1 ELSE 0 END"
            for tri in _LANG_TRIGRAMS[lang]) + f") AS s_{lang}"
        for lang in langs)
    best = ", ".join(f"s_{lang}" for lang in langs)
    branches = " ".join(
        f"WHEN s_{lang} = GREATEST({best}) THEN '{lang}'"
        for lang in langs[:-1])
    return f"""
WITH scored AS (SELECT doc_id, {scores} FROM {table})
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE WHEN GREATEST({best}) = 0 THEN 'unknown'
            {branches}
            ELSE '{langs[-1]}' END AS lang_pred
FROM scored
"""


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _utf8_buffer_view(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (data_bytes, offsets) view of an Arrow string array.
    ``offsets`` values index into ``data_bytes`` directly."""
    if pa.types.is_large_string(col.type):
        odt = np.int64
    else:
        odt = np.int32
    bufs = col.buffers()
    off = np.frombuffer(bufs[1], dtype=odt)[col.offset : col.offset + len(col) + 1]
    off = off.astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    if len(off) == 0:
        return data[:0], np.zeros(1, dtype=np.int64)
    # restrict to this array's window (sliced arrays share the buffer)
    return data[off[0] : off[-1]], off - off[0]


# word-mix runs in L2-resident blocks: the mix + cumsum intermediates
# stay in cache (same measured rationale as dedup._bulk_shingle_hashes)
_FP_CHUNK = 1 << 16


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit content fingerprint per doc — the exact-dedup key.

    Fully vectorized over the Arrow utf8 buffer (round-2 verdict item 5:
    the previous per-row blake2b + ``to_pylist`` was the one remaining
    per-row hot path in a SQL-checked pipeline), at WORD granularity:

    1. one monotone scatter re-packs the buffer so every doc starts on
       an 8-byte boundary (tail zero-padded) — alignment-independent;
    2. the packed buffer is viewed as uint64 words; each word is
       splitmix-mixed with its in-document word index (order-sensitive),
       8 bytes per mix instead of 1;
    3. a wrapping uint64 cumulative sum turns per-doc word ranges into
       exact segment sums; a final mix folds in the byte length (so
       zero-padding cannot alias onto shorter docs).

    Deterministic across processes; collisions are birthday-at-2⁻⁶⁴
    between random 64-bit values — the same contract the 8-byte blake2b
    digest gave."""
    col = pc.cast(batch[text_col], pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        # a null slot's offsets span zero bytes — it would silently hash
        # like '' and exact-dedup would swallow every null doc into one
        # group.  The previous per-row path raised on None; keep failing
        # loudly (round-3 review finding).
        raise ValueError(
            f"fingerprint_batch: {col.null_count} null value(s) in "
            f"'{text_col}' — drop or fill nulls before exact dedup")
    data, off = _utf8_buffer_view(col)
    n = len(col)
    lens = np.diff(off)
    wlens = (lens + 7) >> 3
    woff = np.concatenate([[0], np.cumsum(wlens)])
    total_w = int(woff[-1])
    buf = np.zeros(total_w * 8, dtype=np.uint8)
    # dst is strictly increasing (per-doc shift = accumulated padding):
    # one cache-friendly scatter aligns every doc
    if data.size:
        # int32 indices: the scatter's index traffic dominates the whole
        # kernel at byte granularity.  The large_string path supports
        # buffers past 2 GiB, where int32 would wrap SILENTLY into wrong
        # (possibly colliding) dedup keys — fail loudly and widen instead
        # (ADVICE r3).
        idx_dtype = np.int32 if total_w * 8 < 2**31 else np.int64
        dst = (np.repeat((woff[:-1] * 8 - off[:-1]).astype(idx_dtype), lens)
               + np.arange(data.size, dtype=idx_dtype))
        buf[dst] = data
    words = buf.view(np.uint64)
    csum = np.empty(total_w + 1, dtype=np.uint64)
    csum[0] = 0
    wstart = np.repeat(woff[:-1], wlens)  # doc's first word, per word
    for s in range(0, total_w, _FP_CHUNK):
        e = min(s + _FP_CHUNK, total_w)
        local = np.arange(s + 1, e + 1, dtype=np.uint64) - wstart[s:e].astype(np.uint64)
        mixed = _splitmix64(words[s:e] + local * np.uint64(0x9E3779B97F4A7C15))
        np.cumsum(mixed, out=csum[s + 1 : e + 1])
        csum[s + 1 : e + 1] += csum[s]
    seg = csum[woff[1:]] - csum[woff[:-1]]
    out = _splitmix64(seg + lens.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9))
    if len(out) != n:  # all-empty column edge (buffer view yields 0 docs)
        out = np.zeros(n, dtype=np.uint64)
    # int64 bit-view: fp64 is a groupby key and Ray aggregates hash int64
    # natively but mis-handle uint64 (overflow fallback path)
    return batch.append_column("fp64", pa.array(out.view(np.int64), type=pa.int64()))


# --- O41: text normalization (curation pre-pass) ----------------------

_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
_WS_CHARS = " \t\n\r\f\v"


class NormalizeText:
    """Canonical text normalization: ASCII-only lowercasing (an
    explicit A–Z→a–z translate on BOTH engines — unicode lower() rules
    differ between Python and DuckDB's ICU on Turkish İ / German ß, so
    the unicode kernel would silently diverge), whitespace-run collapse
    to a single space, and edge trim.  Adds ``norm_text``; stateless
    vectorized batch transform, no shuffle.

    Arrow-native (round-5 verdict #5): the ASCII translate is a single
    numpy pass over the utf8 BYTE buffer (bytes 0x41–0x5A += 0x20 —
    safe in UTF-8, multibyte continuation/lead bytes all have the high
    bit set), then RE2 whitespace collapse + trim via pyarrow.compute —
    no pandas copy of the corpus on O49's hottest full-table pass."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = pc.cast(batch["text"], pa.string())
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        data, off = _utf8_buffer_view(col)
        lowered_bytes = data.copy()
        up = (lowered_bytes >= 0x41) & (lowered_bytes <= 0x5A)
        lowered_bytes[up] += 0x20
        if off[-1] >= 2**31:  # pragma: no cover - int32 offset ceiling
            raise ValueError("NormalizeText: batch text exceeds 2 GiB — "
                             "lower the batch size")
        lowered = pa.StringArray.from_buffers(
            len(col),
            pa.py_buffer(off.astype(np.int32).tobytes()),
            pa.py_buffer(lowered_bytes.tobytes()))
        norm = pc.utf8_trim(
            pc.replace_substring_regex(lowered, f"[{_WS_CHARS}]+", " "), " ")
        return batch.append_column("norm_text", norm)


def normalize_text_sql(table: str = "documents") -> str:
    """DuckDB twin of NormalizeText (translate + regexp_replace + trim,
    all from the shared constants)."""
    ws = "[ \\t\\n\\r\\f\\v]+"
    return rf"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       trim(regexp_replace(
              translate(text, '{_ASCII_UPPER}', '{_ASCII_LOWER}'),
              '{ws}', ' ', 'g'), ' ') AS norm_text
FROM {table}
"""
