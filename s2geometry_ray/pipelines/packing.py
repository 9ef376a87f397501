"""Training-sequence assembly over the documents table: concat-and-chop
sequence PACKING (GPT-style pretraining batches) and overlapping-window
CHUNKING (RAG-style retrieval units).

Both operators reason in TOKEN OFFSETS (the shared ``TOKEN_PATTERN``
whitespace tokenizer, so the DuckDB twins count the identical pieces)
and never ship document text through a shuffle — packing shuffles an
int-only (doc_id, n_tokens, pid) table, chunking is a stateless
per-batch explode.

Packing is the interesting one at scale: the pack id of a document
depends on the total token count of every document before it — a global
prefix sum.  The distributed form here is the classic two-phase scan:

  1. key-range partition by doc_id (pid = doc_id // span) — packing
     needs CONTIGUOUS ranges co-located, so a hash partition is the
     wrong tool; the assumption (documented per SURVEY §3.6) is
     roughly-uniform doc_id density, true for sequential ingest ids;
  2. per-partition token totals via map-side partials (each batch emits
     ≤ #pids rows; the materialized partial table is tiny) → driver
     exclusive prefix over ≤1024 pids;
  3. one int-only hash shuffle co-locates each pid, where a vectorized
     local cumsum + the broadcast base offset places every document,
     and boundary-straddling docs explode into per-pack pieces with
     ``np.repeat`` / ``arange`` (no Python row loop).

At 100 TB the only all-to-all moves ~24 B/doc and the driver holds one
row per partition — the text column never leaves the (pruned-away)
source files.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from s2geometry_ray.functions.text import TOKEN_PATTERN

_PACK_BUDGET = 512    # tokens per packed training sequence
_CHUNK_SIZE = 64      # tokens per retrieval chunk
_CHUNK_OVERLAP = 16


class _TokenCount:
    """(doc_id, text) → (doc_id, n_tokens): the regex compiles once per
    actor; counting is the vectorized pandas str.count kernel."""

    def __init__(self):
        import re

        self.token_re = re.compile(TOKEN_PATTERN)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if batch["text"].isna().any():
            # astype(str) would tokenize a null as the literal "None" —
            # corrupt offsets beat a loud failure never (the
            # fingerprint/RCF null policy)
            raise ValueError("pack/chunk: null text")
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "n_tokens": batch["text"].astype(str)
            .str.count(self.token_re).astype("int64"),
        })


def _token_counts(sf_dir: str):
    """(doc_id, n_tokens) — int-only, ~2 % of the text bytes; the
    tokenizer runs exactly once per document (``pack_counts``
    materializes the result for its two prefix phases)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(_TokenCount, concurrency=(1, 8),
                          batch_format="pandas")


def _base_offsets(counts) -> dict[int, int]:
    """Exclusive prefix of per-pid token totals.  Map-side partials
    (≤ #pids rows per batch) → tiny materialized table → driver scan;
    no groupby shuffle for what is a ≤1024-row reduction."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "pid": t["pid"].to_numpy(zero_copy_only=False),
            "tok": t["n_tokens"].to_numpy(zero_copy_only=False)})
        g = df.groupby("pid", as_index=False)["tok"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = counts.map_batches(partial, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    totals = parts.groupby("pid")["tok"].sum().sort_index()
    return dict(zip(totals.index.astype(int),
                    np.concatenate([[0], np.cumsum(totals.values)[:-1]])
                    .astype(int)))


def _explode_pieces(did: np.ndarray, nt: np.ndarray, s: np.ndarray,
                    budget: int) -> pd.DataFrame:
    """(doc ids, token counts, global start offsets) → one row per
    (document × pack) piece, fully vectorized (repeat/arange)."""
    nz = nt > 0
    did, nt, s = did[nz], nt[nz], s[nz]
    p0, p1 = s // budget, (s + nt - 1) // budget
    reps = (p1 - p0 + 1).astype(np.int64)
    tot = int(reps.sum())
    if tot == 0:
        return pd.DataFrame({c: np.array([], dtype=np.int64)
                             for c in ("doc_id", "pack_id",
                                       "begin_tok", "n_tok")})
    # within-doc piece index j via the repeat/arange explode
    j = np.arange(tot, dtype=np.int64) \
        - np.repeat(np.concatenate([[0], np.cumsum(reps)[:-1]]), reps)
    pack = np.repeat(p0, reps) + j
    lo = np.maximum(np.repeat(s, reps), pack * budget)
    hi = np.minimum(np.repeat(s + nt, reps), (pack + 1) * budget)
    return pd.DataFrame({
        "doc_id": np.repeat(did, reps).astype(np.int64),
        "pack_id": pack,
        "begin_tok": lo - pack * budget,
        "n_tok": hi - lo,
    })


def _block_stats(counts) -> pd.DataFrame:
    """One row per materialized block: (first key, min, max, internal
    sortedness, token total).  Tiny — drives the plan choice below."""

    def st(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        nt = t["n_tokens"].to_numpy(zero_copy_only=False)
        if did.size == 0:
            return pa.table({"first": pa.array([], type=pa.int64()),
                             "mn": pa.array([], type=pa.int64()),
                             "mx": pa.array([], type=pa.int64()),
                             "srt": pa.array([], type=pa.bool_()),
                             "tok": pa.array([], type=pa.int64())})
        return pa.table({
            "first": pa.array([int(did[0])]),
            "mn": pa.array([int(did.min())]),
            "mx": pa.array([int(did.max())]),
            "srt": pa.array([bool(np.all(did[1:] > did[:-1]))]),
            "tok": pa.array([int(nt.sum())]),
        })

    return counts.map_batches(st, batch_format="pyarrow",
                              batch_size=None).to_pandas()


def pack_sequences_docs(sf_dir: str, budget: int = _PACK_BUDGET,
                        span: int | None = None,
                        force_shuffle: bool = False):
    """Concat-and-chop sequence packing: documents are concatenated in
    doc_id order and cut into ``budget``-token packs; a document
    straddling a cut belongs to every pack it touches.  Output is one
    row per (document × pack) piece:

      (doc_id, pack_id, begin_tok = offset of the piece inside its
       pack, n_tok = piece length) — empty documents emit nothing.

    DuckDB twin: window cumsum + generate_series (PACK_SEQUENCES_SQL).
    """
    from s2geometry_ray.scale import derive_num_parts

    if span is None:
        import pyarrow.parquet as pq

        n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
        span = max(1, n_docs
                   // derive_num_parts(n_docs, rows_per_part=100_000))

    return pack_counts(_token_counts(sf_dir), budget, span,
                       force_shuffle=force_shuffle)


def pack_counts(counts, budget: int, span: int,
                force_shuffle: bool = False):
    """The packing core over any (doc_id:int64, n_tokens:int64) counts
    Dataset — ``doc_id`` is the concatenation ORDER key (callers with
    composite keys pack them into one int64).

    Two physical plans, identical output:
    - **sorted-source fast path** (auto-detected from per-block stats):
      when every block is internally sorted and block key ranges are
      pairwise disjoint — the layout any key-ordered, order-preserving
      upstream gives — the global prefix sum needs NO shuffle at all:
      the driver orders the per-block token totals by key range,
      computes the exclusive prefix, and each block looks up its base
      by its first key.
    - **shuffle fallback**: arbitrary layouts (anything downstream of a
      hash shuffle) hash-partition the int-only (doc_id, n_tokens, pid)
      table on key-range pids (width ``span``) and cumsum inside each
      partition."""
    counts = counts.materialize()  # two passes: plan stats + emit

    if not force_shuffle:
        st = _block_stats(counts).sort_values("mn").reset_index(drop=True)
        disjoint = bool((st["mn"].to_numpy()[1:]
                         > st["mx"].to_numpy()[:-1]).all())
        if bool(st["srt"].all()) and disjoint:
            tok = st["tok"].to_numpy()
            bases = dict(zip(
                st["first"].astype(int),
                np.concatenate([[0], np.cumsum(tok)[:-1]]).astype(int)))

            def emit_fast(t: pa.Table) -> pd.DataFrame:
                did = t["doc_id"].to_numpy(zero_copy_only=False)
                nt = t["n_tokens"].to_numpy(zero_copy_only=False)
                if did.size == 0:
                    return _explode_pieces(did.astype(np.int64),
                                           np.array([], dtype=np.int64),
                                           np.array([], dtype=np.int64),
                                           budget)
                s = bases[int(did[0])] \
                    + np.concatenate([[0], np.cumsum(nt)[:-1]])
                return _explode_pieces(did, nt, s, budget)

            return counts.map_batches(emit_fast, batch_format="pyarrow",
                                      batch_size=None)

    def add_pid(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "pid", pa.array((did // span).astype(np.int64)))

    keyed = counts.map_batches(add_pid, batch_format="pyarrow",
                               batch_size=None)
    base = _base_offsets(keyed)  # ≤1024 entries — cheap in the closure

    def emit_pieces(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g["doc_id"].to_numpy(), kind="stable")
        did = g["doc_id"].to_numpy()[order]
        nt = g["n_tokens"].to_numpy()[order]
        s = int(base[int(g["pid"].iat[0])]) \
            + np.concatenate([[0], np.cumsum(nt)[:-1]])
        return _explode_pieces(did, nt, s, budget)

    return keyed.groupby("pid").map_groups(emit_pieces,
                                           batch_format="pandas")


def pack_sequences_sql(budget: int = _PACK_BUDGET,
                       table: str = "documents") -> str:
    """Twin of ``pack_sequences_docs``: the token pattern is
    interpolated from the shared constant; all offsets are non-negative
    so DuckDB's truncating ``//`` equals the engine's floor ``//``."""
    tok = TOKEN_PATTERN.replace("'", "''")
    return rf"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{tok}')) AS BIGINT) AS nt
  FROM {table}),
cum AS (
  SELECT doc_id, nt,
         CAST(COALESCE(sum(nt) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS s
  FROM toks),
pieces AS (
  SELECT doc_id, s, nt,
         unnest(generate_series(s // {budget}, (s + nt - 1) // {budget}))
           AS pack_id
  FROM cum WHERE nt > 0)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(pack_id AS BIGINT) AS pack_id,
       CAST(GREATEST(s, pack_id * {budget}) - pack_id * {budget}
            AS BIGINT) AS begin_tok,
       CAST(LEAST(s + nt, (pack_id + 1) * {budget})
            - GREATEST(s, pack_id * {budget}) AS BIGINT) AS n_tok
FROM pieces
"""


PACK_SEQUENCES_SQL = pack_sequences_sql()


def chunk_docs(sf_dir: str, size: int = _CHUNK_SIZE,
               overlap: int = _CHUNK_OVERLAP):
    """Overlapping-window chunking: each document yields windows of
    ``size`` tokens advancing by ``size - overlap``; the last window is
    clipped to the document end, and every document (even an empty one)
    yields at least one chunk so no doc silently disappears from a
    retrieval index.  Output: (doc_id, chunk_id, begin_tok, end_tok).

    Stateless per-batch explode — no shuffle at any scale."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap

    counts = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]) \
        .map_batches(_TokenCount, concurrency=(1, 8), batch_format="pandas")

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        did = b["doc_id"].to_numpy()
        nt = b["n_tokens"].to_numpy()
        nch = np.where(nt <= size, 1,
                       (nt - size + stride - 1) // stride + 1).astype(np.int64)
        tot = int(nch.sum())
        j = np.arange(tot, dtype=np.int64) \
            - np.repeat(np.concatenate([[0], np.cumsum(nch)[:-1]]), nch)
        begin = j * stride
        end = np.minimum(begin + size, np.repeat(nt, nch))
        return pd.DataFrame({
            "doc_id": np.repeat(did, nch),
            "chunk_id": j,
            "begin_tok": begin,
            "end_tok": end,
        })

    return counts.map_batches(explode, batch_format="pandas",
                              batch_size=None)


def chunk_docs_sql(size: int = _CHUNK_SIZE, overlap: int = _CHUNK_OVERLAP,
                   table: str = "documents") -> str:
    tok = TOKEN_PATTERN.replace("'", "''")
    stride = size - overlap
    return rf"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{tok}')) AS BIGINT) AS nt
  FROM {table}),
n AS (
  SELECT doc_id, nt,
         CASE WHEN nt <= {size} THEN 1
              ELSE (nt - {size} + {stride} - 1) // {stride} + 1
         END AS nch
  FROM toks),
ch AS (
  SELECT doc_id, nt,
         unnest(generate_series(0, nch - 1)) AS chunk_id
  FROM n)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(chunk_id * {stride} AS BIGINT) AS begin_tok,
       CAST(LEAST(chunk_id * {stride} + {size}, nt) AS BIGINT) AS end_tok
FROM ch
"""


CHUNK_DOCS_SQL = chunk_docs_sql()
