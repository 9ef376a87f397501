"""DuckDB oracle generators for the gate queries whose semantics are
not expressible over the registered parquet views alone (round-3
verdict task #1: convert rows-only gates to value checks).

Three oracle shapes, strongest available per query:

1. **Recomputed twins** (``simhash_docs``, ``simhash_pairs_docs``,
   ``phash_band_buckets``): the SQL re-derives the value from scratch —
   byte-level tokenization + bit-exact splitmix64 SimHash, banding bit
   arithmetic, brute-force hamming pairs — so the distributed banded /
   vectorized engine paths are checked against an independent SQL
   computation (the ``lang_id_sql`` / ``shuffle_sql`` pattern).
2. **Generation-stamp constants + SQL-derived columns**
   (``decode_images``, ``covering_*``, ``dedup_images_phash``,
   ``audio``/``video``): the deterministic synth/covering fixtures are
   evaluated once on the driver at oracle-build time and embedded as a
   ``VALUES`` table; every column SQL *can* derive (range_min/range_max,
   level, token, band values, group aggregates) is recomputed in SQL
   from uint64 bit arithmetic, and validity invariants ride as WHERE
   clauses (an invalid row drops out → visible row-count mismatch).
   The Ray side recomputes the stamped values through the real
   distributed path (actor-pool decode, Ray-parallel covering build),
   so the compare pins distributed == scalar-driver == stamp.
3. **Measured-value pins** (``ivf_recall_embeddings``): the pipeline's
   deterministic measured output is pinned as a constant row — a
   regression gate on the approximation quality itself.

All VALUES literals are ints/strings/bools — bit-exact across engines
by construction.
"""

from __future__ import annotations

import numpy as np

from s2geometry_ray.functions.shuffle import _sql_mulmod, sql_splitmix64

_U64 = 1 << 64
_GOLD = 0x9E3779B97F4A7C15


def _u64_lit(v: int) -> str:
    return f"CAST({int(v) & (_U64 - 1)} AS UBIGINT)"


def _str_lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


# ---------------------------------------------------------------------------
# images: decode / raster boxes / phash dedup + banding
# ---------------------------------------------------------------------------


def decode_images_sql(n: int = 400) -> str:
    """Expected (image_id, fmt, w, h, phash, phash_ok) rows from the
    GENERATION-time stamps: the stored phash is stamped from the
    reference-decoded pixels at synth time, while the Ray side re-decodes
    the bytes in the actor pool and recomputes the hash — a mismatch in
    any codec, the phash kernel, or the actor plumbing flips a row."""
    from s2geometry_ray.sources.synth import gen_image_row

    vals = []
    for i in range(n):
        r = gen_image_row(i, with_bytes=True)
        vals.append(f"({_str_lit(r['image_id'])}, {_str_lit(r['fmt'])}, "
                    f"CAST({int(r['w'])} AS INTEGER), "
                    f"CAST({int(r['h'])} AS INTEGER), "
                    f"CAST({int(r['phash'])} AS BIGINT), TRUE)")
    return ("SELECT image_id, fmt, w, h, phash, phash_ok FROM (VALUES "
            + ", ".join(vals) + ") AS t(image_id, fmt, w, h, phash, phash_ok)")


def raster_boxes_images_sql(n: int = 300, threshold: int = 200) -> str:
    """Expected exploded bright-region boxes, computed by a driver-side
    scalar pass over the same deterministic pixels (decode → gray
    threshold → extent box).  Pins the distributed actor-pool run and
    the vectorized explode against the scalar reference."""
    from s2geometry_ray.kernels import codecs
    from s2geometry_ray.sources.synth import gen_image_row

    vals = []
    for i in range(n):
        r = gen_image_row(i, with_bytes=True)
        px = codecs.decode(r["bytes"], r["fmt"])
        gray = px.astype(np.int32).sum(axis=2) // 3
        ys, xs = np.nonzero(gray >= threshold)
        if ys.size:
            vals.append(f"({_str_lit(r['image_id'])}, "
                        f"{int(ys.min())}, {int(ys.max())}, "
                        f"{int(xs.min())}, {int(xs.max())})")
    return ("SELECT image_id, CAST(y0 AS BIGINT) AS y0, "
            "CAST(y1 AS BIGINT) AS y1, CAST(x0 AS BIGINT) AS x0, "
            "CAST(x1 AS BIGINT) AS x1 FROM (VALUES " + ", ".join(vals)
            + ") AS t(image_id, y0, y1, x0, x1)")


def _phash_values(n: int) -> str:
    """(image_id, phash) VALUES rows for the bytes-free images table
    (phash = the deterministic stamp; int64 bit-view)."""
    from s2geometry_ray.sources.synth import gen_image_row

    vals = []
    for i in range(n):
        r = gen_image_row(i, with_bytes=False)
        vals.append(f"({_str_lit(r['image_id'])}, "
                    f"CAST({int(r['phash'])} AS BIGINT))")
    return "(VALUES " + ", ".join(vals) + ") AS t(image_id, phash)"


def dedup_images_phash_sql(n: int = 800) -> str:
    """O9 exact-dedup twin: SQL re-runs the group-by-phash / min-id /
    count aggregation over the stamped hashes — checks the Ray
    groupby+Min+Count plan value-exactly."""
    return (f"SELECT MIN(image_id) AS image_id, "
            f"CAST(count(*) AS BIGINT) AS n_copies "
            f"FROM {_phash_values(n)} GROUP BY phash")


def phash_band_buckets_sql(n: int = 600) -> str:
    """O10 banding twin: SQL re-derives each 16-bit band with uint64
    arithmetic (int64 bit-view → unsigned wrap → shift/mask spelled as
    exact divide/mod) and re-counts the buckets."""
    wrap = ("CAST(((CAST(phash AS HUGEINT) % 18446744073709551616)"
            " + 18446744073709551616) % 18446744073709551616 AS UBIGINT)")
    return f"""
WITH ph AS (SELECT image_id, {wrap} AS u FROM {_phash_values(n)}),
b(band_id, d) AS (VALUES (0, {_u64_lit(1)}), (1, {_u64_lit(1 << 16)}),
                         (2, {_u64_lit(1 << 32)}), (3, {_u64_lit(1 << 48)}))
SELECT CAST(band_id AS BIGINT) AS band_id,
       CAST((u // d) % 65536 AS BIGINT) AS band_val,
       CAST(count(*) AS BIGINT) AS n
FROM ph, b GROUP BY band_id, band_val
"""


# ---------------------------------------------------------------------------
# coverings: constants from the driver-loop build, geometry re-derived in SQL
# ---------------------------------------------------------------------------


def _covering_flat(index) -> np.ndarray:
    """Flat-order covering cell ids of a CoveringIndex (by_level rows
    scatter back to their original explode order)."""
    cells = np.empty(len(index.tile_idx), dtype=np.uint64)
    for _lvl, cs, ridx in index.by_level:
        cells[ridx] = cs
    return cells


# validity invariants, applied as WHERE clauses: an invalid id (face ≥ 6,
# odd trailing-zero parity = no valid level, or deeper than max_level)
# DROPS its row and the driver sees a row-count mismatch.
def _lsb_ctes(values_sql: str, max_level: int) -> str:
    return f"""
WITH cov AS (SELECT * FROM {values_sql}),
d AS (SELECT *, cell_id & ~(cell_id - {_u64_lit(1)}) AS lsb FROM cov
      WHERE cell_id > {_u64_lit(0)}),
v AS (SELECT * FROM d
      WHERE bit_count(lsb - {_u64_lit(1)}) % 2 = 0
        AND cell_id // {_u64_lit(1 << 61)} <= 5
        AND lsb >= {_u64_lit(1 << (2 * (30 - max_level)))})
"""


def covering_tiles_sql(max_cells: int = 64, max_level: int = 14) -> str:
    """Twin for the nation-tile covering table: (tile_key, cell_id,
    interior) constants come from the driver-loop ``CoveringIndex.build``
    over the fixed nation keys 0..24 (identical at every TPC-H SF);
    range_min / range_max are RE-DERIVED in SQL from uint64 bit
    arithmetic, and id-validity invariants gate every row."""
    from s2geometry_ray.stages.spatial_join import CoveringIndex, tiles_from_keys

    tiles = [(int(t[0].removeprefix("tile")), t[1])
             for t in tiles_from_keys(np.arange(25, dtype=np.int64))]
    index = CoveringIndex.build(tiles, max_cells=max_cells, max_level=max_level)
    cells = _covering_flat(index)
    vals = ", ".join(
        f"({int(index.tile_ids[ti])}, {_u64_lit(int(c))}, "
        f"{'TRUE' if bool(i) else 'FALSE'})"
        for ti, c, i in zip(index.tile_idx, cells, index.interior))
    values_sql = f"(VALUES {vals}) AS t(tile_key, cell_id, interior)"
    return _lsb_ctes(values_sql, max_level) + f"""
SELECT CAST(tile_key AS BIGINT) AS tile_key, cell_id,
       cell_id - (lsb - {_u64_lit(1)}) AS range_min,
       cell_id + (lsb - {_u64_lit(1)}) AS range_max,
       interior
FROM v
"""


def covering_mixed_tiles_sql(n_tiles: int = 16, max_cells: int = 32,
                             max_level: int = 14) -> str:
    """Twin for the mixed-fixture covering: constants from the
    DRIVER-LOOP build (the Ray query runs ``build_covering_distributed``
    — so the gate also re-pins distributed == driver); token and level
    are RE-DERIVED in SQL (to_hex + popcount bit arithmetic)."""
    from s2geometry_ray.functions.cellid_sql import token_sql
    from s2geometry_ray.sources.tiles import gen_tiles
    from s2geometry_ray.stages.spatial_join import CoveringIndex

    _table, regions = gen_tiles(n_tiles)
    index = CoveringIndex.build(regions, max_cells=max_cells,
                                max_level=max_level)
    cells = _covering_flat(index)
    vals = ", ".join(
        f"({_str_lit(index.tile_ids[ti])}, {_u64_lit(int(c))}, "
        f"{'TRUE' if bool(i) else 'FALSE'})"
        for ti, c, i in zip(index.tile_idx, cells, index.interior))
    values_sql = f"(VALUES {vals}) AS t(tile_id, cell_id, interior)"
    return _lsb_ctes(values_sql, max_level) + f"""
SELECT tile_id, {token_sql('cell_id')} AS token,
       CAST(30 - bit_count(lsb - {_u64_lit(1)}) // 2 AS BIGINT) AS level,
       interior
FROM v
"""


# ---------------------------------------------------------------------------
# simhash: full recomputed twin (tokenize → splitmix64 → bit votes)
# ---------------------------------------------------------------------------


def simhash_ctes(table: str = "documents", key: str = "doc_id",
                 text: str = "text") -> str:
    """CTE chain ending in ``sh(key, simhash UBIGINT)`` that re-derives
    the engine's 64-bit SimHash from scratch in SQL: ``[0-9a-z_]+`` runs
    of the lowered text (byte-exact vs the engine's byte-class pass on
    ASCII corpora), per-byte position-weighted splitmix64, per-token
    reduce, and per-bit majority votes.  Every u64 wrap is spelled in
    HUGEINT-safe arithmetic (``shuffle_sql`` machinery)."""
    mixed = sql_splitmix64(
        "CAST((CAST(ascii(substr(tok, pos, 1)) AS HUGEINT) + CAST("
        + _sql_mulmod("CAST(pos AS UBIGINT)", _GOLD)
        + f" AS HUGEINT)) % {_U64} AS UBIGINT)")
    tok_h = sql_splitmix64(
        f"CAST((SUM(CAST(mixed AS HUGEINT)) + tlen) % {_U64} AS UBIGINT)")
    pow_rows = ", ".join(f"({k}, {_u64_lit(1 << k)})" for k in range(64))
    return f"""
WITH toks AS (
  SELECT {key} AS k, unnest(regexp_extract_all(lower({text}), '[0-9a-z_]+')) AS tok
  FROM {table}),
ti AS (SELECT row_number() OVER () AS tid, k, tok FROM toks),
byts AS (
  SELECT tid, k, length(tok) AS tlen, tok,
         unnest(generate_series(1, length(tok))) AS pos
  FROM ti),
bh AS (SELECT tid, k, tlen, {mixed} AS mixed FROM byts),
th AS (SELECT tid, k, {tok_h} AS tok_h FROM bh GROUP BY tid, k, tlen),
pw(bit, p) AS (VALUES {pow_rows}),
votes AS (
  SELECT k, bit, p, SUM(CAST((tok_h // p) % 2 AS BIGINT)) AS v, COUNT(*) AS c
  FROM th, pw GROUP BY k, bit, p),
agg AS (
  SELECT k, CAST(COALESCE(SUM(CASE WHEN 2 * v > c THEN CAST(p AS HUGEINT)
                                   ELSE 0 END), 0) % {_U64} AS UBIGINT) AS simhash
  FROM votes GROUP BY k),
sh AS (
  SELECT d.{key} AS k, COALESCE(agg.simhash, {_u64_lit(0)}) AS simhash
  FROM {table} d LEFT JOIN agg ON d.{key} = agg.k)
"""


def simhash_docs_sql() -> str:
    return simhash_ctes() + """
SELECT CAST(k AS BIGINT) AS doc_id, simhash FROM sh
"""


def simhash_pairs_docs_sql(r: int = 3) -> str:
    """Brute-force hamming≤r pairs in SQL over the recomputed SimHash —
    an INDEPENDENT check of the multi-index banding plan's exactness
    claim (banding + verify must equal the full O(n²) scan)."""
    return simhash_ctes() + f"""
SELECT CAST(a.k AS BIGINT) AS key_a, CAST(b.k AS BIGINT) AS key_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.k < b.k
WHERE bit_count(xor(a.simhash, b.simhash)) <= {r}
"""


# ---------------------------------------------------------------------------
# audio / video: actor-pool decode vs driver-side scalar reference
# ---------------------------------------------------------------------------


def audio_features_sql(n: int = 400) -> str:
    """Expected per-clip features from a driver-side scalar decode of
    the same deterministic WAV bytes; rms_ok additionally carries the
    generation-stamp invariant (decode(encode(pcm)).rms == stamped)."""
    from s2geometry_ray.kernels import av
    from s2geometry_ray.sources.synth_av import gen_audio_row

    vals = []
    for i in range(n):
        r = gen_audio_row(i)
        pcm, rate = av.decode_wav(r["bytes"])
        f = av.audio_features(pcm, rate)
        ok = "TRUE" if f["rms"] == int(r["rms"]) else "FALSE"
        vals.append(f"({_str_lit(r['audio_id'])}, {_str_lit(r['caption'])}, "
                    f"{f['duration_ms']}, {f['rms']}, {f['zero_crossings']}, "
                    f"{f['centroid_hz']}, {ok})")
    return ("SELECT audio_id, caption, CAST(duration_ms AS BIGINT) AS duration_ms, "
            "CAST(rms AS BIGINT) AS rms, "
            "CAST(zero_crossings AS BIGINT) AS zero_crossings, "
            "CAST(centroid_hz AS BIGINT) AS centroid_hz, rms_ok "
            "FROM (VALUES " + ", ".join(vals)
            + ") AS t(audio_id, caption, duration_ms, rms, zero_crossings, "
              "centroid_hz, rms_ok)")


def video_frame_sample_sql(n: int = 120, every: int = 4,
                           thumb: int = 8) -> str:
    """Expected sampled-frame rows from a driver-side scalar walk of the
    same VID1 bytes (byte-range frame sampling + area resize + phash)."""
    from s2geometry_ray.kernels import av
    from s2geometry_ray.kernels.phash import phash64_i64
    from s2geometry_ray.sources.synth_av import gen_video_row

    vals = []
    for i in range(n):
        r = gen_video_row(i)
        for fi, px in av.sample_frames(r["bytes"], every):
            th = av.resize_area(px, thumb, thumb)
            ph = int(phash64_i64(px))
            ok = "TRUE" if (fi != 0 or ph == int(r["phash0"])) else "FALSE"
            vals.append(f"({_str_lit(r['video_id'])}, {fi}, {ph}, "
                        f"{int(th.astype(np.int64).mean())}, {ok})")
    return ("SELECT video_id, CAST(frame_idx AS BIGINT) AS frame_idx, "
            "CAST(phash AS BIGINT) AS phash, "
            "CAST(thumb_mean AS BIGINT) AS thumb_mean, phash0_ok "
            "FROM (VALUES " + ", ".join(vals)
            + ") AS t(video_id, frame_idx, phash, thumb_mean, phash0_ok)")


# ---------------------------------------------------------------------------
# minhash LSH: full recomputed twin (byte shingles → affine minima →
# FNV band fold → capped bucket triangles), round-4 conversion
# ---------------------------------------------------------------------------


def shingle_ctes(width: int = 5, table: str = "documents",
                 key: str = "doc_id", text: str = "text") -> str:
    """WITH-prefix ending in ``sh(k, h)`` — per-doc DISTINCT
    splitmix-mixed byte-shingle hashes (big-endian ``width``-byte
    windows of lower(text), '_'-padded below width).  Shared by the
    MinHash twin chain and the decontamination twin so the shingle SQL
    can never diverge.  ASCII-corpus precondition: char == byte."""
    pack = "CAST(ascii(substr(t, p, 1)) AS UBIGINT)"
    for k in range(1, width):
        pack = (f"({pack}) * 256 + "
                f"CAST(ascii(substr(t, p + {k}, 1)) AS UBIGINT)")
    mixed = sql_splitmix64("raw")
    return f"""
WITH pad AS (
  SELECT {key} AS k,
         CASE WHEN length({text}) >= {width} THEN lower({text})
              ELSE lower({text}) || repeat('_', {width} - length({text}))
         END AS t
  FROM {table}),
win AS (
  SELECT k, t, unnest(generate_series(1, length(t) - {width - 1})) AS p
  FROM pad),
shraw AS (SELECT DISTINCT k, {pack} AS raw FROM win),
sh AS (SELECT k, {mixed} AS h FROM shraw)"""


def minhash_ctes(num_perm: int = 64, bands: int = 16, width: int = 5,
                 seed: int = 1234, max_bucket: int = 256,
                 table: str = "documents", key: str = "doc_id",
                 text: str = "text") -> str:
    """CTE chain ending in ``pairs(key_a, key_b)`` — the LSH candidate
    set — plus ``sh(k, h)`` (per-doc DISTINCT shingle hashes), rederiving
    the engine's kperm MinHash bit-exactly in SQL:

    - shingles: ``width``-byte windows of lower(text) ('_'-padded below
      width), packed big-endian then splitmix64-mixed; DISTINCT per doc
      (splitmix64 is a bijection, so distinct-raw == distinct-mixed);
    - affine minima: sig[p] = min over shingles of
      ((h·a_p + b_p) mod 2⁶⁴) mod (2⁶¹−1) — the uint64 WRAP before the
      Mersenne reduction is part of the engine value (dedup._mod_mersenne
      applies to the wrapped product), so the SQL mods twice too;
    - band hash: FNV-style fold h ← h·0x100000001B3 + sig (mod 2⁶⁴)
      over the band's rows;
    - buckets → pairs: per (band_id, band_hash) bucket, keys ranked
      ascending, capped at ``max_bucket`` (the engine's documented
      recall/size trade), triangle join, DISTINCT across bands.

    The a/b permutation constants are the engine's own seeded draws,
    embedded as VALUES — candidate generation is deterministic given
    them, so this is an exact twin, not a probabilistic bound."""
    from s2geometry_ray.functions.dedup import MinHasher

    mh = MinHasher(num_perm=num_perm, bands=bands, seed=seed,
                   shingle_width=width)
    rows = num_perm // bands
    perm_vals = ", ".join(
        f"({p}, {_u64_lit(int(mh.a[p]))}, {_u64_lit(int(mh.b[p]))})"
        for p in range(num_perm))
    # big-endian byte pack of the width-window (ASCII corpora: char ==
    # byte, the simhash-twin precondition)
    mersenne = (1 << 61) - 1
    affine = (f"CAST(CAST((CAST(h AS HUGEINT) * a + b) % {_U64} AS UBIGINT)"
              f" % {mersenne} AS UBIGINT)")
    sig_cols = ", ".join(
        f"MAX(CASE WHEN perm % {rows} = {r} THEN sig END) AS s{r}"
        for r in range(rows))
    fold = "CAST(s0 AS UBIGINT)"
    for r in range(1, rows):
        prod = _sql_mulmod(f"({fold})", 0x100000001B3)
        fold = (f"CAST((CAST({prod} AS HUGEINT) + s{r}) % {_U64}"
                f" AS UBIGINT)")
    return shingle_ctes(width=width, table=table, key=key,
                        text=text) + f""",
aff AS (
  SELECT k, perm, MIN({affine}) AS sig
  FROM sh, (VALUES {perm_vals}) AS perms(perm, a, b)
  GROUP BY k, perm),
bsig AS (
  SELECT k, perm // {rows} AS band_id, {sig_cols}
  FROM aff GROUP BY k, perm // {rows}),
bh AS (SELECT k, band_id, {fold} AS band_hash FROM bsig),
ranked AS (
  SELECT k, band_id, band_hash,
         ROW_NUMBER() OVER (PARTITION BY band_id, band_hash ORDER BY k) AS rn
  FROM bh),
capped AS (SELECT * FROM ranked WHERE rn <= {max_bucket}),
pairs AS (
  SELECT DISTINCT x.k AS key_a, y.k AS key_b
  FROM capped x JOIN capped y
    ON x.band_id = y.band_id AND x.band_hash = y.band_hash AND x.rn < y.rn)
"""


def minhash_pairs_docs_sql(**kw) -> str:
    return minhash_ctes(**kw) + """
SELECT CAST(key_a AS BIGINT) AS key_a, CAST(key_b AS BIGINT) AS key_b
FROM pairs
"""


def jaccard_verify_ctes() -> str:
    """CTE fragment (appended after ``minhash_ctes``) computing the
    exact shingle-set Jaccard of every candidate pair: ends in
    ``jv(key_a, key_b, v, jac)`` with v = jac·10⁴.  Shared by the
    near-dup gate twin below and the composed corpus-curation twin
    (pipelines/analytics.corpus_curation_sql) so the verify math can
    never diverge between them."""
    return """
, sizes AS (SELECT k, count(*) AS c FROM sh GROUP BY k),
inter AS (
  SELECT p.key_a, p.key_b, count(*) AS i
  FROM pairs p
  JOIN sh x ON x.k = p.key_a
  JOIN sh y ON y.k = p.key_b AND y.h = x.h
  GROUP BY p.key_a, p.key_b),
iu AS (
  SELECT p.key_a, p.key_b, COALESCE(i.i, 0) AS i,
         sa.c + sb.c - COALESCE(i.i, 0) AS u
  FROM pairs p
  LEFT JOIN inter i ON i.key_a = p.key_a AND i.key_b = p.key_b
  JOIN sizes sa ON sa.k = p.key_a
  JOIN sizes sb ON sb.k = p.key_b),
jv AS (
  SELECT key_a, key_b,
         (CAST(i AS DOUBLE) / CAST(u AS DOUBLE)) * 10000 AS v,
         CAST(i AS DOUBLE) / CAST(u AS DOUBLE) AS jac
  FROM iu)"""


def neardup_jaccard_docs_sql(tau: float = 0.5, **kw) -> str:
    """LSH candidates (twin above) verified by EXACT shingle-set Jaccard,
    replicating the engine's float path: jac = i/u and jac·10⁴ are the
    same IEEE-754 double ops on both engines, and the final np.rint
    half-to-EVEN is spelled out (DuckDB round() is half-away-from-zero,
    which differs exactly at .5 fractions)."""
    return minhash_ctes(**kw) + jaccard_verify_ctes() + f"""
SELECT CAST(key_a AS BIGINT) AS key_a, CAST(key_b AS BIGINT) AS key_b,
       CAST(floor(v) AS BIGINT)
       + CASE WHEN v - floor(v) > 0.5 THEN 1
              WHEN v - floor(v) = 0.5 THEN CAST(floor(v) AS BIGINT) % 2
              ELSE 0 END AS jaccard_e4
FROM jv WHERE jac >= {tau}
"""


# ---------------------------------------------------------------------------
# polygon overlay: driver-side scalar recompute pin (the decode /
# covering "distributed == driver == stamp" pattern)
# ---------------------------------------------------------------------------


def polygon_overlay_tiles_sql() -> str:
    """Expected (a, b, op, n_loops, n_holes, n_vertices) rows from a
    DRIVER-side run of the same overlay kernels over the fixed nation
    keys 0..24 (identical at every TPC-H SF, like covering_tiles); the
    Ray query recomputes them inside map_batches on workers."""
    from s2geometry_ray.pipelines.extras import overlay_summary_rows

    vals = ", ".join(
        f"({a}, {b}, {_str_lit(op)}, {nl}, {nh}, {nv})"
        for a, b, op, nl, nh, nv in overlay_summary_rows(range(25)))
    return ("SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, op, "
            "CAST(n_loops AS BIGINT) AS n_loops, "
            "CAST(n_holes AS BIGINT) AS n_holes, "
            "CAST(n_vertices AS BIGINT) AS n_vertices FROM (VALUES "
            + vals + ") AS t(a, b, op, n_loops, n_holes, n_vertices)")


def image_thumbs_images_sql(n: int = 400, thumb: int = 8) -> str:
    """Expected (image_id, fmt, thumb_mean, thumb_r, thumb_g, thumb_b)
    rows from a DRIVER-side decode+resize of the same deterministic
    synthetic images — pins the actor-pool resize stage value-exactly
    (the family's raster resize semantics: exact box average on
    integer-divisible dims, nearest-neighbor otherwise)."""
    from s2geometry_ray.kernels import codecs
    from s2geometry_ray.sources.synth import gen_image_row
    from s2geometry_ray.stages.decode import thumb_features

    vals = []
    for i in range(n):
        r = gen_image_row(i, with_bytes=True)
        pixels = codecs.DECODERS[r["fmt"]](r["bytes"])
        tm, tr, tg, tb = thumb_features(pixels, thumb)
        vals.append(f"({_str_lit(r['image_id'])}, {_str_lit(r['fmt'])}, "
                    f"{tm}, {tr}, {tg}, {tb})")
    cols = "image_id, fmt, thumb_mean, thumb_r, thumb_g, thumb_b"
    return ("SELECT image_id, fmt, CAST(thumb_mean AS BIGINT) AS thumb_mean, "
            "CAST(thumb_r AS BIGINT) AS thumb_r, "
            "CAST(thumb_g AS BIGINT) AS thumb_g, "
            "CAST(thumb_b AS BIGINT) AS thumb_b FROM (VALUES "
            + ", ".join(vals) + f") AS t({cols})")


def polyline_ops_routes_sql() -> str:
    """Expected (key, n_in, n_out, length_e9, mid_lat_e7, mid_lng_e7,
    suffix_n) rows from a DRIVER-side run of the same polyline kernels
    (interpolate / suffix / subsample_vertices) over the fixed nation
    keys 0..24; the Ray query recomputes them inside map_batches."""
    from s2geometry_ray.pipelines.extras import polyline_summary_rows

    cols = ["key", "n_in", "n_out", "length_e9", "mid_lat_e7",
            "mid_lng_e7", "suffix_n"]
    vals = ", ".join("(" + ", ".join(str(x) for x in row) + ")"
                     for row in polyline_summary_rows(range(25)))
    sel = ", ".join(f"CAST({c} AS BIGINT) AS {c}" for c in cols)
    return (f"SELECT {sel} FROM (VALUES " + vals
            + ") AS t(" + ", ".join(cols) + ")")


# ---------------------------------------------------------------------------
# measured-value pin
# ---------------------------------------------------------------------------

# IVF training is content-hash deterministic (round 3) AND canonical-
# order (round 5: _kmeans_fit sorts the sample by content hash, so the
# measured recall is stable on any block arrival order).  Pinning it
# makes the approximation quality itself a regression gate.  Re-measure
# and update if the IVF defaults or the gate query set change (measured
# 2026-08-18 after the canonical-order change, 5 queries × k=20 over
# sf0.01 embeddings).
IVF_RECALL_PIN_SF001 = 88


def ivf_recall_sql(recall_pct: int, n_queries: int = 5) -> str:
    return (f"SELECT 'ivf_recall_at_20' AS metric, "
            f"CAST({recall_pct} AS BIGINT) AS recall_pct, "
            f"CAST({n_queries} AS BIGINT) AS n_queries")


def ivf_topk_sql(k: int = 20, n_query: int = 5,
                 sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Value-exact twin of the IVF top-k gate: only the PRUNE SET (the
    vec_ids surviving the probed-bucket filter) is a driver-side
    recompute pin (``ann.ivf_prune_ids`` — the identical deterministic
    chain, single-process numpy); the top-k SELECTION is re-derived in
    SQL over that set exactly like the brute ``ann_cosine_topk`` twin
    (rank by cosine DESC, vec_id tie-break).  The pin is computed from
    the sf0.01 fixture — the scale the driver's correctness gate runs
    at (same convention as IVF_RECALL_PIN_SF001).  A missing fixture
    degrades to a runtime SQL error for THIS gate only, never an
    import-time crash of the whole oracle dict."""
    try:
        import pyarrow.parquet as _pq

        from s2geometry_ray.functions.ann import ivf_prune_ids

        t = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
        keys = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        qmask = keys < n_query
        qorder = np.argsort(keys[qmask])
        pruned = ivf_prune_ids(emb, keys, emb[qmask][qorder])
    except FileNotFoundError:
        return ("SELECT CAST(error('ivf_topk oracle pin needs "
                f"{sf_dir}/embeddings.parquet') AS BIGINT) AS query_id, "
                "CAST(0 AS BIGINT) AS vec_id")
    ids = ", ".join(str(int(v)) for v in pruned)
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id < {n_query}),
d AS (SELECT q.qid, e.vec_id,
             list_cosine_similarity(q.qe, e.embedding) AS sim
      FROM q, embeddings e WHERE e.vec_id IN ({ids}))
SELECT CAST(qid AS BIGINT) AS query_id, CAST(vec_id AS BIGINT) AS vec_id
FROM (SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
               AS rn
      FROM d)
WHERE rn <= {k}
"""


def augment_images_sql(n: int = 400) -> str:
    """Expected (image_id, aug_h, aug_w, aug_sum, aug_phash) from a
    DRIVER-side decode + augment of the same deterministic synthetic
    images — pins the actor-pool augmentation stage value-exactly
    (the replayable-augmentation contract: same hash key → same
    flips/rotation/crop on any worker)."""
    from s2geometry_ray.kernels import codecs
    from s2geometry_ray.sources.synth import _hash_u64, gen_image_row
    from s2geometry_ray.stages.decode import augment_features

    vals = []
    for i in range(n):
        r = gen_image_row(i, with_bytes=True)
        ah, aw, asum, aph = augment_features(
            codecs.DECODERS[r["fmt"]](r["bytes"]),
            _hash_u64(r["image_id"], "aug"))
        vals.append(f"({_str_lit(r['image_id'])}, {ah}, {aw}, "
                    f"{asum}, {aph})")
    return ("SELECT image_id, CAST(aug_h AS BIGINT) AS aug_h, "
            "CAST(aug_w AS BIGINT) AS aug_w, "
            "CAST(aug_sum AS BIGINT) AS aug_sum, "
            "CAST(aug_phash AS BIGINT) AS aug_phash FROM (VALUES "
            + ", ".join(vals)
            + ") AS t(image_id, aug_h, aug_w, aug_sum, aug_phash)")


def decontaminate_docs_sql(query_texts: list[str], width: int = 5,
                           min_hits: int = 1,
                           table: str = "documents") -> str:
    """Twin of ``dedup.decontaminate``: the query shingle set is the
    engine's own driver-side computation embedded as u64 VALUES; doc
    shingles come from the shared ``shingle_ctes`` block (distinct per
    doc on both engines)."""
    from s2geometry_ray.functions.dedup import _shingle_hashes

    q = np.unique(np.concatenate(
        [_shingle_hashes(t, width) for t in query_texts]))
    vals = ", ".join(f"({_u64_lit(int(h))})" for h in q)
    return shingle_ctes(width=width, table=table) + f""",
qset AS (SELECT h FROM (VALUES {vals}) AS q(h)),
hits AS (
  SELECT k, count(*) AS n_hits
  FROM sh WHERE h IN (SELECT h FROM qset) GROUP BY k)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(hits.n_hits, 0) >= {min_hits} AS contaminated
FROM {table} d LEFT JOIN hits ON hits.k = d.doc_id
"""


def caption_geo_check_sql(n: int = 400) -> str:
    """Expected caption↔geotag validation rows from a driver-side run
    of the SAME parse+derive chain over the deterministic synthetic
    captions — a regression in the regex, the id-hash geotag, or the
    fixed-point formatting flips a row."""
    from s2geometry_ray.pipelines.extras import CaptionGeoCheck
    from s2geometry_ray.sources.synth import gen_image_row

    import pyarrow as pa

    rows = [gen_image_row(i, with_bytes=False) for i in range(n)]
    t = pa.table({
        "image_id": pa.array([r["image_id"] for r in rows]),
        "caption": pa.array([r["caption"] for r in rows]),
    })
    out = CaptionGeoCheck()(t)
    vals = []
    for i in range(n):
        vals.append(
            f"({_str_lit(out['image_id'][i].as_py())}, "
            f"{out['cap_lat_e4'][i].as_py()}, {out['cap_lng_e4'][i].as_py()}, "
            f"{out['geo_lat_e4'][i].as_py()}, {out['geo_lng_e4'][i].as_py()}, "
            f"{'TRUE' if out['consistent'][i].as_py() else 'FALSE'})")
    cols = ("image_id, cap_lat_e4, cap_lng_e4, geo_lat_e4, geo_lng_e4, "
            "consistent")
    return ("SELECT image_id, CAST(cap_lat_e4 AS BIGINT) AS cap_lat_e4, "
            "CAST(cap_lng_e4 AS BIGINT) AS cap_lng_e4, "
            "CAST(geo_lat_e4 AS BIGINT) AS geo_lat_e4, "
            "CAST(geo_lng_e4 AS BIGINT) AS geo_lng_e4, consistent "
            "FROM (VALUES " + ", ".join(vals) + f") AS t({cols})")


def tile_color_stats_sql(n: int = 400, n_tiles: int = 12) -> str:
    """O52 composed image×geo twin: per-image exact integer channel
    sums recomputed by a driver-side scalar decode (raster_boxes
    discipline) + the geotag repr'd as an exact float64 literal;
    rect-tile membership and the per-tile aggregation are RE-DERIVED in
    SQL.  A bug in the decode actors, the cell assign, the covering
    join, or the partial aggregation flips a row."""
    from s2geometry_ray.kernels import codecs
    from s2geometry_ray.sources.synth import (derive_latlng, gen_image_row,
                                              image_city_tile_bounds)

    def dbl(v: float) -> str:
        return f"CAST('{float(v)!r}' AS DOUBLE)"

    vals = []
    for i in range(n):
        r = gen_image_row(i, with_bytes=True)
        px = codecs.decode(r["bytes"], r["fmt"]).astype(np.int64)
        s = px.sum(axis=(0, 1))
        lat, lng = derive_latlng(r["image_id"])
        vals.append(f"({dbl(lat)}, {dbl(lng)}, "
                    f"{int(s[0])}, {int(s[1])}, {int(s[2])})")
    tiles = []
    for k in range(n_tiles):
        b = image_city_tile_bounds(k)
        tiles.append(f"({k}, {dbl(b['lat_lo'])}, {dbl(b['lat_hi'])}, "
                     f"{dbl(b['lng_lo'])}, {dbl(b['lng_hi'])})")
    return f"""
WITH imgs(lat, lng, r, g, b) AS (VALUES {", ".join(vals)}),
tiles(tile_key, lat_lo, lat_hi, lng_lo, lng_hi) AS (VALUES {", ".join(tiles)})
SELECT CAST(t.tile_key AS BIGINT) AS tile_key,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(SUM(i.r) AS BIGINT) AS r_sum,
       CAST(SUM(i.g) AS BIGINT) AS g_sum,
       CAST(SUM(i.b) AS BIGINT) AS b_sum
FROM imgs i JOIN tiles t
  ON i.lat BETWEEN t.lat_lo AND t.lat_hi
 AND i.lng BETWEEN t.lng_lo AND t.lng_hi
GROUP BY 1
"""


def patch_features_sql(n: int = 300, grid: int = 4) -> str:
    """O58 twin: every (image, patch) sum recomputed by a driver-side
    scalar decode over the same deterministic pixels (the raster_boxes
    discipline) — a drift in any codec, the grid edges, or the actor
    explode flips a row."""
    from s2geometry_ray.kernels import codecs
    from s2geometry_ray.sources.synth import gen_image_row

    P = grid
    vals = []
    for i in range(n):
        r = gen_image_row(i, with_bytes=True)
        px = codecs.decode(r["bytes"], r["fmt"]).astype(np.int64)
        h, w = px.shape[:2]
        ye = [y * h // P for y in range(P + 1)]
        xe = [x * w // P for x in range(P + 1)]
        for yy in range(P):
            for xx in range(P):
                blk = px[ye[yy]:ye[yy + 1], xe[xx]:xe[xx + 1]]
                vals.append(f"({i}, {yy}, {xx}, {int(blk.sum())}, "
                            f"{blk.shape[0] * blk.shape[1]})")
    return ("SELECT CAST(ikey AS BIGINT) AS ikey, CAST(py AS BIGINT) AS py, "
            "CAST(px AS BIGINT) AS px, CAST(psum AS BIGINT) AS psum, "
            "CAST(npix AS BIGINT) AS npix FROM (VALUES " + ", ".join(vals)
            + ") AS t(ikey, py, px, psum, npix)")
