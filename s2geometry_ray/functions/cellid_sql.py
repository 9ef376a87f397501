"""Pure-SQL S2 leaf-cell assignment — an INDEPENDENT DuckDB
implementation of lat/lng → S2CellId used as the correctness oracle for
the cell-assign gate queries.

The SQL mirrors the engine's kernel formula-by-formula (cube-face
selection, quadratic st, truncating ij) and runs the Hilbert encode as
8 joins against an inline 1024-row lookup CTE (the public S2 4-bit
lookup table, generated from kernels/hilbert.py so the two can never
drift).  DuckDB's `<<` raises on 64-bit overflow, so shifts are spelled
as exact multiplies/divides — every intermediate is < 2⁶⁴ and
non-negative, so UBIGINT arithmetic is exact.

Float caveat (documented, shared with the kNN twin): cos/sin are not
correctly-rounded, so a point within ~1 ulp of a cell boundary could
land in the adjacent cell under one engine.  At the gate's 10⁴–10⁵
random points the probability is ≪ 1; sqrt/trunc/divide are IEEE-exact
so every step after the trig is bit-identical by construction.
"""

from __future__ import annotations

from s2geometry_ray.kernels.hilbert import _LOOKUP_POS

MAX_SIZE = 1 << 30


def _lut_values() -> str:
    rows = ", ".join(f"({i},{v})" for i, v in enumerate(_LOOKUP_POS))
    return f"(VALUES {rows})"


def cell_id_ctes(lat_expr: str, lng_expr: str, key: str = "event_id",
                 table: str = "events", extra_cols: str = "",
                 extra_select: str | None = None) -> str:
    """CTE chain ending in ``cell(key[, extra], cell_id UBIGINT)``.
    ``extra_cols`` (e.g. ", cents") names payload columns carried
    through every stage; ``extra_select`` optionally gives the FIRST
    stage's expression for them (e.g. ", CAST(...) AS cents")."""
    if extra_select is None:
        extra_select = extra_cols
    ctes = [f"""lut(idx, v) AS {_lut_values()}""", f"""
xyz AS (
  SELECT {key}{extra_select},
         cos(radians({lng_expr})) * cos(radians({lat_expr})) AS x,
         sin(radians({lng_expr})) * cos(radians({lat_expr})) AS y,
         sin(radians({lat_expr})) AS z
  FROM {table})""", """
fuv AS (
  SELECT *,
    CASE WHEN abs(x) > abs(y)
         THEN (CASE WHEN abs(x) > abs(z) THEN 0 ELSE 2 END)
         ELSE (CASE WHEN abs(y) > abs(z) THEN 1 ELSE 2 END) END AS axis
  FROM xyz)""", """
fuv2 AS (
  SELECT *, (CASE axis WHEN 0 THEN x WHEN 1 THEN y ELSE z END) AS comp
  FROM fuv)""", """
fuv3 AS (
  SELECT *, (comp < 0.0) AS neg,
    axis + CASE WHEN comp < 0.0 THEN 3 ELSE 0 END AS face,
    (CASE WHEN axis = 0 THEN (CASE WHEN comp < 0.0 THEN z ELSE y END)
          WHEN axis = 1 THEN (CASE WHEN comp < 0.0 THEN z ELSE -x END)
          ELSE (CASE WHEN comp < 0.0 THEN -y ELSE -x END) END) / comp AS u,
    (CASE WHEN axis = 0 THEN (CASE WHEN comp < 0.0 THEN y ELSE z END)
          WHEN axis = 1 THEN (CASE WHEN comp < 0.0 THEN -x ELSE z END)
          ELSE (CASE WHEN comp < 0.0 THEN -x ELSE -y END) END) / comp AS v
  FROM fuv2)""", f"""
ij AS (
  SELECT {key}{extra_cols}, face,
    least(greatest(CAST(trunc(
      CASE WHEN u >= 0.0 THEN {MAX_SIZE}.0 * (0.5 * sqrt(1.0 + 3.0 * abs(u)))
           ELSE {MAX_SIZE}.0 * (1.0 - 0.5 * sqrt(1.0 + 3.0 * abs(u))) END
    ) AS BIGINT), 0), {MAX_SIZE - 1}) AS i,
    least(greatest(CAST(trunc(
      CASE WHEN v >= 0.0 THEN {MAX_SIZE}.0 * (0.5 * sqrt(1.0 + 3.0 * abs(v)))
           ELSE {MAX_SIZE}.0 * (1.0 - 0.5 * sqrt(1.0 + 3.0 * abs(v))) END
    ) AS BIGINT), 0), {MAX_SIZE - 1}) AS j
  FROM fuv3)""", f"""
h8 AS (
  SELECT {key}{extra_cols}, face, i, j,
         CAST(face AS UBIGINT) * CAST({1 << 60} AS UBIGINT) AS n,
         face % 2 AS bits
  FROM ij)"""]
    # 8 Hilbert rounds, most-significant nibble first (k = 7 .. 0)
    prev = "h8"
    for k in range(7, -1, -1):
        nib = 1 << (4 * k)
        pos_mul = 1 << (8 * k)
        cur = f"h{k}"
        ctes.append(f"""
{cur} AS (
  SELECT {key}{extra_cols}, face, i, j,
         n + CAST(lut.v // 4 AS UBIGINT) * CAST({pos_mul} AS UBIGINT) AS n,
         lut.v % 4 AS bits
  FROM {prev} JOIN lut
    ON lut.idx = {prev}.bits + ((i // {nib}) % 16) * 64
                 + ((j // {nib}) % 16) * 4)""")
        prev = cur
    ctes.append(f"""
cell AS (
  SELECT {key}{extra_cols},
         n * CAST(2 AS UBIGINT) + CAST(1 AS UBIGINT) AS cell_id
  FROM {prev})""")
    return "WITH " + ",".join(ctes)


def parent_sql(cid_expr: str, level: int) -> str:
    """Engine parent(): (cid & ~(2·lsb − 1)) | lsb, lsb = 2^(2(30−L)) —
    constants inlined (DuckDB UBIGINT & | are exact)."""
    lsb = 1 << (2 * (30 - level))
    mask = (~(2 * lsb - 1)) & ((1 << 64) - 1)
    return (f"(({cid_expr} & CAST({mask} AS UBIGINT))"
            f" | CAST({lsb} AS UBIGINT))")


def token_sql(cid_expr: str) -> str:
    """Engine token(): 16-hex-digit id, lowercase, trailing zeros
    stripped."""
    return f"rtrim(lower(lpad(to_hex({cid_expr}), 16, '0')), '0')"


def cell_assign_events_sql(lat_expr: str, lng_expr: str) -> str:
    return cell_id_ctes(lat_expr, lng_expr) + f"""
SELECT CAST(event_id AS BIGINT) AS event_id, cell_id,
       {parent_sql('cell_id', 8)} AS cell_l8,
       {parent_sql('cell_id', 12)} AS cell_l12,
       {token_sql('cell_id')} AS token
FROM cell
"""
