"""Shared numeric SQL-twin helpers.

DuckDB's ``ROUND()`` is half-AWAY-from-zero while numpy's ``np.round`` /
``np.rint`` are half-TO-even (IEEE roundTiesToEven) — the two differ on
any float64 whose fractional part is exactly 0.5 (e.g. a ``value * 100``
landing on an exact cent boundary), flipping a cent and failing the
value-hash gate.  Every engine-side fixed-point conversion uses
``np.round``; every SQL twin must therefore use :func:`half_even_sql`
instead of ``ROUND()`` so both sides take the identical IEEE decision.

The idiom spells out floor + tie-parity explicitly (the convention
established by ``trajectory_distance_sql`` / ``neardup_jaccard_docs_sql``)
and is sign-correct: ``abs(floor(v) % 2)`` is the parity of the floor for
negative floors too (DuckDB ``%`` keeps the dividend's sign), so
``half_even_sql("-2.5") = -2`` matching ``np.rint(-2.5)``.
"""


def half_even_sql(expr: str) -> str:
    """BIGINT half-to-even rounding of a float64 SQL expression —
    bit-decision-identical to ``np.round(expr).astype(np.int64)``."""
    v = f"({expr})"
    fl = f"CAST(floor{v} AS BIGINT)"
    return (f"({fl} + CASE WHEN {v} - floor{v} > 0.5 THEN 1 "
            f"WHEN {v} - floor{v} = 0.5 THEN abs({fl} % 2) "
            f"ELSE 0 END)")
