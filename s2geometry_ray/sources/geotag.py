"""Deterministic geotag derivation from integer keys — numpy + SQL twins.

The driver's correctness gate compares Ray pipelines against DuckDB SQL
on the same parquet tables, so geotags must be derivable with the SAME
IEEE-754 double arithmetic on both sides.  Integer modular mixing
followed by one division and one subtraction is bit-exact in both
engines.  Every function here has a `*_sql` twin returning the exact
DuckDB expression; keep them in lockstep.

lat ∈ [-85, 84.99] step 0.01 — keeps test data away from the poles.
lng ∈ [-180, 179.99] step 0.01.
"""

from __future__ import annotations

import numpy as np

LAT_MULT = 7919
LNG_MULT = 104729


def derive_lat(key: np.ndarray) -> np.ndarray:
    return ((key.astype(np.int64) * LAT_MULT) % 17000) / 100.0 - 85.0


def derive_lng(key: np.ndarray) -> np.ndarray:
    return ((key.astype(np.int64) * LNG_MULT) % 36000) / 100.0 - 180.0


def derive_lat_sql(key_expr: str) -> str:
    return f"(({key_expr} * {LAT_MULT}) % 17000) / 100.0 - 85.0"


def derive_lng_sql(key_expr: str) -> str:
    return f"(({key_expr} * {LNG_MULT}) % 36000) / 100.0 - 180.0"


# --- rect tiles derived from integer tile keys (exact, SQL-expressible) ---


def tile_bounds(k: np.ndarray) -> dict[str, np.ndarray]:
    """Deterministic rect-tile bounds from an integer tile key.

    All-integer arithmetic then float conversion — exact in SQL too.
    lng_hi is clamped to 180 so gate tiles never wrap (wrapping rects
    are exercised by the pytest fixtures instead)."""
    k = np.asarray(k, dtype=np.int64)
    lat_lo = -75.0 + (k * 53 % 140)
    lat_hi = lat_lo + 5.0 + (k % 7)
    lng_lo = -180.0 + (k * 97 % 350)
    lng_hi = np.minimum(lng_lo + 8.0 + (k % 11), 180.0)
    return {"lat_lo": lat_lo, "lat_hi": lat_hi, "lng_lo": lng_lo, "lng_hi": lng_hi}


def tile_bounds_sql(k: str) -> dict[str, str]:
    return {
        "lat_lo": f"(-75.0 + ({k} * 53 % 140))",
        "lat_hi": f"(-75.0 + ({k} * 53 % 140) + 5.0 + ({k} % 7))",
        "lng_lo": f"(-180.0 + ({k} * 97 % 350))",
        "lng_hi": f"LEAST(-180.0 + ({k} * 97 % 350) + 8.0 + ({k} % 11), 180.0)",
    }
