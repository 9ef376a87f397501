"""Storage facade: Parquet now, Lance when available (one switch).

BASELINE.json names Lance as the primary table format; ``pylance`` is
not installed in this sandbox (SURVEY.md §0), so Parquet is the active
backend and the Lance path is feature-gated behind an import probe —
`ray.data.read_lance/write_lance` exist in Ray 2.49.2 and activate
automatically once the wheel is present (README "Known deviations").
"""

from __future__ import annotations

import importlib.util


def lance_available() -> bool:
    return importlib.util.find_spec("lance") is not None


def read_table(uri: str, columns: list[str] | None = None):
    import ray.data as rd

    if uri.endswith(".lance") or (lance_available() and uri.endswith(".lancedb")):
        return rd.read_lance(uri, columns=columns)
    return rd.read_parquet(uri, columns=columns)


def write_table(ds, uri: str, **kwargs):
    if uri.endswith(".lance"):
        if not lance_available():
            raise RuntimeError(
                "Lance output requested but pylance is not installed; "
                "use a parquet path (README: Known deviations)")
        return ds.write_lance(uri, **kwargs)
    return ds.write_parquet(uri, **kwargs)
