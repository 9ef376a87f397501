"""The pure-SQL S2 cell-id oracle (functions/cellid_sql.py) must match
the numpy kernel bit-exactly — it is the independent implementation the
driver gate trusts for cell_assign_events / cell_stats_events."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa

from s2geometry_ray.functions.cellid_sql import cell_id_ctes, parent_sql, token_sql
from s2geometry_ray.kernels import cellid as vk
from s2geometry_ray.oracle import s2 as o


def _run_sql(lat: np.ndarray, lng: np.ndarray):
    con = duckdb.connect()
    t = pa.table({"event_id": pa.array(np.arange(len(lat), dtype=np.int64)),
                  "lat": pa.array(lat), "lng": pa.array(lng)})
    con.register("events", t)
    sql = cell_id_ctes("lat", "lng") + f"""
SELECT event_id, cell_id,
       {parent_sql('cell_id', 8)} AS l8,
       {parent_sql('cell_id', 20)} AS l20,
       {token_sql('cell_id')} AS token
FROM cell ORDER BY event_id
"""
    return con.execute(sql).df()


def test_sql_cellid_matches_kernel_random():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-89.9, 89.9, 3000)
    lng = rng.uniform(-180.0, 180.0, 3000)
    df = _run_sql(lat, lng)
    want = vk.from_latlng(lat, lng)
    assert (df["cell_id"].to_numpy() == want).all()
    assert (df["l8"].to_numpy() == vk.parent(want, 8)).all()
    assert (df["l20"].to_numpy() == vk.parent(want, 20)).all()
    assert (df["token"].to_numpy() == np.asarray(vk.token(want))).all()


def test_sql_cellid_near_face_boundaries():
    """Points NEAR (1e-7 deg off — outside the cos/sin ulp band) face
    boundaries, poles, and the ±45° seams stress the face-selection and
    quadratic-st branches."""
    seeds = []
    for base_lat in (-89.999, -45.0, 0.0, 35.26438968, 45.0, 89.999):
        for base_lng in (-180.0, -135.0, -90.0, -45.0, 0.0, 45.0, 90.0, 135.0, 179.999):
            for dl, dg in ((1e-7, 1e-7), (-1e-7, 1e-7), (1e-7, -1e-7),
                           (-1e-7, -1e-7)):
                la = np.clip(base_lat + dl, -89.9999, 89.9999)
                lg = base_lng + dg
                if lg > 180.0:
                    lg -= 360.0
                seeds.append((la, lg))
    lat = np.array([s[0] for s in seeds])
    lng = np.array([s[1] for s in seeds])
    df = _run_sql(lat, lng)
    want = vk.from_latlng(lat, lng)
    assert (df["cell_id"].to_numpy() == want).all()
    # oracle round-trip sanity on a few
    for i in range(0, len(lat), 37):
        assert int(df["cell_id"][i]) == o.from_lat_lng(lat[i], lng[i])
