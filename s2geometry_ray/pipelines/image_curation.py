"""O56 composed image-curation pipeline — the image-axis counterpart of
the corpus-curation (O34) and training-prep (O49) compositions:

    synth images (+ planted exact duplicates)
    → decode actor pool (phash VERIFY, integer milli-brightness, geotag)
    → brightness quality filter (map)
    → exact phash dedup, min-key survivor (one phash-part exchange)
    → per-cell spatial cap, ≤ k survivors per level-5 cell chosen by
      seeded content hash (functions.shuffle.cap_per_group — replays
      identically on any cluster layout)
    → deterministic shard assignment (splitmix of the image key)

Every stage is an existing engine operator; the DuckDB twin is ONE
assembled query: driver-side scalar decode pins (ikey, lat, lng,
phash, bmilli) as VALUES, the pure-SQL S2 kernel recomputes the cell
from the float literals, and filter / dedup / cap / shard are
re-derived with QUALIFY windows over the bit-exact splitmix chain.
Value-exact end-to-end: a bug in the actor pool, a codec, the cell
assign, the dedup exchange, the cap's hash order, or the shard mix
flips a row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from s2geometry_ray.functions.shuffle import (_seed_mix, _splitmix64,
                                              sql_splitmix64)
from s2geometry_ray.scale import derive_num_parts

N_IMAGES = 400
B_MIN = 127_000          # milli-brightness floor (~median: a real filter)
CUR_LEVEL = 5
CAP_K = 5
N_SHARDS = 8
CAP_SEED = 9
SHARD_SEED = 10


def _planted_images(n: int):
    """Base table ∪ exact duplicates of every 10th image under a new id
    (same bytes ⇒ same pixels/phash; DIFFERENT id ⇒ different geotag,
    so dedup selection genuinely picks a location)."""
    from s2geometry_ray.sources.synth import images_dataset

    base = images_dataset(n)

    def plant(t: pa.Table) -> pa.Table:
        ikey = np.array([int(s[3:]) for s in t["image_id"].to_pylist()],
                        dtype=np.int64)
        keep = t.filter(pa.array(ikey % 10 == 0))
        kid = [f"img{int(s[3:]) + 1_000_000:012d}"
               for s in keep["image_id"].to_pylist()]
        return keep.set_column(keep.schema.get_field_index("image_id"),
                               "image_id", pa.array(kid, type=pa.string()))

    return base.union(base.map_batches(plant, batch_format="pyarrow"))


def curate_images(_sf_dir: str, n: int = N_IMAGES):
    from s2geometry_ray.functions.shuffle import cap_per_group
    from s2geometry_ray.stages.cell_assign import make_cell_assign
    from s2geometry_ray.stages.decode import CurateActor

    feats = _planted_images(n).map_batches(
        CurateActor, batch_size=128, concurrency=2, num_cpus=1,
        batch_format="pyarrow")
    feats = feats.map_batches(
        lambda t: t.filter(pc.greater_equal(t["bmilli"], B_MIN)),
        batch_format="pyarrow", batch_size=None)
    assigned = feats.map_batches(make_cell_assign(levels=(CUR_LEVEL,)),
                                 batch_format="pyarrow", batch_size=None)

    n_parts = derive_num_parts(n + n // 10, rows_per_part=100_000)

    def keyed(t: pa.Table) -> pa.Table:
        cell = (t[f"cell_l{CUR_LEVEL}"].to_numpy(zero_copy_only=False)
                .view(np.int64))
        ph = t["phash"].to_numpy(zero_copy_only=False)
        part = (ph.view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "ikey": t["ikey"], "phash": t["phash"], "bmilli": t["bmilli"],
            "cell_bits": pa.array(cell), "part": pa.array(part),
        })

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["phash", "ikey"], kind="mergesort")
        return g.drop_duplicates("phash", keep="first") \
                .drop(columns=["part"])

    deduped = (assigned.map_batches(keyed, batch_format="pyarrow",
                                    batch_size=None)
               .groupby("part").map_groups(dedup, batch_format="pandas"))

    capped = cap_per_group(deduped, "cell_bits", CAP_K, key_col="ikey",
                           seed=CAP_SEED, n_rows_hint=n + n // 10)

    shard_mix = np.uint64(_seed_mix(SHARD_SEED))

    def finalize(t: pa.Table) -> pa.Table:
        ikey = t["ikey"].to_numpy(zero_copy_only=False)
        shard = (_splitmix64(ikey.astype(np.uint64) ^ shard_mix)
                 % np.uint64(N_SHARDS)).astype(np.int64)
        return pa.table({
            "ikey": t["ikey"],
            "cell_id": pa.array(
                t["cell_bits"].to_numpy(zero_copy_only=False)
                .view(np.uint64), type=pa.uint64()),
            "bmilli": t["bmilli"],
            "shard": pa.array(shard),
        })

    return capped.map_batches(finalize, batch_format="pyarrow",
                              batch_size=None)


def _u64_key_sql(expr: str) -> str:
    """Non-negative BIGINT → UBIGINT for the splitmix chain."""
    return f"CAST({expr} AS UBIGINT)"


def curate_images_sql(n: int = N_IMAGES) -> str:
    from s2geometry_ray.functions.cellid_sql import cell_id_ctes, parent_sql
    from s2geometry_ray.kernels import codecs
    from s2geometry_ray.sources.synth import derive_latlng, gen_image_row

    def dbl(v: float) -> str:
        return f"CAST('{float(v)!r}' AS DOUBLE)"

    vals = []
    for i in range(n):
        r = gen_image_row(i, with_bytes=True)
        px = codecs.decode(r["bytes"], r["fmt"])
        bmilli = int(px.astype(np.int64).sum()) * 1000 \
            // (3 * px.shape[0] * px.shape[1])
        keys = [i] + ([i + 1_000_000] if i % 10 == 0 else [])
        for k in keys:
            lat, lng = derive_latlng(f"img{k:012d}")
            vals.append(f"({k}, {dbl(lat)}, {dbl(lng)}, "
                        f"{int(r['phash'])}, {bmilli})")
    imgs = ("(VALUES " + ", ".join(vals)
            + ") AS imgs(ikey, lat, lng, phash, bmilli)")
    ctes = cell_id_ctes("lat", "lng", key="ikey", table=imgs,
                        extra_cols=", phash, bmilli")
    cap_h = sql_splitmix64(
        f"xor({_u64_key_sql('ikey')}, {_seed_mix(CAP_SEED)})")
    shard_h = sql_splitmix64(
        f"xor({_u64_key_sql('ikey')}, {_seed_mix(SHARD_SEED)})")
    return ctes + f""",
d AS (
  SELECT ikey, phash, bmilli, {parent_sql('cell_id', CUR_LEVEL)} AS cell
  FROM cell WHERE bmilli >= {B_MIN}),
dd AS (
  SELECT * FROM d
  QUALIFY row_number() OVER (PARTITION BY phash ORDER BY ikey) = 1),
cc AS (
  SELECT * FROM dd
  QUALIFY row_number() OVER (PARTITION BY cell
                             ORDER BY {cap_h}, ikey) <= {CAP_K})
SELECT CAST(ikey AS BIGINT) AS ikey,
       cell AS cell_id,
       CAST(bmilli AS BIGINT) AS bmilli,
       CAST({shard_h} % {N_SHARDS} AS BIGINT) AS shard
FROM cc
"""
