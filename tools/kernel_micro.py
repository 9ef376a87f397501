"""Micro-benchmark: reference-style scalar S2 vs this engine.

The reference is a single-threaded geometry library; its per-call cost
is what any driver-side loop over it would pay.  Our scalar oracle is a
faithful stand-in (same formulas, same per-value call shape).  This
tool measures leaf-cell assignment throughput three ways:

    python tools/kernel_micro.py          # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from s2geometry_ray.kernels import cellid as vk
    from s2geometry_ray.oracle import s2 as o

    rng = np.random.default_rng(5)
    lat = rng.uniform(-90, 90, 200_000)
    lng = rng.uniform(-180, 180, 200_000)

    # scalar (reference-style, single-threaded)
    n_scalar = 20_000
    t0 = time.time()
    for k in range(n_scalar):
        o.from_lat_lng(float(lat[k]), float(lng[k]))
    scalar_rps = n_scalar / (time.time() - t0)

    # vectorized single-thread
    vk.from_latlng(lat[:1000], lng[:1000])
    t0 = time.time()
    vk.from_latlng(lat, lng)
    vec_rps = len(lat) / (time.time() - t0)

    # host-state probe: this VM's memory bandwidth swings ~3× with
    # hypervisor contention (BASELINE.md "Host-variance calibration");
    # u64_add_sec normalizes wall-clock comparisons across rounds
    x = np.arange(12_000_000, dtype=np.uint64)
    y = x.copy()
    t0 = time.time()
    for _ in range(10):
        x + y
    probe = time.time() - t0

    print(json.dumps({
        "metric": "leaf_cell_assignment_rows_per_sec",
        "scalar_reference_style_single_thread": round(scalar_rps),
        "vectorized_single_thread": round(vec_rps),
        "vectorized_speedup": round(vec_rps / scalar_rps, 1),
        "host_probe_u64_add_12m_x10_sec": round(probe, 3),
        "note": "distributed 32-CPU flagship joins 5-6M rows/s end-to-end "
                "(cell assign + covering join + aggregate) — bench_results/round1.json",
    }))


if __name__ == "__main__":
    main()
