"""Shared pytest fixtures.  Ray is initialised ONCE per session."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def sample_sphere(rng, n: int) -> np.ndarray:
    """Uniform points on the unit sphere (area-uniform via z, lng)."""
    z = rng.uniform(-1.0, 1.0, n)
    t = rng.uniform(-np.pi, np.pi, n)
    r = np.sqrt(1.0 - z * z)
    return np.stack([r * np.cos(t), r * np.sin(t), z], axis=1)
