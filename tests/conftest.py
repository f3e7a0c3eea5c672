"""Test configuration: force an 8-virtual-device CPU backend.

Tests run on CPU JAX with 8 virtual devices so multi-chip sharding code
is exercised without TPU hardware; must run before jax is imported.
"""
import os

# Force CPU even when the environment pins another platform (e.g. a
# tunneled TPU): tests must be hermetic and exercise the virtual mesh.
# A sitecustomize may have pre-registered a TPU plugin, so the config
# update (which wins over env) is applied as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_random_pose(rng, img_w=640, img_h=640, scale_range=(50.0, 150.0)):
    """Procedurally generated human-shaped skeleton, mirroring the
    reference benchmark fixture (reference: src/benchmark.cpp:19-66):
    fixed per-keypoint offsets from a random center, random scale."""
    offsets = np.array([
        (0.0, -0.45), (-0.05, -0.5), (0.05, -0.5), (-0.1, -0.48),
        (0.1, -0.48), (-0.2, -0.3), (0.2, -0.3), (-0.25, -0.1),
        (0.25, -0.1), (-0.25, 0.1), (0.25, 0.1), (-0.15, 0.05),
        (0.15, 0.05), (-0.15, 0.3), (0.15, 0.3), (-0.15, 0.5), (0.15, 0.5),
    ], dtype=np.float32)
    cx = rng.uniform(100, img_w - 100)
    cy = rng.uniform(100, img_h - 100)
    s = rng.uniform(*scale_range)
    pose = np.zeros((17, 3), np.float32)
    pose[:, 0] = cx + offsets[:, 0] * s
    pose[:, 1] = cy + offsets[:, 1] * s
    pose[:, 2] = rng.uniform(0.5, 1.0, size=17)
    return pose


@pytest.fixture
def random_pose_factory(rng):
    return lambda **kw: make_random_pose(rng, **kw)
