"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharded code paths are
exercised on fake CPU devices per SURVEY.md §4 ("multi-node testing").
Must run before jax initialises, hence module import side effects here.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
