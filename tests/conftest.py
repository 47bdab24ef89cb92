"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes its backends, hence the
os.environ mutation at import time (pytest imports conftest first).
"""

import os
import sys

# Force CPU even when the ambient environment selects a TPU platform.
# The harness pre-imports jax from sitecustomize with JAX_PLATFORMS=axon,
# so env mutation is too late — use jax.config.update (still before any
# backend initialization). XLA_FLAGS is read at backend init, so setting
# it here is in time for the 8-device virtual CPU mesh.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
