"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware) with x64 enabled so numerical oracles match the
reference's float64 accuracy envelope (the reference C++ core is float64
throughout).  Must run before anything imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Apply-mode constant-lifting misses are hard errors under test: an operator
# creating fresh host buffers at trace time would otherwise silently embed
# problem data as jit constants (and serve stale data after update_problem).
os.environ.setdefault("EPSILON_TPU_STRICT_LIFTING", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (TPU tunnel) and the plugin
# re-registers itself even when the env var is overridden, so force the
# platform via config too: unit tests must run on true-f64 CPU (the axon
# backend emulates f64 as double-f32 with f32 dynamic range).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
