"""Global configuration for the epsilon_tpu framework.

The reference (Epsilon) is float64 throughout its C++/Eigen core. On TPU,
float64 is emulated and slow, so the policy here is:

- On CPU (tests, oracles): enable x64 and run float64, matching the
  reference's accuracy envelope.
- On TPU: run float32 with float32 accumulation; ADMM is robust to this and
  reaches the 1e-3 relative tolerance targets used by the reference
  notebooks (see BASELINE.md).

``default_dtype()`` resolves what "real" means for the current JAX config.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# TPUs default matmuls to bf16 multiplication (fine for NN training, fatal
# for ADMM KKT solves: cached-inverse applications lose ~8 mantissa bits and
# the iteration diverges).  Force full f32 MXU passes; most of our matvecs
# are bandwidth-bound so the throughput cost is small.
if os.environ.get("EPSILON_TPU_MATMUL_PRECISION", "highest") != "default":
    jax.config.update(
        "jax_default_matmul_precision",
        os.environ.get("EPSILON_TPU_MATMUL_PRECISION", "highest"))

# Density / size thresholds at which a scipy.sparse operand is densified when
# frozen onto the device.  TPUs have no native sparse matmul; BCOO lowers to
# gather/scatter which is usually slower than a dense MXU matmul unless the
# matrix is both very large and very sparse.
SPARSE_DENSIFY_DENSITY = float(os.environ.get("EPSILON_TPU_DENSIFY_DENSITY", "0.01"))
SPARSE_DENSIFY_MAX_ELEMS = int(os.environ.get("EPSILON_TPU_DENSIFY_MAX_ELEMS", str(64 * 1024 * 1024)))


# How cached factorizations apply their solves on device:
#   "triangular" - cho/lu triangular solves (accurate; fast on CPU)
#   "inverse"    - explicit inverse computed host-side in f64, applied as a
#                  dense matmul (MXU-native; TPUs have no fast triangular
#                  solve, which otherwise serializes the hot loop)
#   "auto"       - "inverse" on TPU backends, "triangular" on CPU
FACTOR_SOLVE_MODE = os.environ.get("EPSILON_TPU_FACTOR_SOLVE", "auto")


def use_explicit_inverse() -> bool:
    if FACTOR_SOLVE_MODE == "inverse":
        return True
    if FACTOR_SOLVE_MODE == "triangular":
        return False
    return jax.default_backend() not in ("cpu",)


def x64_enabled() -> bool:
    return bool(jax.config.read("jax_enable_x64"))


def default_dtype() -> jnp.dtype:
    """Float dtype used for solver state and frozen constants."""
    return jnp.float64 if x64_enabled() else jnp.float32


def default_np_dtype() -> np.dtype:
    return np.float64 if x64_enabled() else np.float32
