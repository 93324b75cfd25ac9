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


# Inner tolerance for iteratively-certified prox kernels (TV-1D PDAS):
# None -> sqrt-precision default per dtype (ops/prox/tv1d.default_tv_tol).
# The solvers tie this to their own rel_tol at trace time (a 1e-3 outer
# solve must not pay for 1e-14 inner certificates — VERDICT r2 item 7);
# the jitted-step cache is keyed by rel_tol, so the baked value is always
# consistent with the trace.
_PROX_INNER_TOL = None


def prox_inner_tol():
    return _PROX_INNER_TOL


def set_prox_inner_tol(tol):
    global _PROX_INNER_TOL
    _PROX_INNER_TOL = tol


def prox_inner_tol_for(rel_tol: float):
    """Inner certificate tolerance tied to an outer solver tolerance:
    one decade tighter than the outer rel_tol, floored at the dtype's
    *certifiable* sqrt-precision (1e-7 f64 / 3e-4 f32).  Flooring at a
    fixed 1e-7 made the f32 PDAS gap target unreachable for any
    rel_tol <= 3e-3, firing the uncertified warning spuriously (round-3
    advisor finding)."""
    if rel_tol is None or rel_tol <= 0:
        return None
    from .ops.prox.tv1d import default_tv_tol  # local: avoids import cycle
    return max(0.1 * rel_tol, default_tv_tol(default_dtype()))


def strict_lifting() -> bool:
    """When on, apply-mode ``linop._to_device`` of a host array that the
    collect pass never saw is a hard error instead of silently embedding the
    data as a jit constant (which would also serve stale data after
    ``update_problem``).  Enabled in the test suite; off in production where
    a one-off small constant embed is tolerable."""
    return os.environ.get("EPSILON_TPU_STRICT_LIFTING", "0") == "1"


def bucket_heaps_enabled() -> bool:
    """Memory-shard the heterogeneous term-bucket path: pack each bucket's
    lifted constants into per-device heap rows sharded along the term mesh
    (each device holds only its bucket's problem data at rest) instead of
    replicating every term's data on every device.  Default on; disable
    with EPSILON_TPU_BUCKET_HEAPS=0 to fall back to replicated constants."""
    return os.environ.get("EPSILON_TPU_BUCKET_HEAPS", "1") != "0"


def tv_warn_enabled() -> bool:
    """Emit a host-side warning (jax.debug.print) when an iteratively-
    certified prox kernel exits without meeting its gap tolerance.  Default
    on for CPU, off for TPU backends reached through tunnels that lack host
    send/recv callbacks (axon_pjrt rejects debug callbacks outright);
    override with EPSILON_TPU_TV_WARN=0/1."""
    if "EPSILON_TPU_TV_WARN" in os.environ:
        return os.environ["EPSILON_TPU_TV_WARN"] != "0"
    return jax.default_backend() == "cpu"


# Above this dimension, explicit-inverse factor applies stream the packed
# symmetric lower triangle through a Pallas kernel (halving HBM traffic —
# the apply is bandwidth-bound) instead of a full dense matmul.
SYM_PACKED_MIN_DIM = int(os.environ.get("EPSILON_TPU_SYM_PACKED_MIN", "8192"))


def use_sym_packed(n: int) -> bool:
    """Route a symmetric explicit-inverse apply of dimension n through the
    packed-triangle Pallas kernel (TPU backends only; the n^2/2 read is the
    whole win and only matters once the factor no longer fits in cache)."""
    force = os.environ.get("EPSILON_TPU_SYM_PACKED", "")
    if force == "0":
        return False
    if force == "1":   # force-on (CPU runs the kernel in interpret mode)
        return n >= SYM_PACKED_MIN_DIM
    return (use_explicit_inverse() and n >= SYM_PACKED_MIN_DIM
            and jax.default_backend() not in ("cpu",))


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
