"""Pallas TPU kernels for the consensus ADMM hot loop.

The consensus x-update chain — per block i:

    x_i   = Finv_i @ (Atb_i + rho (z - u_i))      (batched matvec, MXU)
    acc  += x_i + u_i                             (consensus partial sum)

— is bandwidth-bound: Finv_i (n x n) dominates traffic and everything else
is elementwise.  The fused kernel streams each block's factor through VMEM
once and produces x, the consensus partial sum, and the residual partial
sums in a single pass, instead of XLA's separate batched-matmul +
reduction kernels.

Used by :class:`epsilon_tpu.parallel.consensus.ConsensusADMM` when the
block shapes align to TPU tiles; callers fall back to the jnp path
otherwise.  Tests run the same kernel in interpreter mode on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["fused_local_update", "local_update_reference"]


def local_update_reference(Finv, Atb, u, z, rho):
    """Plain jnp reference: x, sum(x+u), per-element accumulators."""
    v = z[None, :] - u
    x = jnp.einsum("sij,sj->si", Finv, Atb + rho * v)
    xu_sum = jnp.sum(x + u, axis=0)
    return x, xu_sum


def _kernel(z_ref, Finv_ref, Atb_ref, u_ref, rho_ref,
            x_ref, xu_ref):
    """One grid step = one block. Refs:
    z (n,), Finv (n, n), Atb (n,), u (n,) -> x (n,), xu partial (n,).
    """
    s = pl.program_id(0)
    rho = rho_ref[0]
    u = u_ref[0]
    v = z_ref[:] - u
    rhs = Atb_ref[0] + rho * v
    # (n, n) @ (n, 1) on the MXU
    x = jnp.dot(Finv_ref[0], rhs[:, None],
                preferred_element_type=jnp.float32)[:, 0]
    x_ref[0] = x

    @pl.when(s == 0)
    def _():
        xu_ref[:] = jnp.zeros_like(xu_ref)

    xu_ref[:] += x + u


@partial(jax.jit, static_argnames=("interpret",))
def fused_local_update(Finv, Atb, u, z, rho, interpret: bool = False):
    """Fused consensus local update over the leading block axis.

    Args: Finv (S, n, n), Atb (S, n), u (S, n), z (n,), rho scalar.
    Returns: x (S, n), xu_sum (n,).
    """
    S, n = Atb.shape
    rho_arr = jnp.asarray([rho], dtype=Finv.dtype)
    grid = (S,)
    x, xu = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n,), lambda s: (0,)),            # z (replicated)
            pl.BlockSpec((1, n, n), lambda s: (s, 0, 0)),  # Finv block
            pl.BlockSpec((1, n), lambda s: (s, 0)),        # Atb block
            pl.BlockSpec((1, n), lambda s: (s, 0)),        # u block
            pl.BlockSpec((1,), lambda s: (0,)),            # rho
        ],
        out_specs=[
            pl.BlockSpec((1, n), lambda s: (s, 0)),        # x block
            pl.BlockSpec((n,), lambda s: (0,)),            # xu accumulator
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, n), Finv.dtype),
            jax.ShapeDtypeStruct((n,), Finv.dtype),
        ],
        interpret=interpret,
    )(z, Finv, Atb, u, rho_arr)
    return x, xu
