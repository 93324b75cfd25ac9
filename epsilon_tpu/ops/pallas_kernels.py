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

__all__ = ["fused_local_update", "local_update_reference", "pallas_supported"]


def local_update_reference(Finv, Atb, u, z, rho):
    """Plain jnp reference: x, sum(x+u)."""
    v = z[None, :] - u
    x = jnp.einsum("sij,sj->si", Finv, Atb + rho * v)
    xu_sum = jnp.sum(x + u, axis=0)
    return x, xu_sum


def pallas_supported(S: int, n: int) -> bool:
    """Mosaic requires the last two block dims to tile (8, 128) or equal the
    array dims; our blocks use full trailing dims, so any n is legal, but
    tiny n wastes the MXU — keep the jnp path below 128."""
    return n >= 128


def _make_kernel(rho):
    def _kernel(z_ref, Finv_ref, Atb_ref, u_ref, x_ref, xu_ref):
        """One grid step = one scenario block.

        Shapes (as blocks): z (1, n); Finv (1, n, n); Atb/u/x (1, 1, n);
        xu accumulator (1, n); rho is a trace-time constant.
        """
        s = pl.program_id(0)
        u = u_ref[0, 0]
        v = z_ref[0] - u
        rhs = Atb_ref[0, 0] + rho * v
        # (n, n) @ (n, 1) on the MXU
        x = jnp.dot(Finv_ref[0], rhs[:, None],
                    preferred_element_type=jnp.float32)[:, 0]
        x_ref[0, 0] = x

        @pl.when(s == 0)
        def _():
            xu_ref[0] = jnp.zeros_like(xu_ref[0])

        xu_ref[0] += x + u

    return _kernel


@partial(jax.jit, static_argnames=("rho", "interpret"))
def fused_local_update(Finv, Atb, u, z, rho, interpret: bool = False):
    """Fused consensus local update over the leading block axis.

    Args: Finv (S, n, n), Atb (S, n), u (S, n), z (n,), rho scalar.
    Returns: x (S, n), xu_sum (n,).
    """
    S, n = Atb.shape
    z2 = z[None, :]                      # (1, n)
    Atb3 = Atb[:, None, :]               # (S, 1, n)
    u3 = u[:, None, :]
    grid = (S,)
    x, xu = pl.pallas_call(
        _make_kernel(float(rho)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n), lambda s: (0, 0)),          # z (replicated)
            pl.BlockSpec((1, n, n), lambda s: (s, 0, 0)),    # Finv block
            pl.BlockSpec((1, 1, n), lambda s: (s, 0, 0)),    # Atb block
            pl.BlockSpec((1, 1, n), lambda s: (s, 0, 0)),    # u block
        ],
        out_specs=[
            pl.BlockSpec((1, 1, n), lambda s: (s, 0, 0)),    # x block
            pl.BlockSpec((1, n), lambda s: (0, 0)),          # xu accumulator
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, 1, n), Finv.dtype),
            jax.ShapeDtypeStruct((1, n), Finv.dtype),
        ],
        interpret=interpret,
    )(z2, Finv, Atb3, u3)
    return x[:, 0, :], xu[0]
