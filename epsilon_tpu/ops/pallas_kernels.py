"""Pallas TPU kernels for the ADMM hot loops.

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

__all__ = ["fused_local_update", "local_update_reference", "pallas_supported",
           "pack_sym_tiles", "sym_packed_matmul"]


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


# ---------------------------------------------------------------------------
# Symmetric-packed apply: y = M @ x for symmetric M, reading only the lower
# triangle.
#
# Large cached KKT pivots (CholFactorOp explicit inverses,
# `ops/linop.py`) apply as dense n x n matvecs, whose cost at n >~ 8k is
# pure HBM traffic (reference equivalent: the cached LDL^T solve of
# `block_cholesky.cc:86-137`, which is CPU-sequential and has no TPU
# analogue).  The inverse is *symmetric*, so only the lower triangle
# (n^2/2 elements) needs to leave HBM: this kernel streams the packed
# lower-triangle tiles through VMEM once, applying each off-diagonal tile
# twice (as M_ij @ x_j into row-block i, and M_ij^T @ x_i into row-block
# j) — halving memory traffic vs the full dense matmul, which is a ~2x
# wall-clock win in the bandwidth-bound regime.
#
# Layout: x and y are held transposed, (R, n_pad), so the n axis lies on
# lanes and T-aligned lane slices are legal; both stay resident in VMEM
# across the whole grid while tiles stream by.
# ---------------------------------------------------------------------------

from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def pack_sym_tiles(M, tile: int = 256, dtype=None):
    """Pack the lower triangle of symmetric ``M`` (host numpy, n x n) into
    ``(tiles, ii, jj, n_pad)``: ``tiles[k]`` is the (tile x tile) block at
    block-coords ``(ii[k], jj[k])``, ``ii >= jj``, diagonal blocks first
    ordering not required.  Rows/cols are zero-padded to a tile multiple."""
    import numpy as np
    n = M.shape[0]
    B = -(-n // tile)
    n_pad = B * tile
    Mp = np.zeros((n_pad, n_pad), dtype=dtype or M.dtype)
    Mp[:n, :n] = M
    ks = [(i, j) for i in range(B) for j in range(i + 1)]
    tiles = np.stack([Mp[i * tile:(i + 1) * tile, j * tile:(j + 1) * tile]
                      for i, j in ks])
    ii = np.array([i for i, _ in ks], dtype=np.int32)
    jj = np.array([j for _, j in ks], dtype=np.int32)
    return tiles, ii, jj, n_pad


def _sym_kernel(ii_ref, jj_ref, tile_ref, x_ref, y_ref, *, acc_dtype):
    k = pl.program_id(0)
    T = tile_ref.shape[1]

    @pl.when(k == 0)
    def _():
        y_ref[:, :] = jnp.zeros_like(y_ref)

    i = ii_ref[k]
    j = jj_ref[k]
    t = tile_ref[0]                      # (T, T)
    xj = x_ref[:, pl.ds(j * T, T)]       # (R, T)
    # row-block i of y (transposed layout): y_i += (M_ij @ x_j)^T = x_j @ t^T
    contrib_i = jax.lax.dot_general(
        xj, t, (((1,), (1,)), ((), ())),
        preferred_element_type=acc_dtype).astype(y_ref.dtype)
    y_ref[:, pl.ds(i * T, T)] += contrib_i

    @pl.when(i != j)
    def _():
        xi = x_ref[:, pl.ds(i * T, T)]
        contrib_j = jax.lax.dot_general(
            xi, t, (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype).astype(y_ref.dtype)
        y_ref[:, pl.ds(j * T, T)] += contrib_j


@partial(jax.jit, static_argnames=("interpret",))
def sym_packed_matmul(tiles, ii, jj, x, interpret: bool = False):
    """``y = M @ x`` with M given as packed lower-triangle ``tiles`` at
    block coords ``(ii, jj)``.  ``x``: (n_pad, R); returns (n_pad, R).
    R is padded to 8 sublanes internally."""
    K, T, _ = tiles.shape
    n_pad, R = x.shape
    Rp = max(8, -(-R // 8) * 8)
    # accumulate at (at least) f32; f64 inputs keep f64 accumulation so the
    # kernel stays valid for f64 KKT inverses (round-2 advisor finding)
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    xt = jnp.zeros((Rp, n_pad), x.dtype).at[:R, :].set(x.T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, T, T), lambda k, ii, jj: (k, 0, 0)),
            pl.BlockSpec((Rp, n_pad), lambda k, ii, jj: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Rp, n_pad), lambda k, ii, jj: (0, 0)),
    )
    yt = pl.pallas_call(
        partial(_sym_kernel, acc_dtype=acc_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rp, n_pad), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(ii, jj, tiles, xt)
    return yt[:R, :].T
