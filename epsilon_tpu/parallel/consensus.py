"""Sharded consensus ADMM over a TPU device mesh.

This is the realization of the reference's vestigial distributed mode
(``solver_params.proto:42-56`` consensus knobs, ``solver.proto:51-59``
ConsensusResiduals, ``solver.proto:17`` num_workers — all dead code there)
as a first-class TPU-native solver, per the two-block consensus structure
(``prox_admm_two_block.h:15-25``): the x-update over scenario blocks is
embarrassingly parallel, so blocks shard across the mesh with ``shard_map``;
the two reductions ADMM needs per iteration — the consensus average and the
residual norms — are ``psum`` collectives riding ICI (DCN across hosts).

    minimize  sum_i f_i(x_i) + g(z)   s.t.  x_i = z  for all blocks i

- ``local_prox(v, data_i)``  computes argmin f_i(x) + rho/2 ||x - v||^2,
  vmapped over the blocks resident on each device.
- ``global_prox(v)``         computes argmin g(z) + (S*rho/2)||z - v||^2.

Everything (the whole iteration loop) is one jitted computation per solve.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import config

__all__ = ["ConsensusADMM", "ConsensusResult", "consensus_lasso_solver",
           "block_mesh"]


def block_mesh(n_devices: Optional[int] = None, axis_name: str = "blocks") -> Mesh:
    """1-D device mesh over the block axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


@dataclasses.dataclass
class ConsensusResult:
    z: jnp.ndarray
    iterations: int
    r_norm: float
    s_norm: float
    converged: bool
    # per-epoch (r_norm, s_norm) residual series — observability parity with
    # the main solver's status.series (≙ ``prox_admm.cc:219-230`` log lines)
    series: Optional[np.ndarray] = None


class ConsensusADMM:
    """Scenario-sharded consensus ADMM.

    Args:
      local_prox: (v, data) -> x, the per-block prox at penalty rho; applied
        under vmap to the on-device slice of blocks.
      global_prox: (v,) -> z, prox of the global regularizer at S*rho.
      data: pytree of arrays with leading block axis S (sharded over mesh).
      n: dimension of the consensus variable z.
      mesh: jax.sharding.Mesh with one axis (the block axis); None = single
        device (no collectives, same math).
    """

    def __init__(self, local_prox: Callable, global_prox: Callable,
                 data, S: int, n: int, rho: float = 1.0,
                 mesh: Optional[Mesh] = None, axis_name: str = "blocks",
                 rel_tol: float = 1e-3, abs_tol: float = 1e-6,
                 max_iterations: int = 10000, epoch_iterations: int = 10,
                 local_update: Optional[Callable] = None,
                 adaptive_rho: bool = False, rho_mu: float = 10.0,
                 rho_tau: float = 2.0, over_relaxation: float = 1.0):
        # optional fused override: (data, x, u, z[, rho]) -> (x, sum(x+u));
        # used by the Pallas-backed consensus lasso path.
        # adaptive_rho: residual balancing (Boyd et al. sec. 3.4.1) — rho is
        # carried in the solver state and local/global proxes must accept it
        # as a trailing argument (use eigendecomposition-based factors so
        # rho changes are free).
        self.local_update = local_update
        self.adaptive_rho = adaptive_rho
        self.rho_mu, self.rho_tau = rho_mu, rho_tau
        self.over_relaxation = over_relaxation
        self.local_prox = local_prox
        self.global_prox = global_prox
        self.S, self.n = S, n
        self.rho = rho
        self.mesh = mesh
        self.axis_name = axis_name
        self.rel_tol, self.abs_tol = rel_tol, abs_tol
        self.max_iterations = max_iterations
        self.epoch_iterations = epoch_iterations

        if mesh is not None:
            n_dev = mesh.devices.size
            if S % n_dev:
                raise ValueError(f"S={S} not divisible by mesh size {n_dev}")
            spec = P(axis_name)
            self.data = jax.device_put(
                data, NamedSharding(mesh, spec))
        else:
            self.data = data
        self._compiled = None

    # -- one sharded iteration (traceable, runs under shard_map) ------------
    def _local_step(self, data, x, u, z, rho=None):
        """Executed per device on its block shard."""
        if self.local_update is not None:
            args = (data, x, u, z) + ((rho,) if self.adaptive_rho else ())
            x, xu_local = self.local_update(*args)
        elif self.adaptive_rho:
            v = z[None, :] - u
            x = jax.vmap(self.local_prox, in_axes=(0, 0, None))(v, data, rho)
            xu_local = jnp.sum(x + u, axis=0)
        else:
            v = z[None, :] - u
            x = jax.vmap(self.local_prox, in_axes=(0, 0))(v, data)
            xu_local = jnp.sum(x + u, axis=0)
        alpha = self.over_relaxation
        if alpha != 1.0:
            x_hat = alpha * x + (1.0 - alpha) * z[None, :]
            xu_local = jnp.sum(x_hat + u, axis=0)
        else:
            x_hat = x
        if self.mesh is not None:
            xu_sum = jax.lax.psum(xu_local, self.axis_name)
        else:
            xu_sum = xu_local
        if self.adaptive_rho:
            z_new = self.global_prox(xu_sum / self.S, rho)
        else:
            z_new = self.global_prox(xu_sum / self.S)
        u_new = u + x_hat - z_new[None, :]
        # residual pieces
        r_sq_local = jnp.sum((x - z_new[None, :]) ** 2)
        x_sq_local = jnp.sum(x * x)
        u_sq_local = jnp.sum(u_new * u_new)
        if self.mesh is not None:
            r_sq = jax.lax.psum(r_sq_local, self.axis_name)
            x_sq = jax.lax.psum(x_sq_local, self.axis_name)
            u_sq = jax.lax.psum(u_sq_local, self.axis_name)
        else:
            r_sq, x_sq, u_sq = r_sq_local, x_sq_local, u_sq_local
        return x, u_new, z_new, (r_sq, x_sq, u_sq)

    def _epoch(self, data, state):
        """One epoch of sweeps + residuals.  The dual residual uses the
        FINAL sweep's ``z - z_prev`` (one extra z carried through the
        fori_loop), matching the reference's per-iteration ``z_prev_ = z_``
        snapshot (``prox_admm_two_block.cc:101,135-156``) and the main
        solver's epoch-tail fix (``admm.py _epoch``) — an epoch-start delta
        inflates s_norm ~E-fold near convergence and delays declared
        convergence by whole epochs at tight tolerances."""
        x, u, z, rho = state
        zero = jnp.zeros((), dtype=z.dtype)

        def body(_, carry):
            x, u, z, _stats, _zp = carry
            zp = z
            x, u, z, stats = self._local_step(data, x, u, z, rho)
            return x, u, z, stats, zp

        x, u, z, stats, z_prev = jax.lax.fori_loop(
            0, self.epoch_iterations, body,
            (x, u, z, (zero, zero, zero), z))
        r_sq, x_sq, u_sq = stats
        r_norm = jnp.sqrt(r_sq)
        s_norm = rho * jnp.sqrt(jnp.asarray(self.S, z.dtype)) \
            * jnp.linalg.norm(z - z_prev)
        sqrt_n = float(np.sqrt(self.S * self.n))
        eps_p = self.abs_tol * sqrt_n + self.rel_tol * jnp.maximum(
            jnp.sqrt(x_sq), jnp.sqrt(jnp.asarray(self.S, z.dtype))
            * jnp.linalg.norm(z))
        eps_d = self.abs_tol * sqrt_n + self.rel_tol * rho * jnp.sqrt(u_sq)
        conv = (r_norm <= eps_p) & (s_norm <= eps_d)

        if self.adaptive_rho:
            # residual balancing: keep ||r|| and ||s|| within a factor mu,
            # rescaling the scaled dual u when rho changes
            mu, tau = self.rho_mu, self.rho_tau
            grow = r_norm > mu * s_norm
            shrink = s_norm > mu * r_norm
            factor = jnp.where(grow, tau, jnp.where(shrink, 1.0 / tau, 1.0))
            rho = rho * factor
            u = u / factor

        return (x, u, z, rho), jnp.stack([r_norm, s_norm]), conv

    def _build(self):
        epoch_iters = self.epoch_iterations
        max_epochs = max(1, self.max_iterations // epoch_iters)

        def run(data, state):
            def cond(carry):
                _, it, _, conv, _buf = carry
                return (~conv) & (it < max_epochs * epoch_iters)

            def body(carry):
                state, it, _, _, buf = carry
                state, res, conv = self._epoch(data, state)
                # fixed-length per-epoch residual series buffer (device
                # drive observability, ≙ admm.py's series_buf)
                buf = jax.lax.dynamic_update_index_in_dim(
                    buf, res, it // epoch_iters, 0)
                return state, it + epoch_iters, res, conv, buf

            zero = jnp.zeros((), dtype=state[2].dtype)
            carry = (state, jnp.asarray(0), jnp.stack([zero, zero]),
                     jnp.asarray(False),
                     jnp.zeros((max_epochs, 2), dtype=state[2].dtype))
            return jax.lax.while_loop(cond, body, carry)

        if self.mesh is not None:
            spec = P(self.axis_name)
            rep = P()
            state_specs = (spec, spec, rep, rep)
            data_spec = jax.tree_util.tree_map(lambda _: spec, self.data)
            run = jax.shard_map(
                run, mesh=self.mesh,
                in_specs=(data_spec, state_specs),
                out_specs=((spec, spec, rep, rep), rep, rep, rep, rep),
                check_vma=False)
        return jax.jit(run)

    def init_state(self):
        dtype = config.default_dtype()
        x = jnp.zeros((self.S, self.n), dtype=dtype)
        u = jnp.zeros((self.S, self.n), dtype=dtype)
        z = jnp.zeros(self.n, dtype=dtype)
        rho = jnp.asarray(self.rho, dtype=dtype)
        if self.mesh is not None:
            sharding = NamedSharding(self.mesh, P(self.axis_name))
            x = jax.device_put(x, sharding)
            u = jax.device_put(u, sharding)
            rep = NamedSharding(self.mesh, P())
            z = jax.device_put(z, rep)
            rho = jax.device_put(rho, rep)
        return (x, u, z, rho)

    def solve(self, state=None) -> ConsensusResult:
        if self._compiled is None:
            self._compiled = self._build()
        if state is None:
            state = self.init_state()
        state, iters, res, conv, series_buf = self._compiled(self.data, state)
        state = jax.block_until_ready(state)
        self._last_state = state
        n_epochs = int(iters) // self.epoch_iterations
        return ConsensusResult(
            z=state[2], iterations=int(iters),
            r_norm=float(res[0]), s_norm=float(res[1]),
            converged=bool(conv),
            series=np.asarray(series_buf)[:n_epochs])


def consensus_lasso_solver(A_blocks, b_blocks, lam: float, rho: float = 1.0,
                           mesh: Optional[Mesh] = None,
                           use_pallas: str = "auto",
                           adaptive_rho: bool = False, **kwargs
                           ) -> ConsensusADMM:
    """Consensus lasso: minimize sum_i 1/2||A_i x - b_i||^2 + lam ||x||_1,
    blocks sharded over the mesh (BASELINE config[4]).

    Local prox = cached-Cholesky ridge solve (the factor-once/solve-many
    pattern of ``block_cholesky.cc``, batched over on-device blocks);
    global prox = soft threshold at lam/(S*rho).
    """
    A_blocks = jnp.asarray(A_blocks)
    b_blocks = jnp.asarray(b_blocks)
    S, m, n = A_blocks.shape

    # Precompute per-block Cholesky factors of (A'A + rho I): batched,
    # one-time, stays sharded with the data.
    AtA = jnp.einsum("smi,smj->sij", A_blocks, A_blocks)
    Atb = jnp.einsum("smi,sm->si", A_blocks, b_blocks)
    eye = jnp.eye(n, dtype=A_blocks.dtype)

    if adaptive_rho:
        # eigendecomposition-based factor cache: (A'A + rho I)^{-1} =
        # Q diag(1/(eig + rho)) Q^T, so rho changes are free (two extra
        # matmuls per apply instead of a refactorization)
        eig, Q = jnp.linalg.eigh(AtA)
        data = {"Q": Q, "eig": eig, "QtAtb": jnp.einsum("sij,si->sj", Q, Atb)}

        def local_prox(v, d, rho_t):
            w = d["QtAtb"] + rho_t * (d["Q"].T @ v)
            y = w / (d["eig"] + rho_t)
            return d["Q"] @ y

        thresh_scale = lam / S

        def global_prox(v, rho_t):
            t = thresh_scale / rho_t
            return jnp.sign(v) * jnp.maximum(jnp.abs(v) - t, 0.0)

        return ConsensusADMM(local_prox, global_prox, data, S, n, rho=rho,
                             mesh=mesh, adaptive_rho=True, **kwargs)
    if config.use_explicit_inverse():
        # factor-once as explicit inverses: the per-iteration solve becomes
        # a batched MXU matmul (TPUs have no fast triangular solve).  The
        # inverse batch is computed on the HOST in f64: on-device
        # jnp.linalg.inv lowers to a vmapped LU whose triangular-solve
        # temps are O(S n^2 log n) HBM — it OOM'd a 16 GB chip at
        # S=40, n=5000 where the inverses themselves are only 4 GB
        dtype = AtA.dtype
        AtA_h = np.asarray(AtA, dtype=np.float64)
        Finv = jnp.asarray(
            np.linalg.inv(AtA_h + rho * np.eye(AtA.shape[-1])).astype(dtype))
        data = {"Finv": Finv, "Atb": Atb}

        def local_prox(v, d):
            return d["Finv"] @ (d["Atb"] + rho * v)
    else:
        L = jnp.linalg.cholesky(AtA + rho * eye)
        data = {"L": L, "Atb": Atb}

        def local_prox(v, d):
            rhs = d["Atb"] + rho * v
            y = jax.scipy.linalg.solve_triangular(d["L"], rhs, lower=True)
            return jax.scipy.linalg.solve_triangular(d["L"].T, y, lower=False)

    thresh = lam / (S * rho)

    def global_prox(v):
        return jnp.sign(v) * jnp.maximum(jnp.abs(v) - thresh, 0.0)

    local_update = None
    if config.use_explicit_inverse() and (
            use_pallas is True or
            (use_pallas == "auto" and jax.default_backend() not in ("cpu",))):
        from ..ops.pallas_kernels import fused_local_update, pallas_supported
        if pallas_supported(S, n):
            def local_update(d, x, u, z):
                return fused_local_update(d["Finv"], d["Atb"], u, z, rho)

    return ConsensusADMM(local_prox, global_prox, data, S, n, rho=rho,
                         mesh=mesh, local_update=local_update, **kwargs)
