"""Solver parameters (mirrors ``proto/epsilon/solver_params.proto``)."""

from __future__ import annotations

import dataclasses
import enum


class SolverKind(enum.Enum):
    PROX_ADMM = "prox_admm"                      # solver_params.proto:64
    PROX_ADMM_TWO_BLOCK = "prox_admm_two_block"  # solver_params.proto:65


@dataclasses.dataclass
class SolverParams:
    # stopping criteria (solver_params.proto:26-28, :7)
    rel_tol: float = 1e-2
    abs_tol: float = 1e-4
    max_iterations: int = 10000
    # algorithm parameters (solver_params.proto:36-39)
    rho: float = 1.0
    # over-relaxation alpha in (0, 2): x_hat = alpha*x + (1-alpha)*z in the
    # z/u updates (Boyd et al. sec. 3.4.3); 1.0 = plain ADMM
    over_relaxation: float = 1.0
    # residual-balancing adaptive rho (Boyd et al. sec. 3.4.1), two-block
    # solver only: rho is carried in the jitted loop state; prox applies are
    # rho-parameterized (eigendecomposition caches instead of Cholesky) so
    # rho changes cost nothing.  rho grows by rho_tau when the primal
    # residual exceeds rho_mu times the dual residual, and vice versa.
    adaptive_rho: bool = False
    rho_mu: float = 10.0
    rho_tau: float = 2.0
    epoch_iterations: int = 10
    log_iterations: int = 100
    # compiler toggle (solver_params.proto:60)
    use_epigraph: bool = True
    solver: SolverKind = SolverKind.PROX_ADMM_TWO_BLOCK
    # warm start (solver_params.proto:69-70)
    warm_start: bool = False
    verbose: bool = False
    # 'device': whole solve is one jitted while_loop (fastest);
    # 'host': python epoch loop with logging/callbacks per epoch.
    drive: str = "device"
    # Term sharding (two-block solver): a 1-D jax.sharding.Mesh over which
    # prox TERMS are partitioned into per-device buckets (heterogeneous
    # dispatch via lax.switch on the device index inside shard_map); the
    # x-update runs one bucket per device and psum combines contributions.
    # None = single device. This is the scale-out path for problems whose
    # objective has many terms (the consensus solver in parallel/ covers
    # the many-scenario-blocks case).
    mesh: object = None

    def __post_init__(self):
        if isinstance(self.solver, str):
            self.solver = SolverKind(self.solver)
