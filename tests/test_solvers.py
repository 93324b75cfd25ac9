"""End-to-end ADMM solver tests on hand-built prox-affine problems.

The compiled form of lasso (docs/index.rst:70-80):
    minimize sum_square(A x - b) + lam * norm_1(y)  s.t.  zero(x - y)
"""

import numpy as np
import pytest
import jax.numpy as jnp

from epsilon_tpu.ir import (AffineOperator, Cone, ConeConstraint,
                            ProxFunctionSpec, ProxKind, ProxProblem, ProxTerm,
                            arg_key)
from epsilon_tpu.ops import linop
from epsilon_tpu.ops.block import BlockMatrix, BlockVector
from epsilon_tpu.solvers import (ProxADMMSolver, ProxADMMTwoBlockSolver,
                                 SolverParams, SolverState, problem_objective)


def make_lasso_problem(A, b, lam):
    m, n = A.shape
    terms = [
        ProxTerm(
            spec=ProxFunctionSpec(kind=ProxKind.SUM_SQUARE, alpha=0.5),
            H=AffineOperator(
                BlockMatrix({(arg_key(0), "x"): linop.dense(A)}),
                BlockVector({arg_key(0): jnp.asarray(-b)}))),
        ProxTerm(
            spec=ProxFunctionSpec(kind=ProxKind.NORM_1, alpha=lam),
            H=AffineOperator(
                BlockMatrix({(arg_key(0), "y"): linop.identity(n)}),
                BlockVector())),
    ]
    cons = [ConeConstraint(
        cone=Cone.ZERO,
        op=AffineOperator(
            BlockMatrix({("c", "x"): linop.identity(n),
                         ("c", "y"): linop.scalar(-1.0, n)}),
            BlockVector()))]
    return ProxProblem(terms=terms, constraints=cons,
                       var_dims={"x": n, "y": n},
                       var_shapes={"x": (n, 1), "y": (n, 1)})


def lasso_oracle(A, b, lam):
    """High-accuracy oracle via sklearn coordinate descent."""
    from sklearn.linear_model import Lasso
    m = A.shape[0]
    # sklearn solves 1/(2m)||Ax-b||^2 + alpha||x||_1
    model = Lasso(alpha=lam / m, fit_intercept=False, tol=1e-12,
                  max_iter=100000)
    model.fit(A, b)
    return model.coef_


def _lasso_objective(A, b, lam, x):
    return 0.5 * np.sum((A @ x - b) ** 2) + lam * np.sum(np.abs(x))


@pytest.mark.parametrize("solver_cls", [ProxADMMTwoBlockSolver, ProxADMMSolver])
@pytest.mark.parametrize("drive", ["device", "host"])
def test_lasso(solver_cls, drive):
    rng = np.random.RandomState(0)
    m, n = 30, 15
    A = rng.randn(m, n)
    x_true = rng.randn(n) * (rng.rand(n) < 0.3)
    b = A @ x_true + 0.1 * rng.randn(m)
    lam = 0.5

    prob = make_lasso_problem(A, b, lam)
    params = SolverParams(rel_tol=1e-5, abs_tol=1e-7, max_iterations=5000,
                          drive=drive)
    solver = solver_cls(prob, params)
    sol = solver.solve()
    x = np.asarray(sol["x"])

    x_o = lasso_oracle(A, b, lam)
    obj_ours = _lasso_objective(A, b, lam, x)
    obj_oracle = _lasso_objective(A, b, lam, x_o)
    assert obj_ours <= obj_oracle + 1e-3 * abs(obj_oracle) + 1e-5, \
        f"{obj_ours} vs oracle {obj_oracle}"
    assert solver.status.state == SolverState.OPTIMAL
    assert solver.status.num_iterations > 0

    # objective evaluation matches (y carries the norm_1 term)
    obj_eval = float(problem_objective(prob, sol))
    np.testing.assert_allclose(obj_eval, obj_ours, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("solver_cls", [ProxADMMTwoBlockSolver, ProxADMMSolver])
def test_device_drive_populates_series(solver_cls):
    """Device drive must report the per-epoch residual series (reference's
    log_iterations observability, ``prox_admm.cc:219-230``), identical to
    host drive's."""
    rng = np.random.RandomState(3)
    m, n = 30, 15
    A = rng.randn(m, n)
    b = rng.randn(m)
    prob = make_lasso_problem(A, b, 0.5)

    results = {}
    for drive in ("device", "host"):
        solver = solver_cls(make_lasso_problem(A, b, 0.5),
                            SolverParams(rel_tol=1e-5, abs_tol=1e-7,
                                         max_iterations=5000, drive=drive))
        solver.solve()
        assert len(solver.status.series) == (
            solver.status.num_iterations // solver.params.epoch_iterations)
        results[drive] = solver.status.series
    assert len(results["device"]) == len(results["host"])
    for rd, rh in zip(results["device"], results["host"]):
        np.testing.assert_allclose(
            [rd.r_norm, rd.s_norm, rd.epsilon_primal, rd.epsilon_dual],
            [rh.r_norm, rh.s_norm, rh.epsilon_primal, rh.epsilon_dual],
            rtol=1e-8, atol=1e-12)


def test_epoch_tail_dual_residual():
    """s_norm must be the final sweep's rho*||z - z_prev|| — with
    epoch_iterations=E the reported s_norm at convergence must match a run
    with epoch_iterations=1 at the same iteration count scale (the old
    epoch-start delta was ~E times larger near convergence)."""
    rng = np.random.RandomState(4)
    m, n = 30, 15
    A = rng.randn(m, n)
    b = rng.randn(m)

    it_counts = {}
    for E in (1, 10):
        solver = ProxADMMTwoBlockSolver(
            make_lasso_problem(A, b, 0.5),
            SolverParams(rel_tol=1e-6, abs_tol=1e-8, max_iterations=5000,
                         epoch_iterations=E, drive="host"))
        solver.solve()
        assert solver.status.state == SolverState.OPTIMAL
        it_counts[E] = solver.status.num_iterations
    # epoch-granular checking can only overshoot by < one epoch
    assert it_counts[10] <= it_counts[1] + 10


def test_two_block_warm_start():
    rng = np.random.RandomState(1)
    m, n = 20, 10
    A = rng.randn(m, n)
    b = rng.randn(m)
    prob = make_lasso_problem(A, b, 0.3)
    params = SolverParams(rel_tol=1e-6, abs_tol=1e-8, max_iterations=4000,
                          warm_start=True)
    solver = ProxADMMTwoBlockSolver(prob, params)
    solver.solve()
    iters_cold = solver.status.num_iterations
    solver.solve()
    iters_warm = solver.status.num_iterations
    assert iters_warm <= max(iters_cold // 2, 2 * params.epoch_iterations)


def test_nonneg_least_squares():
    """min 1/2||Ax - b||^2 s.t. x >= 0 via NON_NEGATIVE prox term."""
    rng = np.random.RandomState(2)
    m, n = 25, 8
    A = rng.randn(m, n)
    b = rng.randn(m)
    terms = [
        ProxTerm(spec=ProxFunctionSpec(kind=ProxKind.SUM_SQUARE, alpha=0.5),
                 H=AffineOperator(
                     BlockMatrix({(arg_key(0), "x"): linop.dense(A)}),
                     BlockVector({arg_key(0): jnp.asarray(-b)}))),
        ProxTerm(spec=ProxFunctionSpec(kind=ProxKind.NON_NEGATIVE),
                 H=AffineOperator(
                     BlockMatrix({(arg_key(0), "y"): linop.identity(n)}),
                     BlockVector())),
    ]
    cons = [ConeConstraint(
        cone=Cone.ZERO,
        op=AffineOperator(
            BlockMatrix({("c", "x"): linop.identity(n),
                         ("c", "y"): linop.scalar(-1.0, n)}),
            BlockVector()))]
    prob = ProxProblem(terms=terms, constraints=cons,
                       var_dims={"x": n, "y": n},
                       var_shapes={"x": (n, 1), "y": (n, 1)})
    solver = ProxADMMTwoBlockSolver(
        prob, SolverParams(rel_tol=1e-6, abs_tol=1e-9, max_iterations=5000))
    sol = solver.solve()
    x = np.asarray(sol["x"])

    import scipy.optimize
    x_o, _ = scipy.optimize.nnls(A, b)
    obj = lambda z: 0.5 * np.sum((A @ z - b) ** 2)
    assert np.all(x >= -1e-5)
    assert obj(np.maximum(x, 0)) <= obj(x_o) + 1e-4 * (1 + abs(obj(x_o)))


def test_equality_constrained_ls():
    """min 1/2||Ax-b||^2 s.t. Cx = d: single sum_square term + zero cone
    with offset."""
    rng = np.random.RandomState(3)
    m, n, p = 20, 10, 3
    A = rng.randn(m, n)
    b = rng.randn(m)
    C = rng.randn(p, n)
    d = rng.randn(p)
    terms = [ProxTerm(
        spec=ProxFunctionSpec(kind=ProxKind.SUM_SQUARE, alpha=0.5),
        H=AffineOperator(BlockMatrix({(arg_key(0), "x"): linop.dense(A)}),
                         BlockVector({arg_key(0): jnp.asarray(-b)})))]
    # constraint C x - d = 0
    cons = [ConeConstraint(
        cone=Cone.ZERO,
        op=AffineOperator(BlockMatrix({("c", "x"): linop.dense(C)}),
                          BlockVector({"c": jnp.asarray(-d)})))]
    prob = ProxProblem(terms=terms, constraints=cons, var_dims={"x": n},
                       var_shapes={"x": (n, 1)})
    solver = ProxADMMTwoBlockSolver(
        prob, SolverParams(rel_tol=1e-7, abs_tol=1e-9, max_iterations=10000))
    sol = solver.solve()
    x = np.asarray(sol["x"])

    # KKT oracle
    K = np.block([[A.T @ A, C.T], [C, np.zeros((p, p))]])
    rhs = np.concatenate([A.T @ b, d])
    x_o = np.linalg.solve(K, rhs)[:n]
    np.testing.assert_allclose(C @ x, d, atol=1e-4)
    np.testing.assert_allclose(x, x_o, atol=1e-3)


def test_over_relaxation_speeds_convergence():
    rng = np.random.RandomState(4)
    m, n = 25, 12
    A = rng.randn(m, n)
    b = rng.randn(m)
    prob = make_lasso_problem(A, b, 0.4)
    plain = ProxADMMTwoBlockSolver(
        prob, SolverParams(rel_tol=1e-7, abs_tol=1e-10, max_iterations=20000))
    plain.solve()
    it_plain = plain.status.num_iterations

    prob2 = make_lasso_problem(A, b, 0.4)
    relaxed = ProxADMMTwoBlockSolver(
        prob2, SolverParams(rel_tol=1e-7, abs_tol=1e-10, max_iterations=20000,
                            over_relaxation=1.7))
    x = relaxed.solve()
    it_relax = relaxed.status.num_iterations
    assert it_relax < it_plain
    # solution still correct
    x_o = lasso_oracle(A, b, 0.4)
    assert _lasso_objective(A, b, 0.4, np.asarray(x["x"])) <= \
        _lasso_objective(A, b, 0.4, x_o) * (1 + 1e-3) + 1e-6
