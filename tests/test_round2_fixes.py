"""Round-2 fixes: rebuild guards, hook preservation, resume budget,
checkpoint fingerprinting, single-prox fast path, batched Kron matmat."""

import numpy as np
import jax.numpy as jnp
import pytest

import epsilon_tpu as ep
from epsilon_tpu.frontend import api
from epsilon_tpu.ir import (AffineOperator, Cone, ConeConstraint,
                            ProxFunctionSpec, ProxKind, ProxProblem, ProxTerm)
from epsilon_tpu.ops import linop
from epsilon_tpu.ops.block import BlockMatrix, BlockVector
from epsilon_tpu.solvers import SolverParams
from epsilon_tpu.solvers.admm import ProxADMMSolver, ProxADMMTwoBlockSolver
from epsilon_tpu.solvers.params import SolverKind


def _lasso_prox_problem(m=20, n=10, seed=0):
    rng = np.random.RandomState(seed)
    A = rng.randn(m, n)
    b = rng.randn(m)
    H1 = AffineOperator(BlockMatrix({("arg:0", "x"): linop.dense(A)}),
                        BlockVector({"arg:0": jnp.asarray(-b)}))
    t1 = ProxTerm(spec=ProxFunctionSpec(kind=ProxKind.SUM_SQUARE), H=H1)
    H2 = AffineOperator(BlockMatrix({("arg:0", "y"): linop.identity(n)}),
                        BlockVector())
    t2 = ProxTerm(spec=ProxFunctionSpec(kind=ProxKind.NORM_1, alpha=0.5),
                  H=H2)
    C = AffineOperator(
        BlockMatrix({("c", "x"): linop.identity(n),
                     ("c", "y"): linop.scalar(-1.0, n)}), BlockVector())
    con = ConeConstraint(cone=Cone.ZERO, op=C)
    return ProxProblem(terms=[t1, t2], constraints=[con],
                       var_dims={"x": n, "y": n},
                       var_shapes={"x": (n, 1), "y": (n, 1)})


@pytest.mark.parametrize("cls,kind", [
    (ProxADMMTwoBlockSolver, SolverKind.PROX_ADMM_TWO_BLOCK),
    (ProxADMMSolver, SolverKind.PROX_ADMM),
])
def test_rho_change_rebuilds_and_matches_fresh(cls, kind):
    """Changing fixed rho on a cached solver must rebuild the sqrt(rho)
    metric (ADVICE r1 medium): the re-solve must match a fresh solver at the
    new rho, not silently keep the old metric."""
    prob = _lasso_prox_problem()
    params = SolverParams(solver=kind, rho=1.0, max_iterations=2000,
                          rel_tol=1e-6, abs_tol=1e-8, warm_start=True)
    s = cls(prob, params)
    x1 = s.solve()
    # flip rho on the same (cached) solver
    s.params = SolverParams(solver=kind, rho=4.0, max_iterations=2000,
                            rel_tol=1e-6, abs_tol=1e-8, warm_start=True)
    x2 = s.solve()
    assert s._init_rho == 4.0 and s.sqrt_rho == pytest.approx(2.0)
    fresh = cls(prob, SolverParams(solver=kind, rho=4.0, max_iterations=2000,
                                   rel_tol=1e-6, abs_tol=1e-8))
    x3 = fresh.solve()
    for k in x3.keys():
        np.testing.assert_allclose(np.asarray(x2[k]), np.asarray(x3[k]),
                                   atol=1e-4)


def test_rebuild_preserves_hooks_and_warm_dual():
    """ADVICE r1 low: stop callbacks / checkpointer survive the mode-flip
    rebuild, and the warm dual is rescaled (not dropped) on a rho change."""
    prob = _lasso_prox_problem()
    params = SolverParams(rho=1.0, warm_start=True, max_iterations=400,
                          rel_tol=1e-6, abs_tol=1e-8)
    s = ProxADMMTwoBlockSolver(prob, params)
    calls = []
    s.register_stop_callback(lambda: (calls.append(1), False)[1])
    sentinel = object()
    s._checkpointer = None  # keep None; just mark attrs to observe survival
    s.solve()
    warm_before = s._warm_state
    assert warm_before is not None
    s.params = SolverParams(rho=9.0, warm_start=True, max_iterations=400,
                            rel_tol=1e-6, abs_tol=1e-8)
    s.solve()
    assert len(s._stop_callbacks) == 1  # survived the rebuild
    # warm u was rescaled by rho_old/rho_new = 1/9 at rebuild time; after the
    # second solve the state is re-converged, so just check it ran warm
    assert s._warm_state is not None


def test_device_resume_debits_iteration_budget(tmp_path):
    """ADVICE r1 low: a device-drive solve resumed from iteration k runs at
    most max_iterations - k more iterations."""
    from epsilon_tpu.utils.checkpoint import SolverCheckpointer
    prob = _lasso_prox_problem()
    # phase 1: run 60 iterations (no convergence at tiny tolerances)
    params = SolverParams(max_iterations=60, epoch_iterations=10,
                          rel_tol=1e-14, abs_tol=1e-16, drive="device")
    s = ProxADMMTwoBlockSolver(prob, params)
    ck = SolverCheckpointer(str(tmp_path / "ck"), every_epochs=1)
    s.attach_checkpointer(ck)
    s.solve()
    assert s.status.num_iterations == 60
    # phase 2: resume with max_iterations=100 -> only 40 more (total 100)
    s2 = ProxADMMTwoBlockSolver(prob, SolverParams(
        max_iterations=100, epoch_iterations=10, rel_tol=1e-14,
        abs_tol=1e-16, drive="device"))
    ck2 = SolverCheckpointer(str(tmp_path / "ck"), every_epochs=1)
    s2.attach_checkpointer(ck2)
    s2.solve()
    assert s2.status.num_iterations == 100


def test_checkpoint_fingerprint_rejects_other_problem(tmp_path, caplog):
    """ADVICE r1 low: a checkpoint from a different problem with identical
    leaf shapes is rejected (with a warning), not silently resumed."""
    import logging
    from epsilon_tpu.utils.checkpoint import SolverCheckpointer
    ck = SolverCheckpointer(str(tmp_path / "ck"), every_epochs=1)
    state_a = (BlockVector({"x": jnp.arange(3.0)}),)
    state_b = (BlockVector({"y": jnp.zeros(3)}),)  # same shapes, other var
    ck.save(7, state_a)
    with caplog.at_level(logging.WARNING, logger="epsilon_tpu"):
        restored, step = ck.restore(state_b)
    assert restored is None and step == 0
    assert any("fingerprint" in r.message for r in caplog.records)
    # the matching problem still restores
    restored, step = ck.restore((BlockVector({"x": jnp.zeros(3)}),))
    assert step == 7
    np.testing.assert_allclose(np.asarray(restored[0]["x"]), [0, 1, 2])


def test_single_prox_fast_path():
    """cvxpy_solver.py:79-88 parity: 1 prox term + no constraints solves by
    one prox evaluation, no ADMM iterations."""
    rng = np.random.RandomState(3)
    A = rng.randn(30, 8)
    b = rng.randn(30)
    x = api.Variable(8, name="x")
    prob = api.Problem(api.Minimize(api.sum_squares(A @ x - b)))
    obj = prob.solve()
    assert prob.solver_status.num_iterations == 0
    x_star, *_ = np.linalg.lstsq(A, b, rcond=None)
    np.testing.assert_allclose(np.asarray(x.value).ravel(), x_star, atol=1e-3)
    np.testing.assert_allclose(
        obj, float(np.sum((A @ x_star - b) ** 2)), rtol=1e-5)


def test_weak_cache_no_stale_id_reuse():
    """frontend cache is keyed by the live Problem object; entries die with
    the problem instead of aliasing onto a reused id()."""
    from epsilon_tpu.frontend.solve import _PROBLEM_CACHE
    import gc
    rng = np.random.RandomState(0)
    A = rng.randn(12, 5)
    b = rng.randn(12)
    x = api.Variable(5, name="x")
    prob = api.Problem(api.Minimize(
        api.sum_squares(A @ x - b) + api.norm1(x)))
    _PROBLEM_CACHE.clear()
    prob.solve(warm_start=True)
    assert prob in _PROBLEM_CACHE
    assert len(_PROBLEM_CACHE) == 1
    del prob
    gc.collect()
    # the dead Problem's entry must actually be evicted, so a new Problem
    # allocated at the reused id() can never alias onto the stale solver
    assert len(_PROBLEM_CACHE) == 0


def test_kron_matmat_batched_matches_dense():
    rng = np.random.RandomState(1)
    A = linop.dense(rng.randn(4, 3))
    B = linop.dense(rng.randn(5, 2))
    K = linop.kronecker(A, B)
    V = rng.randn(6, 7)
    out = np.asarray(K.matmat(jnp.asarray(V)))
    ref = np.kron(A.as_dense(), B.as_dense()) @ V
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-12)
    # jit-compiles to a single program (no per-column unroll): smoke-check
    # a wide V too
    V2 = rng.randn(6, 100)
    out2 = np.asarray(K.matmat(jnp.asarray(V2)))
    np.testing.assert_allclose(
        out2, np.kron(A.as_dense(), B.as_dense()) @ V2, rtol=1e-10,
        atol=1e-12)
