"""Elastic recovery: solver-state checkpoint/resume via orbax.

The reference only has in-memory warm starts (``solvemodule.cc:142-155``);
this validates the durable variant: a preempted solve resumes from the last
saved epoch in a FRESH solver instance (new process semantics) and reaches
the same solution.
"""

import numpy as np
import pytest

from epsilon_tpu.solvers import (ProxADMMSolver, ProxADMMTwoBlockSolver,
                                 SolverParams)
from epsilon_tpu.utils import SolverCheckpointer

from test_solvers import lasso_oracle, make_lasso_problem, _lasso_objective


def _workload(seed=3, m=30, n=15, lam=0.5):
    rng = np.random.RandomState(seed)
    A = rng.randn(m, n)
    b = A @ (rng.randn(n) * (rng.rand(n) < 0.3)) + 0.1 * rng.randn(m)
    return A, b, lam


@pytest.mark.parametrize("solver_cls", [ProxADMMTwoBlockSolver,
                                        ProxADMMSolver])
def test_resume_host_drive(tmp_path, solver_cls):
    A, b, lam = _workload()

    # phase 1: "preempted" run — host drive, saves every 2 epochs, killed
    # by the iteration budget long before convergence
    ck1 = SolverCheckpointer(str(tmp_path / "ck"), every_epochs=2)
    s1 = solver_cls(make_lasso_problem(A, b, lam),
                    SolverParams(rel_tol=1e-6, abs_tol=1e-8,
                                 max_iterations=60, epoch_iterations=10,
                                 drive="host"))
    s1.attach_checkpointer(ck1)
    s1.solve()
    assert s1.status.num_iterations == 60
    saved = ck1.latest_step()
    assert saved is not None and saved > 0
    ck1.close()

    # phase 2: fresh solver instance (fresh process semantics) resumes
    ck2 = SolverCheckpointer(str(tmp_path / "ck"), every_epochs=2)
    s2 = solver_cls(make_lasso_problem(A, b, lam),
                    SolverParams(rel_tol=1e-6, abs_tol=1e-8,
                                 max_iterations=5000, epoch_iterations=10,
                                 drive="host"))
    s2.attach_checkpointer(ck2)
    sol = s2.solve()
    assert s2.status.num_iterations > saved  # continued, not restarted

    # compare to scratch run: resumed run converges with fewer NEW epochs
    s3 = solver_cls(make_lasso_problem(A, b, lam),
                    SolverParams(rel_tol=1e-6, abs_tol=1e-8,
                                 max_iterations=5000, epoch_iterations=10,
                                 drive="host"))
    s3.solve()
    new_iters = s2.status.num_iterations - saved
    assert new_iters < s3.status.num_iterations

    if solver_cls is ProxADMMTwoBlockSolver:
        x = np.asarray(sol["x"])
    else:
        x = np.asarray(sol["x"])
    x_o = lasso_oracle(A, b, lam)
    obj = _lasso_objective(A, b, lam, x)
    obj_o = _lasso_objective(A, b, lam, x_o)
    assert obj <= obj_o + 1e-3 * abs(obj_o) + 1e-5
    ck2.close()


def test_resume_device_drive(tmp_path):
    """Device drive: resume at start + single save at the end."""
    A, b, lam = _workload(seed=4)
    ck = SolverCheckpointer(str(tmp_path / "ck"), every_epochs=1)
    s1 = ProxADMMTwoBlockSolver(
        make_lasso_problem(A, b, lam),
        SolverParams(rel_tol=1e-6, abs_tol=1e-8, max_iterations=50,
                     epoch_iterations=10))
    s1.attach_checkpointer(ck)
    s1.solve()
    step1 = ck.latest_step()
    assert step1 == s1.status.num_iterations

    s2 = ProxADMMTwoBlockSolver(
        make_lasso_problem(A, b, lam),
        SolverParams(rel_tol=1e-6, abs_tol=1e-8, max_iterations=5000,
                     epoch_iterations=10))
    s2.attach_checkpointer(ck)
    sol = s2.solve()
    assert s2.status.num_iterations > step1
    x_o = lasso_oracle(A, b, lam)
    obj = _lasso_objective(A, b, lam, np.asarray(sol["x"]))
    obj_o = _lasso_objective(A, b, lam, x_o)
    assert obj <= obj_o + 1e-3 * abs(obj_o) + 1e-5
    ck.close()


def test_shape_mismatch_starts_fresh(tmp_path):
    """A checkpoint from a DIFFERENT problem shape is ignored, not
    mis-restored."""
    A, b, lam = _workload()
    ck = SolverCheckpointer(str(tmp_path / "ck"), every_epochs=1)
    s1 = ProxADMMTwoBlockSolver(
        make_lasso_problem(A, b, lam),
        SolverParams(max_iterations=20, epoch_iterations=10, drive="host"))
    s1.attach_checkpointer(ck)
    s1.solve()
    ck.close()

    A2, b2, lam2 = _workload(seed=5, m=20, n=8)
    ck2 = SolverCheckpointer(str(tmp_path / "ck"), every_epochs=1)
    s2 = ProxADMMTwoBlockSolver(
        make_lasso_problem(A2, b2, lam2),
        SolverParams(rel_tol=1e-6, abs_tol=1e-8, max_iterations=5000,
                     epoch_iterations=10, drive="host"))
    s2.attach_checkpointer(ck2)
    sol = s2.solve()
    x_o = lasso_oracle(A2, b2, lam2)
    obj = _lasso_objective(A2, b2, lam2, np.asarray(sol["x"]))
    obj_o = _lasso_objective(A2, b2, lam2, x_o)
    assert obj <= obj_o + 1e-3 * abs(obj_o) + 1e-5
    ck2.close()
