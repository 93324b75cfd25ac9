"""Warm-started TV-1D inside the ADMM loop.

The PDAS kernel's dual threads through the two-block solver state
(``admm.py`` kernel-state plumbing; ``registry.KernelEntry.stateful_prox``),
so consecutive sweeps re-solve the box-QP from the previous active set —
the inner-loop analogue of the reference reusing glmgen's workspace
(``total_variation_1d.cc:6-25``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from epsilon_tpu.ir import ProxKind
from epsilon_tpu.ops.prox import registry
from epsilon_tpu.ops.prox import tv1d as tvk
from epsilon_tpu.problems import fused_lasso, tv_1d


def _blocky_signal(n, rng):
    return (np.cumsum((rng.rand(n) < 0.01) * rng.randn(n))
            + 0.1 * rng.randn(n))


def test_warm_pdas_fewer_rounds(rng):
    """A warm dual cuts PDAS rounds on a nearby re-solve and returns the
    SAME minimizer (finite termination is start-independent)."""
    v = _blocky_signal(5000, rng)
    _, _, _, z = tvk.prox_tv1d_pdas(jnp.asarray(v), 1.0, return_dual=True)
    v2 = v + 0.01 * rng.randn(5000)
    x_cold, _, it_cold = tvk.prox_tv1d_pdas(jnp.asarray(v2), 1.0)
    x_warm, _, it_warm, _ = tvk.prox_tv1d_pdas(jnp.asarray(v2), 1.0, z0=z,
                                               return_dual=True)
    assert int(it_warm) < int(it_cold)
    assert np.allclose(np.asarray(x_warm), np.asarray(x_cold), atol=1e-10)


def test_warm_dual_out_of_box_is_projected(rng):
    """A warm dual from a larger lam is clipped into the new box, not fed
    through infeasible (adaptive-rho hands the kernel shrinking lam)."""
    v = _blocky_signal(2000, rng)
    _, _, _, z = tvk.prox_tv1d_pdas(jnp.asarray(v), 5.0, return_dual=True)
    x_warm, gap, _, _ = tvk.prox_tv1d_pdas(jnp.asarray(v), 0.5, z0=z,
                                           return_dual=True)
    x_cold, _, _ = tvk.prox_tv1d_pdas(jnp.asarray(v), 0.5)
    assert np.allclose(np.asarray(x_warm), np.asarray(x_cold), atol=1e-8)


def _solve_stateless(make, **params):
    ent = registry.KERNELS[ProxKind.TOTAL_VARIATION_1D]
    saved = ent.stateful_prox
    ent.stateful_prox = None
    try:
        prob = make()
        obj = prob.solve(**params)
    finally:
        ent.stateful_prox = saved
    return prob, obj


@pytest.mark.parametrize("drive", ["host", "device"])
def test_tv_solve_matches_stateless(drive):
    """The threaded kernel state changes WHERE the inner solve starts, not
    what it returns: the full solve trajectory is identical."""
    params = dict(rel_tol=1e-4, abs_tol=1e-7, max_iterations=2000,
                  epoch_iterations=50, drive=drive)
    prob = tv_1d.create(1500)
    obj = prob.solve(**params)
    prob2, obj2 = _solve_stateless(lambda: tv_1d.create(1500), **params)
    assert prob.status == "optimal"
    assert prob.solver_status.num_iterations == \
        prob2.solver_status.num_iterations
    assert obj == pytest.approx(obj2, abs=1e-8)


def test_fused_lasso_with_warm_tv_adaptive_rho():
    prob = fused_lasso.create(150, 8, 30)
    obj = prob.solve(rel_tol=1e-4, abs_tol=1e-7, max_iterations=4000,
                     epoch_iterations=50, adaptive_rho=True)
    assert prob.status == "optimal"
    prob2, obj2 = _solve_stateless(
        lambda: fused_lasso.create(150, 8, 30), rel_tol=1e-4, abs_tol=1e-7,
        max_iterations=4000, epoch_iterations=50, adaptive_rho=True)
    assert obj == pytest.approx(obj2, rel=1e-6)


def test_warm_start_resolve_keeps_kernel_state():
    """warm_start re-solve reuses the packed state (incl. kernel duals)
    without a structure mismatch."""
    prob = tv_1d.create(1000)
    common = dict(rel_tol=1e-4, abs_tol=1e-7, max_iterations=2000,
                  epoch_iterations=50, warm_start=True)
    obj1 = prob.solve(**common)
    obj2 = prob.solve(**common)
    assert obj2 == pytest.approx(obj1, rel=1e-8)
    assert prob.solver_status.num_iterations <= 50  # converges immediately
