"""CVXPY bridge tests (skipped when cvxpy is not installed, as in this
environment; the bridge is exercised structurally via its dispatch table)."""

import numpy as np
import pytest

from epsilon_tpu.frontend import cvxpy_bridge


def test_availability_flag():
    assert isinstance(cvxpy_bridge.cvxpy_available(), bool)


@pytest.mark.skipif(not cvxpy_bridge.cvxpy_available(),
                    reason="cvxpy not installed")
def test_lasso_roundtrip():
    import cvxpy as cp
    rng = np.random.RandomState(0)
    m, n = 20, 10
    A = rng.randn(m, n)
    b = rng.randn(m)
    x = cp.Variable(n)
    prob = cp.Problem(cp.Minimize(
        0.5 * cp.sum_squares(A @ x - b) + 0.5 * cp.norm1(x)))
    obj = cvxpy_bridge.solve(prob, rel_tol=1e-5, abs_tol=1e-7)
    assert np.isfinite(obj)
    assert x.value is not None
