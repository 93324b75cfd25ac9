"""Device-resident problem constants through the full pipeline.

Data generated ON the accelerator (``mnist.kitchen_sink_features
device=True``) flows through expression constants, DCP sign analysis, the
affine fold, and the solver without ever crossing the host link as a full
matrix (``frontend/expression.py`` jax.Array constants; ``ops/linop.py``
device DenseOp).  Reference analogue: none — the reference is host-only
(``constant.py:10-34`` serializes every constant through the host).
"""

import numpy as np

import jax
import jax.numpy as jnp

import epsilon_tpu as ep
from epsilon_tpu.problems import mnist


def test_device_features_match_host():
    np.random.seed(0)
    ph = mnist.create(m=300, n=50, k=5, lam=0.05, device_features=False)
    oh = ph.solve(rel_tol=1e-4, abs_tol=1e-7, max_iterations=2000,
                  epoch_iterations=20)
    np.random.seed(0)
    pd = mnist.create(m=300, n=50, k=5, lam=0.05, device_features=True)
    od = pd.solve(rel_tol=1e-4, abs_tol=1e-7, max_iterations=2000,
                  epoch_iterations=20)
    assert abs(oh - od) <= 1e-6 * max(1.0, abs(oh))
    assert (pd.solver_status.num_iterations
            == ph.solver_status.num_iterations)


def test_device_constant_expression_and_sign(rng):
    """A jax-array constant stays device-resident in the expression and
    its DCP sign reduces on device."""
    from epsilon_tpu.frontend import expression as ex
    A = jnp.asarray(np.abs(rng.randn(6, 4)))
    e = ex.constant(A)
    assert e.size == (6, 4)
    assert isinstance(e.attr["value"], jax.Array)
    assert e.dcp_props.sign.name == "POSITIVE"


def test_device_constant_lasso_solve(rng):
    A = rng.randn(40, 20)
    b = A @ (rng.randn(20) * (rng.rand(20) < 0.3)) + 0.05 * rng.randn(40)
    lam = 0.2
    xh = ep.Variable(20)
    ph = ep.Problem(ep.Minimize(
        0.5 * ep.sum_squares(ep._wrap(A) * xh - b) + lam * ep.norm1(xh)))
    oh = ph.solve(rel_tol=1e-6, abs_tol=1e-9, max_iterations=4000)
    xd = ep.Variable(20)
    pdv = ep.Problem(ep.Minimize(
        0.5 * ep.sum_squares(ep._wrap(jnp.asarray(A)) * xd - b)
        + lam * ep.norm1(xd)))
    od = pdv.solve(rel_tol=1e-6, abs_tol=1e-9, max_iterations=4000)
    assert abs(oh - od) <= 1e-8 * max(1.0, abs(oh))
    np.testing.assert_allclose(np.asarray(xd.value), np.asarray(xh.value),
                               atol=1e-7)
