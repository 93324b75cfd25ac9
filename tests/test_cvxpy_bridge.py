"""CVXPY bridge validation (reference: ``cvxpy_expr.py:141-236``,
``cvxpy_solver.py:64-104``, ``constant_atoms_test.py:25-43``).

cvxpy is not installable in this environment (no network); the bridge is
validated against :mod:`cvxpy_mini` — an API-faithful stand-in exposing the
same public AST shape (class names, ``.args``, atom attributes,
``Variable.id``, ``Problem.objective.expr``) the bridge dispatches on, with
independent numpy ``.value`` semantics as the oracle.  With real cvxpy on
the path, these tests run against it unchanged (real cvxpy wins the
import).
"""

import numpy as np
import pytest

import cvxpy_mini

cvxpy_mini.install()
import cvxpy as cp  # real cvxpy if installed, else the mini

from epsilon_tpu.frontend import cvxpy_bridge


def test_availability_flag():
    assert cvxpy_bridge.cvxpy_available()


# ---------------------------------------------------------------------------
# end-to-end solves with variables + write-back
# ---------------------------------------------------------------------------

def test_lasso_roundtrip():
    rng = np.random.RandomState(0)
    m, n = 20, 10
    A = rng.randn(m, n)
    b = rng.randn(m)
    x = cp.Variable(n)
    prob = cp.Problem(cp.Minimize(
        0.5 * cp.sum_squares(A @ x - b) + 0.5 * cp.norm1(x)))
    obj = cvxpy_bridge.solve(prob, rel_tol=1e-6, abs_tol=1e-9,
                             max_iterations=5000)
    assert np.isfinite(obj)
    assert x.value is not None
    # independent oracle: evaluate the cvxpy objective AT the returned x
    x_val = np.asarray(x.value).reshape(np.asarray(x.value).size)
    obj_at_x = 0.5 * np.sum((A @ x_val - b) ** 2) + 0.5 * np.sum(np.abs(x_val))
    np.testing.assert_allclose(obj, obj_at_x, rtol=1e-3, atol=1e-4)
    # and against scipy's solution of the same lasso
    import scipy.optimize
    f = lambda z: 0.5 * np.sum((A @ z - b) ** 2) + 0.5 * np.sum(np.abs(z))
    best = scipy.optimize.minimize(f, np.zeros(n), method="Powell",
                                   options=dict(maxiter=20000, xtol=1e-10)).fun
    assert obj <= best + 1e-2 * abs(best) + 1e-3


def test_equality_constraint_and_maximize():
    x = cp.Variable(3)
    c = np.array([1.0, -2.0, 3.0])
    prob = cp.Problem(cp.Maximize(-cp.sum_squares(x - c)),
                      [cp.Sum(x) == 0.0])
    obj = cvxpy_bridge.solve(prob, rel_tol=1e-7, abs_tol=1e-9,
                             max_iterations=4000)
    # analytic: projection of c onto {sum x = 0}
    x_star = c - np.mean(c)
    np.testing.assert_allclose(np.asarray(x.value).ravel(), x_star, atol=1e-4)
    np.testing.assert_allclose(obj, -np.sum((x_star - c) ** 2), atol=1e-5)


def test_inequality_constraint():
    x = cp.Variable(4)
    v = np.array([-2.0, -0.5, 0.5, 2.0])
    prob = cp.Problem(cp.Minimize(cp.sum_squares(x - v)), [x >= 0.0])
    cvxpy_bridge.solve(prob, rel_tol=1e-7, abs_tol=1e-9, max_iterations=4000)
    np.testing.assert_allclose(np.asarray(x.value).ravel(),
                               np.maximum(v, 0), atol=1e-4)


def test_parameter_conversion():
    p = cp.Parameter((2,))
    p.value = np.array([1.0, 2.0])
    x = cp.Variable(2)
    prob = cp.Problem(cp.Minimize(cp.sum_squares(x - p)))
    cvxpy_bridge.solve(prob, rel_tol=1e-7, abs_tol=1e-9)
    np.testing.assert_allclose(np.asarray(x.value).ravel(), [1.0, 2.0],
                               atol=1e-4)


# ---------------------------------------------------------------------------
# constant-atoms protocol (constant_atoms_test.py:25-43): every supported
# atom evaluated at constants through the FULL bridge+compile+solve
# pipeline must match the frontend's own numeric value at 1e-2.
# ---------------------------------------------------------------------------

_rng = np.random.RandomState(7)
_v4 = _rng.rand(4) + 0.5          # positive vector
_g4 = _rng.randn(4)               # generic vector
_M23 = _rng.randn(2, 3)
_S3 = (lambda B: B @ B.T + 3 * np.eye(3))(_rng.randn(3, 3))
_x3 = _rng.randn(3)

CONSTANT_ATOMS = [
    ("add", lambda: cp.Constant(_g4) + cp.Constant(_v4)),
    ("neg", lambda: -cp.Constant(_g4)),
    ("matmul", lambda: cp.Constant(_M23) @ cp.Constant(np.ones(3))),
    ("scale", lambda: 2.5 * cp.Constant(_g4)),
    ("div", lambda: cp.Constant(_g4) / 4.0),
    ("multiply", lambda: cp.multiply(cp.Constant(_g4), cp.Constant(_v4))),
    ("index", lambda: cp.Constant(_g4)[1:3]),
    ("transpose_sum", lambda: cp.Sum(cp.transpose(cp.Constant(_M23)))),
    ("reshape", lambda: cp.Sum(cp.reshape(cp.Constant(_M23), (3, 2)))),
    ("sum", lambda: cp.Sum(cp.Constant(_M23))),
    ("trace", lambda: cp.trace(cp.Constant(_S3))),
    ("hstack", lambda: cp.Sum(cp.hstack([cp.Constant(np.atleast_2d(_g4)),
                                         cp.Constant(np.atleast_2d(_v4))]))),
    ("vstack", lambda: cp.Sum(cp.vstack([cp.Constant(np.atleast_2d(_g4)),
                                         cp.Constant(np.atleast_2d(_v4))]))),
    ("kron", lambda: cp.Sum(cp.kron(cp.Constant(np.eye(2)),
                                    cp.Constant(_M23)))),
    ("diag_vec", lambda: cp.Sum(cp.diag_vec(cp.Constant(_g4)))),
    ("diag_mat", lambda: cp.Sum(cp.diag_mat(cp.Constant(_S3)))),
    ("upper_tri", lambda: cp.Sum(cp.upper_tri(cp.Constant(_S3)))),
    ("abs", lambda: cp.Sum(cp.abs(cp.Constant(_g4)))),
    ("square", lambda: cp.Sum(cp.square(cp.Constant(_g4)))),
    ("power2", lambda: cp.Sum(cp.power(cp.Constant(_g4), 2))),
    ("sqrt", lambda: cp.Sum(cp.sqrt(cp.Constant(_v4)))),
    ("log", lambda: cp.Sum(cp.log(cp.Constant(_v4)))),
    ("log1p", lambda: cp.Sum(cp.log1p(cp.Constant(_v4)))),
    ("exp", lambda: cp.Sum(cp.exp(cp.Constant(_g4)))),
    ("entr", lambda: cp.Sum(cp.entr(cp.Constant(_v4)))),
    ("logistic", lambda: cp.Sum(cp.logistic(cp.Constant(_g4)))),
    ("huber", lambda: cp.Sum(cp.huber(cp.Constant(2.0 * _g4), 1.0))),
    ("kl_div", lambda: cp.Sum(cp.kl_div(cp.Constant(_v4),
                                        cp.Constant(_v4[::-1].copy())))),
    ("maximum", lambda: cp.Sum(cp.maximum(cp.Constant(_g4),
                                          cp.Constant(_v4)))),
    ("minimum", lambda: cp.Sum(cp.minimum(cp.Constant(_g4),
                                          cp.Constant(_v4)))),
    ("max", lambda: cp.max(cp.Constant(_g4))),
    ("min", lambda: cp.min(cp.Constant(_g4))),
    ("norm1", lambda: cp.norm1(cp.Constant(_g4))),
    ("norm_inf", lambda: cp.norm_inf(cp.Constant(_g4))),
    ("norm2", lambda: cp.Pnorm(cp.Constant(_g4), 2)),
    ("pnorm3", lambda: cp.Pnorm(cp.Constant(_v4), 3)),
    ("quad_over_lin", lambda: cp.QuadOverLin(cp.Constant(_g4),
                                             cp.Constant(2.0))),
    ("sum_squares", lambda: cp.sum_squares(cp.Constant(_g4))),
    ("log_sum_exp", lambda: cp.log_sum_exp(cp.Constant(_g4))),
    ("sum_largest", lambda: cp.sum_largest(cp.Constant(_g4), 2)),
    ("geo_mean", lambda: cp.geo_mean(cp.Constant(_v4))),
    ("log_det", lambda: -cp.log_det(cp.Constant(_S3))),
    ("normNuc", lambda: cp.normNuc(cp.Constant(_M23))),
    ("lambda_max", lambda: cp.lambda_max(cp.Constant(_S3))),
    ("sigma_max", lambda: cp.sigma_max(cp.Constant(_M23))),
    ("quad_form", lambda: cp.QuadForm(cp.Constant(_x3), cp.Constant(_S3))),
    ("matrix_frac", lambda: cp.matrix_frac(cp.Constant(_x3),
                                           cp.Constant(_S3))),
]


@pytest.mark.parametrize("name,make",
                         CONSTANT_ATOMS, ids=[n for n, _ in CONSTANT_ATOMS])
def test_constant_atom_through_pipeline(name, make):
    expr = make()
    expected = float(np.sum(np.asarray(expr.value)))
    if np.ndim(expr.value) > 0 and np.size(expr.value) > 1:
        # minimize sum of the (constant) expression entries
        expr = cp.Sum(expr)
    prob = cp.Problem(cp.Minimize(expr))
    obj = cvxpy_bridge.solve(prob, rel_tol=1e-6, abs_tol=1e-9,
                             max_iterations=4000)
    np.testing.assert_allclose(obj, expected,
                               rtol=1e-2, atol=1e-2)
