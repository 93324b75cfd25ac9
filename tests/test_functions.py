"""Loss-helper end-to-end tests (functions_test.py parity)."""

import numpy as np
import pytest
import scipy.optimize

import epsilon_tpu as ep


def _cls_data(m, n, seed):
    rng = np.random.RandomState(seed)
    X = rng.randn(m, n)
    y = np.sign(rng.randn(m))
    y[y == 0] = 1
    return X, y, rng


def test_hinge_loss_e2e():
    X, y, rng = _cls_data(25, 4, 0)
    theta = ep.Variable(4)
    prob = ep.Problem(ep.Minimize(
        ep.hinge_loss(theta, X, y) + ep.sum_squares(theta)))
    obj = prob.solve(rel_tol=1e-5, abs_tol=1e-8, max_iterations=8000)
    f = lambda t: np.maximum(0, 1 - y * (X @ t)).sum() + np.sum(t * t)
    oracle = scipy.optimize.minimize(f, np.zeros(4), method="Powell",
                                     options={"maxiter": 50000}).fun
    assert obj <= oracle * (1 + 1e-2) + 1e-4


def test_logistic_loss_e2e():
    X, y, rng = _cls_data(25, 4, 1)
    theta = ep.Variable(4)
    prob = ep.Problem(ep.Minimize(
        ep.logistic_loss(theta, X, y) + 0.5 * ep.sum_squares(theta)))
    obj = prob.solve(rel_tol=1e-5, abs_tol=1e-8, max_iterations=8000)
    f = lambda t: np.logaddexp(0, -y * (X @ t)).sum() + 0.5 * np.sum(t * t)
    oracle = scipy.optimize.minimize(f, np.zeros(4), method="L-BFGS-B").fun
    assert obj <= oracle * (1 + 1e-2) + 1e-4


def test_softmax_loss_e2e():
    rng = np.random.RandomState(2)
    m, n, k = 20, 4, 3
    X = rng.randn(m, n)
    y = rng.randint(0, k, m)
    Theta = ep.Variable(n, k)
    prob = ep.Problem(ep.Minimize(
        ep.softmax_loss(Theta, X, y) + 0.5 * ep.sum_squares(ep.vec(Theta))))
    obj = prob.solve(rel_tol=1e-4, abs_tol=1e-7, max_iterations=8000)

    def f(t):
        T = t.reshape(n, k)
        Z = X @ T
        lse = np.log(np.exp(Z - Z.max(1, keepdims=True)).sum(1)) + Z.max(1)
        return (lse.sum() - sum(Z[i, y[i]] for i in range(m))
                + 0.5 * np.sum(T * T))

    oracle = scipy.optimize.minimize(f, np.zeros(n * k), method="L-BFGS-B").fun
    assert obj <= oracle * (1 + 1e-2) + 1e-3


def test_poisson_loss_e2e():
    rng = np.random.RandomState(3)
    m, n = 20, 3
    X = rng.randn(m, n) * 0.3
    y = rng.poisson(1.0, m).astype(float)
    theta = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        ep.poisson_loss(theta, X, y) + 0.1 * ep.sum_squares(theta)))
    obj = prob.solve(rel_tol=1e-5, abs_tol=1e-8, max_iterations=8000)
    f = lambda t: (np.exp(X @ t).sum() - (y * (X @ t)).sum()
                   + 0.1 * np.sum(t * t))
    oracle = scipy.optimize.minimize(f, np.zeros(n), method="L-BFGS-B").fun
    assert obj <= oracle * (1 + 1e-2) + 1e-4


def test_quantile_loss_e2e():
    rng = np.random.RandomState(4)
    m, n, k = 25, 3, 2
    X = rng.randn(m, n)
    y = X @ rng.randn(n) + 0.2 * rng.randn(m)
    alphas = [0.25, 0.75]
    Theta = ep.Variable(n, k)
    prob = ep.Problem(ep.Minimize(ep.quantile_loss(alphas, Theta, X, y)))
    obj = prob.solve(rel_tol=1e-5, abs_tol=1e-8, max_iterations=8000)

    def f(t):
        T = t.reshape(n, k)
        Z = X @ T - y[:, None]
        A = np.tile(alphas, (m, 1))
        return np.maximum(-A * Z, (1 - A) * Z).sum()

    oracle = scipy.optimize.minimize(f, np.zeros(n * k), method="Powell",
                                     options={"maxiter": 80000}).fun
    assert obj <= oracle * (1 + 1e-2) + 1e-3


def test_pack_unpack(rng):
    import jax.numpy as jnp
    from epsilon_tpu.ops.block import BlockVector
    bv = BlockVector({"a": jnp.asarray(rng.randn(3)),
                      "b": jnp.asarray(rng.randn(5))})
    flat, offsets = bv.pack()
    assert flat.shape == (8,)
    out = BlockVector.unpack(flat, offsets, {"a": 3, "b": 5})
    np.testing.assert_allclose(np.asarray(out["a"]), np.asarray(bv["a"]))
    np.testing.assert_allclose(np.asarray(out["b"]), np.asarray(bv["b"]))
