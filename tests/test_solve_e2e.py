"""End-to-end solve tests through the full frontend (mirror solve_test.py:
27 problems x {epigraph, no-epigraph, two-block} with an external oracle;
here the oracle is scipy/sklearn and the assertion is
obj_ours <= obj_oracle + tol (solve_test.py:62-78)."""

import numpy as np
import pytest
import scipy.optimize

import epsilon_tpu as ep
from epsilon_tpu.solvers import SolverKind


def _assert_obj(ours, oracle, rel=1e-2, abs_=1e-4):
    assert ours <= oracle + rel * abs(oracle) + abs_, f"{ours} vs {oracle}"


PARAMS = [
    dict(),                                        # two-block (default)
    dict(solver=SolverKind.PROX_ADMM),             # N-block Gauss-Seidel
    dict(use_epigraph=False),                      # conic fallback paths
]


@pytest.mark.parametrize("params", PARAMS)
def test_lasso(params):
    rng = np.random.RandomState(0)
    m, n = 20, 10
    A = rng.randn(m, n)
    b = rng.randn(m)
    lam = 0.5
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        0.5 * ep.sum_squares(A @ x - b) + lam * ep.norm1(x)))
    obj = prob.solve(rel_tol=1e-4, abs_tol=1e-6, max_iterations=4000, **params)

    from sklearn.linear_model import Lasso
    model = Lasso(alpha=lam / m, fit_intercept=False, tol=1e-12, max_iter=100000)
    model.fit(A, b)
    oracle = 0.5 * np.sum((A @ model.coef_ - b) ** 2) + lam * np.abs(model.coef_).sum()
    _assert_obj(obj, oracle)
    np.testing.assert_allclose(x.value.ravel(), model.coef_, atol=2e-2)


@pytest.mark.parametrize("params", PARAMS)
def test_least_abs_dev(params):
    rng = np.random.RandomState(1)
    m, n = 25, 5
    A = rng.randn(m, n)
    b = rng.randn(m)
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(ep.norm1(A @ x - b)))
    obj = prob.solve(rel_tol=1e-5, abs_tol=1e-7, max_iterations=6000, **params)

    # LP oracle via linprog
    c = np.concatenate([np.zeros(n), np.ones(m)])
    A_ub = np.block([[A, -np.eye(m)], [-A, -np.eye(m)]])
    b_ub = np.concatenate([b, -b])
    res = scipy.optimize.linprog(c, A_ub=A_ub, b_ub=b_ub,
                                 bounds=[(None, None)] * (n + m))
    _assert_obj(obj, res.fun)


@pytest.mark.parametrize("params", PARAMS)
def test_nonneg_ls(params):
    rng = np.random.RandomState(2)
    m, n = 15, 6
    A = rng.randn(m, n)
    b = rng.randn(m)
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(0.5 * ep.sum_squares(A @ x - b)), [x >= 0])
    obj = prob.solve(rel_tol=1e-5, abs_tol=1e-8, max_iterations=6000, **params)
    x_o, _ = scipy.optimize.nnls(A, b)
    _assert_obj(obj, 0.5 * np.sum((A @ x_o - b) ** 2))


def test_basis_pursuit():
    rng = np.random.RandomState(3)
    m, n = 10, 30
    A = rng.randn(m, n)
    x0 = rng.randn(n) * (rng.rand(n) < 0.2)
    b = A @ x0
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(ep.norm1(x)), [A @ x == b])
    obj = prob.solve(rel_tol=1e-5, abs_tol=1e-7, max_iterations=8000)
    # oracle via linprog
    c = np.ones(2 * n)
    A_eq = np.hstack([A, -A])
    res = scipy.optimize.linprog(c, A_eq=A_eq, b_eq=b,
                                 bounds=[(0, None)] * 2 * n)
    _assert_obj(obj, res.fun)
    np.testing.assert_allclose(A @ x.value.ravel(), b, atol=2e-3)


def test_logreg_l1():
    rng = np.random.RandomState(4)
    m, n = 40, 6
    X = rng.randn(m, n)
    y = np.sign(rng.randn(m))
    y[y == 0] = 1
    lam = 0.5
    theta = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        ep.logistic_loss(theta, X, y) + lam * ep.norm1(theta)))
    obj = prob.solve(rel_tol=1e-5, abs_tol=1e-7, max_iterations=8000)

    def f(t):
        z = -y * (X @ t)
        return np.sum(np.logaddexp(0, z)) + lam * np.abs(t).sum()

    res = min(scipy.optimize.minimize(f, np.zeros(n), method="Powell",
                                      options={"maxiter": 50000}).fun,
              scipy.optimize.minimize(f, rng.randn(n), method="Powell",
                                      options={"maxiter": 50000}).fun)
    _assert_obj(obj, res)


def test_tv_smoothing():
    rng = np.random.RandomState(5)
    n = 60
    sig = np.repeat(rng.randn(6), 10)
    b = sig + 0.2 * rng.randn(n)
    lam = 1.0
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        0.5 * ep.sum_squares(x - b) + lam * ep.tv(x)))
    obj = prob.solve(rel_tol=1e-5, abs_tol=1e-7, max_iterations=6000)
    from epsilon_tpu.ops.prox.tv1d import tv1d_exact_numpy
    x_o = tv1d_exact_numpy(b, lam)
    oracle = 0.5 * np.sum((x_o - b) ** 2) + lam * np.sum(np.abs(np.diff(x_o)))
    _assert_obj(obj, oracle)


def test_svm_hinge_l2():
    rng = np.random.RandomState(6)
    m, n = 30, 5
    X = rng.randn(m, n)
    y = np.sign(rng.randn(m))
    y[y == 0] = 1
    lam = 0.1
    theta = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        ep.hinge_loss(theta, X, y) + lam * ep.sum_squares(theta)))
    obj = prob.solve(rel_tol=1e-5, abs_tol=1e-7, max_iterations=8000)

    def f(t):
        return (np.maximum(0, 1 - y * (X @ t)).sum() + lam * np.sum(t * t))

    oracle = min(
        scipy.optimize.minimize(f, np.zeros(n), method="Powell",
                                options={"maxiter": 50000}).fun,
        scipy.optimize.minimize(f, rng.randn(n), method="Powell",
                                options={"maxiter": 50000}).fun)
    _assert_obj(obj, oracle)


def test_quantile_regression():
    rng = np.random.RandomState(7)
    m, n = 30, 4
    X = rng.randn(m, n)
    y = X @ rng.randn(n) + 0.3 * rng.randn(m)
    tau = 0.3
    theta = ep.Variable(n)
    resid = X @ theta - y
    prob = ep.Problem(ep.Minimize(ep.sum_entries(ep.max_elemwise(
        ep.mul_elemwise(np.full((m, 1), -tau), resid),
        ep.mul_elemwise(np.full((m, 1), 1 - tau), resid)))))
    obj = prob.solve(rel_tol=1e-5, abs_tol=1e-7, max_iterations=8000)

    def f(t):
        r = X @ t - y
        return np.sum(np.maximum(-tau * r, (1 - tau) * r))

    oracle = scipy.optimize.minimize(f, np.zeros(n), method="Powell",
                                     options={"maxiter": 50000}).fun
    _assert_obj(obj, oracle)


def test_covsel_small():
    """Sparse inverse covariance (covsel.py:5-24 shape)."""
    rng = np.random.RandomState(8)
    n = 4
    A = rng.randn(n, n)
    Sigma = A @ A.T / n + np.eye(n)
    lam = 0.1
    S = ep.Variable(n, n)
    prob = ep.Problem(ep.Minimize(
        -ep.log_det(S) + ep.trace(Sigma @ S)
        + lam * ep.norm1(ep.vec(S))))
    obj = prob.solve(rel_tol=1e-5, abs_tol=1e-7, max_iterations=10000)

    def f(s):
        M = s.reshape(n, n)
        M = 0.5 * (M + M.T)
        w = np.linalg.eigvalsh(M)
        if np.any(w <= 1e-9):
            return 1e10
        return (-np.sum(np.log(w)) + np.trace(Sigma @ M)
                + lam * np.abs(M).sum())

    best = np.inf
    for s0 in [np.eye(n).ravel(), (np.eye(n) * 2).ravel()]:
        r = scipy.optimize.minimize(f, s0, method="Powell",
                                    options={"maxiter": 100000,
                                             "xtol": 1e-10})
        best = min(best, r.fun)
    _assert_obj(obj, best, rel=2e-2)


def test_huber_regression():
    rng = np.random.RandomState(9)
    m, n = 25, 4
    A = rng.randn(m, n)
    b = A @ rng.randn(n) + 0.1 * rng.randn(m)
    b[::7] += 5.0  # outliers
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(ep.sum_entries(ep.huber(A @ x - b, 1.0))))
    obj = prob.solve(rel_tol=1e-5, abs_tol=1e-7, max_iterations=8000)

    def hub(r):
        a = np.abs(r)
        return np.where(a <= 1.0, r * r, 2 * a - 1).sum()

    oracle = scipy.optimize.minimize(
        lambda t: hub(A @ t - b), np.zeros(n), method="Powell",
        options={"maxiter": 50000}).fun
    _assert_obj(obj, oracle)


def test_maximize_and_status():
    rng = np.random.RandomState(10)
    n = 5
    b = rng.randn(n)
    x = ep.Variable(n)
    prob = ep.Problem(ep.Maximize(-ep.sum_squares(x - b)))
    prob.solve(rel_tol=1e-6, abs_tol=1e-9)
    assert prob.status == "optimal"
    np.testing.assert_allclose(x.value.ravel(), b, atol=1e-4)


def test_warm_start_cache():
    rng = np.random.RandomState(11)
    m, n = 15, 8
    A = rng.randn(m, n)
    b = rng.randn(m)
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        0.5 * ep.sum_squares(A @ x - b) + 0.3 * ep.norm1(x)))
    prob.solve(rel_tol=1e-6, abs_tol=1e-8, warm_start=True)
    it1 = prob.solver_status.num_iterations
    prob.solve(rel_tol=1e-6, abs_tol=1e-8, warm_start=True)
    it2 = prob.solver_status.num_iterations
    assert it2 <= it1


@pytest.mark.parametrize("params", PARAMS[:2])
def test_chebyshev_norm_inf(params):
    """min ||Ax - b||_inf via the direct NORM_INF kernel; LP oracle."""
    rng = np.random.RandomState(12)
    m, n = 20, 6
    A = rng.randn(m, n)
    b = rng.randn(m)
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(ep.norm_inf(A @ x - b)))
    obj = prob.solve(rel_tol=1e-5, abs_tol=1e-7, max_iterations=8000, **params)

    c = np.concatenate([np.zeros(n), [1.0]])
    A_ub = np.block([[A, -np.ones((m, 1))], [-A, -np.ones((m, 1))]])
    b_ub = np.concatenate([b, -b])
    res = scipy.optimize.linprog(c, A_ub=A_ub, b_ub=b_ub,
                                 bounds=[(None, None)] * (n + 1))
    _assert_obj(obj, res.fun)


def test_sigma_max_regularized():
    """min sigma_max(X) + ||X - B||^2 via the direct SVD kernel; the
    solution is B with top singular values shrunk (prox at lam=1/2)."""
    rng = np.random.RandomState(13)
    m, n = 6, 5
    B = rng.randn(m, n)
    X = ep.Variable(m, n)
    prob = ep.Problem(ep.Minimize(ep.sigma_max(X) + ep.sum_squares(X - B)))
    obj = prob.solve(rel_tol=1e-6, abs_tol=1e-8, max_iterations=6000)

    from epsilon_tpu.ops.prox import matrix as mx
    import jax.numpy as jnp
    Xstar = np.asarray(mx.prox_sigma_max(jnp.asarray(B), 0.5))
    oracle = np.linalg.norm(Xstar, 2) + np.sum((Xstar - B) ** 2)
    _assert_obj(obj, oracle)
    np.testing.assert_allclose(np.asarray(X.value), Xstar, atol=2e-3)


def test_sigma_max_constraint():
    """min ||X - B||^2 s.t. sigma_max(X) <= 1 — spectral-ball projection."""
    rng = np.random.RandomState(14)
    m, n = 5, 5
    B = rng.randn(m, n) * 2
    X = ep.Variable(m, n)
    prob = ep.Problem(ep.Minimize(ep.sum_squares(X - B)),
                      [ep.sigma_max(X) <= 1.0])
    obj = prob.solve(rel_tol=1e-6, abs_tol=1e-8, max_iterations=6000)

    U, sv, Vt = np.linalg.svd(B, full_matrices=False)
    Xstar = (U * np.minimum(sv, 1.0)) @ Vt
    oracle = np.sum((Xstar - B) ** 2)
    _assert_obj(obj, oracle)
    np.testing.assert_allclose(np.asarray(X.value), Xstar, atol=2e-3)


def test_constant_epigraph_bound_binds():
    """Regression: f(x) <= const must introduce a pinned t-variable (the
    joint epigraph projection would otherwise drop the bound entirely)."""
    rng = np.random.RandomState(15)
    n = 6
    b = rng.randn(n) + 2.0
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(ep.sum_squares(x - b)),
                      [ep.max_entries(x) <= 1.0])
    prob.solve(rel_tol=1e-6, abs_tol=1e-8, max_iterations=6000)
    xs = np.asarray(x.value).ravel()
    assert xs.max() <= 1.0 + 1e-4
    np.testing.assert_allclose(xs, np.minimum(b, 1.0), atol=1e-3)


def test_group_norm_rows():
    """min 0.7*sum_i ||X_i,:|| + ||X - B||^2 — separable row-wise prox."""
    rng = np.random.RandomState(16)
    B = rng.randn(6, 4)
    X = ep.Variable(6, 4)
    prob = ep.Problem(ep.Minimize(
        0.7 * ep.sum_entries(ep.norm2(X, axis=1)) + ep.sum_squares(X - B)))
    obj = prob.solve(rel_tol=1e-6, abs_tol=1e-8, max_iterations=6000)
    lam = 0.35
    Xs = np.stack([max(0.0, 1 - lam / max(np.linalg.norm(r), 1e-30)) * r
                   for r in B])
    oracle = 0.7 * sum(np.linalg.norm(r) for r in Xs) + np.sum((Xs - B) ** 2)
    _assert_obj(obj, oracle)
    np.testing.assert_allclose(np.asarray(X.value), Xs, atol=1e-3)


def test_row_norm_epigraph_axis():
    """Per-row norm bounds norm2(X, axis=1) <= t via axis-mode epigraph."""
    rng = np.random.RandomState(17)
    B = rng.randn(6, 4) * 2
    X = ep.Variable(6, 4)
    t = ep.Variable(6)
    prob = ep.Problem(
        ep.Minimize(ep.sum_squares(X - B) + ep.sum_squares(t - 0.5)),
        [ep.norm2(X, axis=1) <= t])
    prob.solve(rel_tol=1e-6, abs_tol=1e-8, max_iterations=8000)
    Xv, tv = np.asarray(X.value), np.asarray(t.value).ravel()
    assert (np.linalg.norm(Xv, axis=1) <= tv + 1e-4).all()


def test_mixed_inf_norm_rows():
    """min sum_i ||X_i,:||_inf + ||X - B||^2 — axis-batched NORM_INF."""
    rng = np.random.RandomState(18)
    B = rng.randn(5, 4) * 2
    X = ep.Variable(5, 4)
    prob = ep.Problem(ep.Minimize(
        ep.sum_entries(ep.norm_inf(X, axis=1))
        + ep.sum_squares(X - B)))
    obj = prob.solve(rel_tol=1e-6, abs_tol=1e-8, max_iterations=6000)

    from epsilon_tpu.ops.prox import vector as vec
    import jax.numpy as jnp
    Xs = np.stack([np.asarray(vec.prox_norm_inf(jnp.asarray(r), 0.5))
                   for r in B])
    oracle = sum(np.abs(r).max() for r in Xs) + np.sum((Xs - B) ** 2)
    _assert_obj(obj, oracle)
