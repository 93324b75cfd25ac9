"""The full 27-problem x 3-param-set oracle matrix.

Mirrors the reference's ``solve_test.py:26-78``: every problem family in the
library (``python/epopt/problems/``) is solved end-to-end under the three
parameter sets {two-block + epigraph (default), N-block Gauss-Seidel,
epigraph off (conic fallback)}, and the achieved objective — recomputed in
pure numpy at the returned variable values — is compared one-sidedly against
an INDEPENDENT oracle optimum (``obj_ours <= obj_oracle + 1e-2|obj| + 1e-4``,
the reference's criterion), plus explicit feasibility checks for hard
constraints.

Oracle sources (never epsilon_tpu code):
- scipy.optimize.linprog for the LP-representable families,
- sklearn / closed forms / FISTA-with-exact-prox in numpy for composite
  problems,
- an independent numpy ADMM (SVT) for robust PCA,
- smoothed L-BFGS for isotropic 2-D TV,
- Powell polish STARTED AT OUR SOLUTION for the minimax families: for a
  convex problem any local descent from our point exposes suboptimality, so
  oracle = min(Powell(0), Powell(x_ours)) makes the one-sided check sharp.

Problem instances are built in-test with explicit data at tiny sizes (same
structure as ``epsilon_tpu/problems/*.py``, cited per case) so the oracles
see the data.  The default param set runs in the fast tier; the other two
are ``slow`` (run with ``-m ""``).
"""

import numpy as np
import pytest
import scipy.optimize
import scipy.sparse as sp

import epsilon_tpu as ep
from epsilon_tpu.solvers import SolverKind

PARAMS = [
    pytest.param(dict(), id="two_block"),
    pytest.param(dict(solver=SolverKind.PROX_ADMM), id="n_block",
                 marks=pytest.mark.slow),
    pytest.param(dict(use_epigraph=False), id="no_epi",
                 marks=pytest.mark.slow),
]

SOLVE = dict(rel_tol=1e-4, abs_tol=1e-6, max_iterations=20000)


def _assert_obj(ours, oracle, rel=1e-2, abs_=1e-4):
    assert ours <= oracle + rel * abs(oracle) + abs_, f"{ours} vs {oracle}"


def _powell_polish(f, x_ours, x0s=(), maxiter=60000):
    """Convex-problem optimality certificate: Powell descent from our own
    solution (plus independent starts); if our point is suboptimal the
    polish finds a better one and the one-sided check fails."""
    best = f(x_ours)
    for s in (x_ours,) + tuple(x0s):
        r = scipy.optimize.minimize(f, np.asarray(s, dtype=float),
                                    method="Powell",
                                    options={"maxiter": maxiter,
                                             "xtol": 1e-10, "ftol": 1e-12})
        best = min(best, r.fun)
    return best


def _fista(grad_f, L, prox_g, x0, iters=20000):
    x = np.asarray(x0, dtype=float).copy()
    y = x.copy()
    t = 1.0
    for _ in range(iters):
        x_new = prox_g(y - grad_f(y) / L, 1.0 / L)
        t_new = 0.5 * (1 + np.sqrt(1 + 4 * t * t))
        y = x_new + ((t - 1) / t_new) * (x_new - x)
        x, t = x_new, t_new
    return x


def _soft(v, t):
    return np.sign(v) * np.maximum(np.abs(v) - t, 0.0)


def _value(var):
    return np.asarray(var.value)


# ---------------------------------------------------------------------------
# 1-3. lasso / mv_lasso / sparse_lasso  (problems/lasso.py:8-16)
# ---------------------------------------------------------------------------

def _lasso_case(rng, m, n, k=1, sparse=False):
    if sparse:
        A = sp.rand(m, n, 0.3, format="csc", random_state=rng)
        A.data = rng.randn(A.nnz)
        Ad = A.toarray()
    else:
        A = Ad = rng.randn(m, n)
    B = Ad @ (rng.randn(n, k) * (rng.rand(n, k) < 0.4)) + 0.1 * rng.randn(m, k)
    lam = 0.5 * np.abs(Ad.T @ B).max()
    X = ep.Variable(n, k)
    f = ep.sum_squares(ep._wrap(A) * X - B) + lam * ep.norm1(ep.vec(X))
    return ep.Problem(ep.Minimize(f)), (Ad, B, lam, X)


def _lasso_oracle(Ad, B, lam):
    # objective ||AX-B||_F^2 + lam||vec X||_1 is separable over columns;
    # sklearn solves 1/(2m)||Ax-b||^2 + alpha||x||_1
    from sklearn.linear_model import Lasso
    m = Ad.shape[0]
    total = 0.0
    for j in range(B.shape[1]):
        model = Lasso(alpha=lam / (2 * m), fit_intercept=False, tol=1e-14,
                      max_iter=200000)
        model.fit(Ad, B[:, j])
        w = model.coef_
        total += np.sum((Ad @ w - B[:, j]) ** 2) + lam * np.abs(w).sum()
    return total


@pytest.mark.parametrize("params", PARAMS)
@pytest.mark.parametrize("variant", ["lasso", "mv_lasso", "sparse_lasso"])
def test_lasso_family(variant, params):
    rng = np.random.RandomState(0)
    k = 3 if variant == "mv_lasso" else 1
    prob, (Ad, B, lam, X) = _lasso_case(
        rng, 16, 8, k=k, sparse=(variant == "sparse_lasso"))
    prob.solve(**SOLVE, **params)
    Xv = np.asarray(X.value).reshape(8, k)
    ours = np.sum((Ad @ Xv - B) ** 2) + lam * np.abs(Xv).sum()
    _assert_obj(ours, _lasso_oracle(Ad, B, lam))


# ---------------------------------------------------------------------------
# 4. logreg_l1  (problems/logreg_l1.py:7-19)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_logreg_l1(params):
    rng = np.random.RandomState(1)
    m, n = 25, 6
    X = rng.randn(m, n)
    y = np.sign(rng.randn(m))
    y[y == 0] = 1
    lam = 0.4
    th = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        ep.logistic_loss(th, X, y) + lam * ep.norm1(th)))
    prob.solve(**SOLVE, **params)
    t = _value(th).ravel()

    def f(t):
        return np.sum(np.logaddexp(0, -y * (X @ t))) + lam * np.abs(t).sum()

    L = np.linalg.norm(X, 2) ** 2 / 4
    t_o = _fista(lambda t: X.T @ (-y / (1 + np.exp(y * (X @ t)))), L,
                 lambda v, s: _soft(v, lam * s), np.zeros(n))
    _assert_obj(f(t), f(t_o))


# ---------------------------------------------------------------------------
# 5-7. hinge / hinge_l1 / hinge_l2  (problems/hinge*.py)
# ---------------------------------------------------------------------------

def _classification(rng, m, n):
    A = rng.randn(m, n)
    A /= np.sqrt(np.sum(A ** 2, 0))
    y = np.sign(A @ (rng.randn(n) * (rng.rand(n) < 0.5)) + 0.1 * rng.randn(m))
    y[y == 0] = 1
    return A, y


@pytest.mark.parametrize("params", PARAMS)
@pytest.mark.parametrize("variant", ["hinge", "hinge_l1", "hinge_l2"])
def test_hinge_family(variant, params):
    rng = np.random.RandomState(2)
    m, n = 20, 5
    A, y = _classification(rng, m, n)
    lam = 0.3
    th = ep.Variable(n)
    f_expr = ep.hinge_loss(th, A, y)
    if variant == "hinge_l1":
        f_expr = f_expr + lam * ep.norm1(th)
    elif variant == "hinge_l2":
        f_expr = f_expr + lam * ep.sum_squares(th)
    prob = ep.Problem(ep.Minimize(f_expr))
    prob.solve(**SOLVE, **params)
    t = _value(th).ravel()

    def f(t):
        loss = np.maximum(0, 1 - y * (A @ t)).sum()
        if variant == "hinge_l1":
            return loss + lam * np.abs(t).sum()
        if variant == "hinge_l2":
            return loss + lam * np.sum(t * t)
        return loss

    if variant == "hinge_l2":
        oracle = _powell_polish(f, t, x0s=(np.zeros(n),))
    else:
        # LP oracle: min 1's (+ lam 1'u) s.t. s >= 0, s >= 1 - y a'x,
        # (-u <= x <= u for l1)
        Dy = y[:, None] * A
        if variant == "hinge_l1":
            c = np.concatenate([np.zeros(n), np.ones(m), lam * np.ones(n)])
            A_ub = np.block([
                [-Dy, -np.eye(m), np.zeros((m, n))],
                [np.zeros((m, n)), -np.eye(m), np.zeros((m, n))],
                [np.eye(n), np.zeros((n, m)), -np.eye(n)],
                [-np.eye(n), np.zeros((n, m)), -np.eye(n)]])
            b_ub = np.concatenate([-np.ones(m), np.zeros(m),
                                   np.zeros(n), np.zeros(n)])
            bounds = [(None, None)] * (2 * n + m)
        else:
            c = np.concatenate([np.zeros(n), np.ones(m)])
            A_ub = np.block([[-Dy, -np.eye(m)],
                             [np.zeros((m, n)), -np.eye(m)]])
            b_ub = np.concatenate([-np.ones(m), np.zeros(m)])
            bounds = [(None, None)] * (n + m)
        res = scipy.optimize.linprog(c, A_ub=A_ub, b_ub=b_ub, bounds=bounds)
        oracle = res.fun
    _assert_obj(f(t), oracle)


# ---------------------------------------------------------------------------
# 8. basis_pursuit  (problems/basis_pursuit.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_basis_pursuit(params):
    rng = np.random.RandomState(3)
    m, n = 8, 24
    A = rng.randn(m, n)
    b = A @ (rng.randn(n) * (rng.rand(n) < 0.2))
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(ep.norm1(x)), [ep._wrap(A) * x == b])
    prob.solve(**SOLVE, **params)
    xv = _value(x).ravel()
    np.testing.assert_allclose(A @ xv, b, atol=5e-3)
    res = scipy.optimize.linprog(
        np.ones(2 * n), A_eq=np.hstack([A, -A]), b_eq=b,
        bounds=[(0, None)] * (2 * n))
    _assert_obj(np.abs(xv).sum(), res.fun, abs_=5e-3)


# ---------------------------------------------------------------------------
# 9. least_abs_dev  (problems/least_abs_dev.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_least_abs_dev(params):
    rng = np.random.RandomState(4)
    m, n = 20, 5
    A = rng.randn(m, n)
    b = A @ rng.randn(n) + 0.2 * rng.randn(m)
    b[::7] += 10.0
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(ep.norm1(ep._wrap(A) * x - b)))
    prob.solve(**SOLVE, **params)
    xv = _value(x).ravel()
    c = np.concatenate([np.zeros(n), np.ones(m)])
    A_ub = np.block([[A, -np.eye(m)], [-A, -np.eye(m)]])
    res = scipy.optimize.linprog(c, A_ub=A_ub,
                                 b_ub=np.concatenate([b, -b]),
                                 bounds=[(None, None)] * (n + m))
    _assert_obj(np.abs(A @ xv - b).sum(), res.fun)


# ---------------------------------------------------------------------------
# 10. lp  (problems/lp.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_lp(params):
    rng = np.random.RandomState(5)
    m, n = 6, 10
    A = np.abs(rng.randn(m, n))
    b = A @ np.abs(rng.randn(n))
    c = rng.rand(n) + 0.5
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(ep._wrap(c.reshape(1, -1)) * x),
                      [ep._wrap(A) * x == b, x >= 0])
    prob.solve(**SOLVE, **params)
    xv = _value(x).ravel()
    assert xv.min() >= -5e-4
    np.testing.assert_allclose(A @ xv, b, atol=5e-3)
    res = scipy.optimize.linprog(c, A_eq=A, b_eq=b, bounds=[(0, None)] * n)
    _assert_obj(float(c @ np.maximum(xv, 0)), res.fun, abs_=5e-3)


# ---------------------------------------------------------------------------
# 11. qp  (problems/qp.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_qp(params):
    rng = np.random.RandomState(6)
    n = 8
    P = rng.rand(n, n)
    P = P.T @ P + np.eye(n)
    q = rng.randn(n)
    lb, ub = rng.randn(n), rng.randn(n)
    lb, ub = np.minimum(lb, ub), np.maximum(lb, ub)
    L = np.linalg.cholesky(P)
    x = ep.Variable(n)
    prob = ep.Problem(
        ep.Minimize(0.5 * ep.sum_squares(ep._wrap(L.T) * x)
                    + ep._wrap(q.reshape(1, -1)) * x),
        [x >= lb, x <= ub])
    prob.solve(**SOLVE, **params)
    xv = np.clip(_value(x).ravel(), lb, ub)

    def f(z):
        return 0.5 * z @ P @ z + q @ z

    r = scipy.optimize.minimize(
        f, np.clip(np.zeros(n), lb, ub), jac=lambda z: P @ z + q,
        method="L-BFGS-B", bounds=list(zip(lb, ub)),
        options={"maxiter": 20000, "ftol": 1e-15, "gtol": 1e-12})
    _assert_obj(f(xv), r.fun)


# ---------------------------------------------------------------------------
# 12. chebyshev  (problems/chebyshev.py; minimax + SOC constraints)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_chebyshev(params):
    rng = np.random.RandomState(7)
    m, n, k = 8, 4, 4
    As = [rng.randn(m, n) / np.sqrt(m) for _ in range(k)]
    B = rng.randn(k, n) / np.sqrt(k)
    c = rng.rand(k)
    x = ep.Variable(n)
    t = ep.Variable(k)
    f = ep.max_entries(t + ep.abs(ep._wrap(B) * x - c))
    C = [ep.norm2(ep._wrap(As[i]) * x) <= t[i] for i in range(k)]
    prob = ep.Problem(ep.Minimize(f), C)
    prob.solve(**SOLVE, **params)
    xv = _value(x).ravel()

    # at the optimum t_i = ||A_i x||, so the problem reduces to an
    # unconstrained minimax over x
    def fr(z):
        return max(np.linalg.norm(As[i] @ z) + abs(B[i] @ z - c[i])
                   for i in range(k))

    oracle = _powell_polish(fr, xv, x0s=(np.zeros(n),))
    _assert_obj(fr(xv), oracle)


# ---------------------------------------------------------------------------
# 13. covsel  (problems/covsel.py:5-24)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_covsel(params):
    rng = np.random.RandomState(8)
    n = 3
    A = rng.randn(n, n)
    S = A @ A.T / n + np.eye(n)
    lam = 0.1
    W = np.ones((n, n)) - np.eye(n)
    Th = ep.Variable(n, n)
    prob = ep.Problem(ep.Minimize(
        lam * ep.norm1(ep.vec(ep.mul_elemwise(W, Th)))
        + ep.sum_entries(ep.mul_elemwise(S, Th)) - ep.log_det(Th)))
    prob.solve(**SOLVE, **params)
    Tv = np.asarray(Th.value)
    Tv = 0.5 * (Tv + Tv.T)

    def f(s):
        M = 0.5 * (s.reshape(n, n) + s.reshape(n, n).T)
        w = np.linalg.eigvalsh(M)
        if np.any(w <= 1e-9):
            return 1e10
        return (lam * np.abs(W * M).sum() + np.sum(S * M)
                - np.sum(np.log(w)))

    oracle = _powell_polish(f, Tv.ravel(), x0s=(np.eye(n).ravel(),))
    _assert_obj(f(Tv.ravel()), oracle, rel=2e-2)


# ---------------------------------------------------------------------------
# 14. fused_lasso  (problems/fused_lasso.py:7-22)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_fused_lasso(params):
    rng = np.random.RandomState(9)
    m, n = 15, 10
    A = rng.randn(m, n) / np.sqrt(m)
    b = A @ np.repeat(rng.randn(5), 2) + 0.05 * rng.randn(m)
    lam = 0.1
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        ep.sum_squares(ep._wrap(A) * x - b) + lam * ep.norm1(x)
        + lam * ep.tv(x)))
    prob.solve(**SOLVE, **params)
    xv = _value(x).ravel()
    D = np.diff(np.eye(n), axis=0)

    def f(z):
        return (np.sum((A @ z - b) ** 2) + lam * np.abs(z).sum()
                + lam * np.abs(D @ z).sum())

    # QP reformulation with l1 slacks, solved by SLSQP
    def g(w):
        z, t, s = w[:n], w[n:2 * n], w[2 * n:]
        return np.sum((A @ z - b) ** 2) + lam * t.sum() + lam * s.sum()

    cons = [
        {"type": "ineq", "fun": lambda w: w[n:2 * n] - w[:n]},
        {"type": "ineq", "fun": lambda w: w[n:2 * n] + w[:n]},
        {"type": "ineq", "fun": lambda w: w[2 * n:] - D @ w[:n]},
        {"type": "ineq", "fun": lambda w: w[2 * n:] + D @ w[:n]},
    ]
    w0 = np.zeros(3 * n - 1)
    r = scipy.optimize.minimize(g, w0, method="SLSQP", constraints=cons,
                                options={"maxiter": 2000, "ftol": 1e-14})
    _assert_obj(f(xv), r.fun)


# ---------------------------------------------------------------------------
# 15. group_lasso  (problems/group_lasso.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_group_lasso(params):
    rng = np.random.RandomState(10)
    m = 18
    part = [3, 2, 4, 3]
    n = sum(part)
    pb = np.cumsum(part)
    pa = np.hstack((0, pb[:-1]))
    A = rng.randn(m, n) / np.sqrt(m)
    b = A @ rng.randn(n) + 0.05 * rng.randn(m)
    lam = 0.15
    x = ep.Variable(n)
    f_expr = 0.5 * ep.sum_squares(ep._wrap(A) * x - b)
    for i in range(len(part)):
        f_expr = f_expr + lam * ep.norm2(x[int(pa[i]):int(pb[i])])
    prob = ep.Problem(ep.Minimize(f_expr))
    prob.solve(**SOLVE, **params)
    xv = _value(x).ravel()

    def f(z):
        return (0.5 * np.sum((A @ z - b) ** 2)
                + lam * sum(np.linalg.norm(z[pa[i]:pb[i]])
                            for i in range(len(part))))

    def prox(v, s):
        out = v.copy()
        for i in range(len(part)):
            g = v[pa[i]:pb[i]]
            ng = np.linalg.norm(g)
            out[pa[i]:pb[i]] = max(0.0, 1 - lam * s / max(ng, 1e-30)) * g
        return out

    L = np.linalg.norm(A, 2) ** 2
    x_o = _fista(lambda z: A.T @ (A @ z - b), L, prox, np.zeros(n))
    _assert_obj(f(xv), f(x_o))


# ---------------------------------------------------------------------------
# 16. huber  (problems/huber.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_huber(params):
    rng = np.random.RandomState(11)
    m, n = 20, 5
    A = rng.randn(m, n)
    b = A @ rng.randn(n) + 0.1 * rng.randn(m)
    b[::6] += 8.0
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(ep.sum_entries(ep.huber(ep._wrap(A) * x - b))))
    prob.solve(**SOLVE, **params)
    xv = _value(x).ravel()

    def f(z):
        r = A @ z - b
        a = np.abs(r)
        return np.where(a <= 1.0, r * r, 2 * a - 1).sum()

    # huber is smooth: L-BFGS oracle with analytic gradient
    def grad(z):
        r = A @ z - b
        return A.T @ (2 * np.clip(r, -1.0, 1.0))

    r = scipy.optimize.minimize(f, np.zeros(n), jac=grad, method="L-BFGS-B",
                                options={"maxiter": 20000, "ftol": 1e-15})
    _assert_obj(f(xv), r.fun)


# ---------------------------------------------------------------------------
# 17. infinite_push  (problems/infinite_push.py, functions.py infinite_push)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_infinite_push(params):
    rng = np.random.RandomState(12)
    mp, mn, d = 5, 5, 3
    Xp = rng.randn(mp, d) / np.sqrt(mp)
    Xn = rng.randn(mn, d) / np.sqrt(mn)
    lam = 1.0
    th = ep.Variable(d)
    prob = ep.Problem(ep.Minimize(
        ep.infinite_push(th, Xp, Xn) + lam * ep.sum_squares(th)))
    prob.solve(**SOLVE, **params)
    tv = _value(th).ravel()

    def f(t):
        Z = np.maximum(0, 1 - (np.outer(Xp @ t, np.ones(mn))
                               - np.outer(np.ones(mp), Xn @ t)))
        return Z.sum(axis=0).max() + lam * np.sum(t * t)

    oracle = _powell_polish(f, tv, x0s=(np.zeros(d),))
    _assert_obj(f(tv), oracle)


# ---------------------------------------------------------------------------
# 18. max_gaussian  (problems/max_gaussian.py; sum_largest + log_det epigraph)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_max_gaussian(params):
    rng = np.random.RandomState(13)
    m, n, k = 6, 3, 3
    A = rng.rand(m, n)
    A -= A.mean(axis=0)
    K = np.array([np.outer(A[i], A[i]).flatten(order="F") for i in range(m)])

    sigma = ep.Variable(n, n)
    t = ep.Variable(m)
    tdet = ep.Variable(1)
    f = ep.sum_largest(t + tdet, k)
    z = ep._wrap(K) * ep.reshape(sigma, n * n, 1)
    prob = ep.Problem(ep.Minimize(f), [-ep.log_det(sigma) <= tdet, t == z])
    prob.solve(**SOLVE, **params)
    Sv = np.asarray(sigma.value)
    Sv = 0.5 * (Sv + Sv.T)

    # tdet binds at -log det(sigma); sum_largest(v + c, k) = sum_largest(v,k)
    # + k*c, so the problem reduces to an unconstrained min over sigma > 0
    def fr(s):
        M = 0.5 * (s.reshape(n, n) + s.reshape(n, n).T)
        w = np.linalg.eigvalsh(M)
        if np.any(w <= 1e-9):
            return 1e10
        v = K @ M.flatten(order="F")
        return np.sort(v)[-k:].sum() - k * np.sum(np.log(w))

    oracle = _powell_polish(fr, Sv.ravel(), x0s=(np.eye(n).ravel(),))
    _assert_obj(fr(Sv.ravel()), oracle, rel=2e-2)


# ---------------------------------------------------------------------------
# 19. max_softmax  (problems/max_softmax.py; sum_largest of row-LSE)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_max_softmax(params):
    rng = np.random.RandomState(14)
    k, m, n, p = 3, 6, 3, 3
    X = rng.randn(m, n) / np.sqrt(m)
    Y = rng.randint(0, k, m)
    from epsilon_tpu.frontend.functions import one_hot
    Yi = one_hot(Y, k)

    Theta = ep.Variable(n, k)
    t = ep.Variable(1)
    texp = ep.Variable(m)
    f = t + ep.sum_largest(texp, p) + ep.sum_squares(Theta)
    C = [ep.log_sum_exp(ep._wrap(X) * Theta, axis=1) <= texp,
         -ep.sum_entries(ep.mul_elemwise(X.T.dot(Yi), Theta)) == t]
    prob = ep.Problem(ep.Minimize(f), C)
    prob.solve(**SOLVE, **params)
    Tv = np.asarray(Theta.value)

    # texp binds at the row-LSE, t is determined: reduce to min over Theta
    G = X.T @ Yi

    def fr(w):
        T = w.reshape(n, k)
        lse = scipy.special.logsumexp(X @ T, axis=1)
        return (-np.sum(G * T) + np.sort(lse)[-p:].sum() + np.sum(T * T))

    import scipy.special
    oracle = _powell_polish(fr, Tv.ravel(), x0s=(np.zeros(n * k),))
    _assert_obj(fr(Tv.ravel()), oracle)


# ---------------------------------------------------------------------------
# 20. oneclass_svm  (problems/oneclass_svm.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_oneclass_svm(params):
    rng = np.random.RandomState(15)
    m, n = 10, 3
    A = rng.randn(m, n)
    A /= np.sqrt(np.sum(A ** 2, axis=1))[:, None]
    lam = 1.0
    x = ep.Variable(n)
    rho = ep.Variable(1)
    t = ep.Variable(1)
    z = np.sum(A ** 2, axis=1) - 2 * ep._wrap(A) * x + t
    f = ((1.0 / n) * ep.sum_entries(ep.max_elemwise(z - rho, 0))
         + lam * ep.sum_entries(ep.max_elemwise(rho, 0)))
    prob = ep.Problem(ep.Minimize(f), [ep.sum_squares(x) <= t])
    prob.solve(**SOLVE, **params)
    w = np.concatenate([_value(x).ravel(), np.asarray(rho.value).ravel()])

    # t binds at ||x||^2, so z_i = ||a_i - x||^2
    def fr(w):
        xx, rr = w[:n], w[n]
        zz = np.sum((A - xx[None, :]) ** 2, axis=1)
        return (np.maximum(zz - rr, 0).sum() / n + lam * max(rr, 0.0))

    oracle = _powell_polish(fr, w, x0s=(np.zeros(n + 1),))
    _assert_obj(fr(w), oracle)


# ---------------------------------------------------------------------------
# 21. portfolio  (problems/portfolio.py:5-21)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_portfolio(params):
    rng = np.random.RandomState(16)
    m, n = 3, 8
    mu = np.exp(0.01 * rng.randn(n)) - 1
    D = rng.rand(n) / 10
    F = rng.randn(n, m) / 10
    gamma = 1.0
    x = ep.Variable(n)
    f = (ep._wrap(mu.reshape(1, -1)) * x
         - gamma * (ep.sum_squares(ep._wrap(F.T) * x)
                    + ep.sum_squares(ep.mul_elemwise(D.reshape(-1, 1), x))))
    prob = ep.Problem(ep.Maximize(f), [ep.sum_entries(x) == 1.0, x >= 0])
    prob.solve(**SOLVE, **params)
    xv = np.maximum(_value(x).ravel(), 0)
    xv = xv / xv.sum()  # project back onto the simplex for a feasible value

    def fneg(z):
        return -(mu @ z - gamma * (np.sum((F.T @ z) ** 2)
                                   + np.sum((D * z) ** 2)))

    r = scipy.optimize.minimize(
        fneg, np.ones(n) / n, method="SLSQP",
        constraints=[{"type": "eq", "fun": lambda z: z.sum() - 1.0}],
        bounds=[(0, None)] * n, options={"maxiter": 2000, "ftol": 1e-14})
    # maximize: our achieved value must be >= oracle - tol
    assert -fneg(xv) >= -r.fun - 1e-2 * abs(r.fun) - 1e-4


# ---------------------------------------------------------------------------
# 22. quantile  (problems/quantile.py; pinball LP w/ noncrossing constraints)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_quantile(params):
    rng = np.random.RandomState(17)
    m, n, k = 10, 3, 3
    X = np.exp(-(np.linspace(0, 1, n)[None, :] - rng.rand(m)[:, None]) ** 2)
    y = np.sin(rng.rand(m) * 3)
    alphas = np.linspace(1.0 / (k + 1), 1 - 1.0 / (k + 1), k)

    Theta = ep.Variable(n, k)
    f = ep.quantile_loss(alphas, Theta, X, y)
    C = [ep._wrap(X) * (Theta[:, :-1] - Theta[:, 1:]) >= 0]
    prob = ep.Problem(ep.Minimize(f), C)
    prob.solve(**SOLVE, **params)
    Tv = np.asarray(Theta.value)

    def f_np(T):
        Z = X @ T - y[:, None]
        return np.maximum(-alphas[None, :] * Z,
                          (1 - alphas)[None, :] * Z).sum()

    # feasibility: noncrossing
    cross = (X @ (Tv[:, :-1] - Tv[:, 1:])).min()
    assert cross >= -5e-3

    # LP oracle: vars (vec Theta  [col-major], vec S); S >= +-alpha-scaled Z
    nt, ns = n * k, m * k
    blocks = []
    for j in range(k):
        row = np.zeros((m, nt))
        row[:, j * n:(j + 1) * n] = X
        blocks.append(row)
    XT = np.vstack(blocks)                      # (m*k, nt): vec(X Theta)
    yv = np.tile(y, k)
    Aup = np.vstack([
        np.hstack([-(np.repeat(alphas, m)[:, None] * XT), -np.eye(ns)]),
        np.hstack([np.repeat(1 - alphas, m)[:, None] * XT, -np.eye(ns)]),
    ])
    bup = np.concatenate([
        -np.repeat(alphas, m) * yv,
        np.repeat(1 - alphas, m) * yv,
    ])
    # noncrossing: X theta_j - X theta_{j+1} >= 0
    rows = []
    for j in range(k - 1):
        r = np.zeros((m, nt + ns))
        r[:, j * n:(j + 1) * n] = -X
        r[:, (j + 1) * n:(j + 2) * n] = X
        rows.append(r)
    A_ub = np.vstack([Aup] + rows)
    b_ub = np.concatenate([bup, np.zeros(m * (k - 1))])
    c = np.concatenate([np.zeros(nt), np.ones(ns)])
    res = scipy.optimize.linprog(c, A_ub=A_ub, b_ub=b_ub,
                                 bounds=[(None, None)] * (nt + ns))
    _assert_obj(f_np(Tv), res.fun)


# ---------------------------------------------------------------------------
# 23. robust_pca  (problems/robust_pca.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_robust_pca(params):
    rng = np.random.RandomState(18)
    n, r = 5, 2
    M = rng.randn(n, r) @ rng.randn(r, n)
    mask = rng.rand(n, n) < 0.1
    M[mask] += 5 * rng.randn(int(mask.sum()))
    lam = 0.2
    L = ep.Variable(n, n)
    S = ep.Variable(n, n)
    prob = ep.Problem(ep.Minimize(
        ep.norm_nuc(L) + lam * ep.norm1(ep.vec(S))), [L + S == M])
    prob.solve(**SOLVE, **params)
    Lv, Sv = np.asarray(L.value), np.asarray(S.value)
    np.testing.assert_allclose(Lv + Sv, M, atol=5e-3)
    Sv = M - Lv  # exact-feasible point
    ours = np.linalg.norm(Lv, "nuc") + lam * np.abs(Sv).sum()

    # independent numpy ADMM with SVT (standard RPCA splitting)
    Lo = np.zeros_like(M)
    So = np.zeros_like(M)
    U = np.zeros_like(M)
    for _ in range(4000):
        W, sv, Vt = np.linalg.svd(M - So - U, full_matrices=False)
        Lo = (W * np.maximum(sv - 1.0, 0)) @ Vt
        So = _soft(M - Lo - U, lam)
        U += Lo + So - M
    So = M - Lo
    oracle = np.linalg.norm(Lo, "nuc") + lam * np.abs(So).sum()
    _assert_obj(ours, oracle)


# ---------------------------------------------------------------------------
# 24. robust_svm  (problems/robust_svm.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_robust_svm(params):
    rng = np.random.RandomState(19)
    m, n = 12, 4
    A = rng.randn(m, n) / np.sqrt(m)
    y = np.sign(rng.randn(m))
    y[y == 0] = 1
    P = np.zeros((n, n))
    P[:n - 1, :n - 1] = rng.randn(n - 1, n - 1)
    lam = 1.0
    x = ep.Variable(n)
    t = ep.Variable(1)
    z = 1 - ep._wrap(sp.diags(y) @ A) * x + t
    f = lam * ep.sum_squares(x) + ep.sum_entries(ep.max_elemwise(z, 0))
    prob = ep.Problem(ep.Minimize(f), [ep.norm1(ep._wrap(P.T) * x) <= t])
    prob.solve(**SOLVE, **params)
    xv = _value(x).ravel()

    # t binds at ||P'x||_1
    def fr(w):
        tt = np.abs(P.T @ w).sum()
        return (lam * np.sum(w * w)
                + np.maximum(1 - y * (A @ w) + tt, 0).sum())

    oracle = _powell_polish(fr, xv, x0s=(np.zeros(n),))
    _assert_obj(fr(xv), oracle)


# ---------------------------------------------------------------------------
# 25. tv_1d  (problems/tv_1d.py:5-20; exact taut-string oracle)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_tv_1d(params):
    rng = np.random.RandomState(20)
    n = 40
    b = np.repeat(rng.randn(4), 10) + 0.3 * rng.randn(n)
    lam = 1.5
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        0.5 * ep.sum_squares(x - b) + lam * ep.tv(x)))
    prob.solve(**SOLVE, **params)
    xv = _value(x).ravel()
    from epsilon_tpu.ops.prox.tv1d import tv1d_exact_numpy
    x_o = tv1d_exact_numpy(b, lam)

    def f(z):
        return 0.5 * np.sum((z - b) ** 2) + lam * np.abs(np.diff(z)).sum()

    _assert_obj(f(xv), f(x_o))


# ---------------------------------------------------------------------------
# 26. tv_denoise  (problems/tv_denoise.py; isotropic color 2-D TV)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_tv_denoise(params):
    rng = np.random.RandomState(21)
    n = 5
    Y = np.zeros((n, n, 3))
    Y[1:4, 1:4, :] = 1.0
    Y += 0.15 * rng.randn(n, n, 3)
    lam = 0.5
    X = [ep.Variable(n, n) for _ in range(3)]
    f = ep.sum_squares(X[0] - Y[:, :, 0])
    for i in (1, 2):
        f = f + ep.sum_squares(X[i] - Y[:, :, i])
    f = f + lam * ep.tv2(*X)
    prob = ep.Problem(ep.Minimize(f))
    prob.solve(**SOLVE, **params)
    Xv = np.stack([np.asarray(Xc.value) for Xc in X], axis=2)

    def f_np(w):
        Z = w.reshape(n, n, 3)
        fid = np.sum((Z - Y) ** 2)
        g2 = np.zeros((n - 1, n - 1))
        for c in range(3):
            dx = Z[1:, :-1, c] - Z[:-1, :-1, c]
            dy = Z[:-1, 1:, c] - Z[:-1, :-1, c]
            g2 = g2 + dx ** 2 + dy ** 2
        return fid + lam * np.sum(np.sqrt(g2))

    # smoothed L-BFGS oracle: sqrt(g2 + eps) upper-bounds the true TV by
    # lam * (n-1)^2 * sqrt(eps) ~ 1e-5
    eps = 1e-12

    def f_s(w):
        Z = w.reshape(n, n, 3)
        fid = np.sum((Z - Y) ** 2)
        g2 = np.full((n - 1, n - 1), eps)
        for c in range(3):
            dx = Z[1:, :-1, c] - Z[:-1, :-1, c]
            dy = Z[:-1, 1:, c] - Z[:-1, :-1, c]
            g2 = g2 + dx ** 2 + dy ** 2
        return fid + lam * np.sum(np.sqrt(g2))

    r = scipy.optimize.minimize(f_s, Y.ravel(), method="L-BFGS-B",
                                options={"maxiter": 50000, "ftol": 1e-16,
                                         "gtol": 1e-12})
    _assert_obj(f_np(Xv.ravel()), r.fun)


# ---------------------------------------------------------------------------
# 27. mnist  (problems/mnist.py; multiclass softmax + l1)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("params", PARAMS)
def test_mnist(params):
    import scipy.special
    rng = np.random.RandomState(22)
    m, n, k = 15, 5, 3
    X = rng.randn(m, n) / np.sqrt(m)
    y = rng.randint(0, k, m)
    lam = 0.05
    from epsilon_tpu.frontend.functions import one_hot
    Yi = one_hot(y, k)
    G = X.T @ Yi

    Theta = ep.Variable(n, k)
    prob = ep.Problem(ep.Minimize(
        ep.softmax_loss(Theta, X, y) + lam * ep.norm1(ep.vec(Theta))))
    prob.solve(**SOLVE, **params)
    Tv = np.asarray(Theta.value)

    def f(T):
        lse = scipy.special.logsumexp(X @ T, axis=1)
        return lse.sum() - np.sum(G * T) + lam * np.abs(T).sum()

    # FISTA oracle: smooth softmax gradient + exact l1 prox
    L = np.linalg.norm(X, 2) ** 2

    def grad(T):
        Z = X @ T.reshape(n, k)
        Pm = np.exp(Z - scipy.special.logsumexp(Z, axis=1, keepdims=True))
        return (X.T @ Pm - G).ravel()

    w_o = _fista(grad, L, lambda v, s: _soft(v, lam * s), np.zeros(n * k))
    _assert_obj(f(Tv), f(w_o.reshape(n, k)))
