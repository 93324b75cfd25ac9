"""eval_prox harness tests (``prox_test.py:250-287`` protocol): build a tiny
frontend problem for f, compile, assert the matched ProxFunction kind, run
the kernel once via eval_prox, verify against the prox variational
inequality and scipy."""

import numpy as np
import pytest

import epsilon_tpu as ep
from epsilon_tpu.ir import ProxKind
from oracles import check_prox_scipy, check_prox_vi

N = 6


def _run(f_builder, expected_kind, f_np, lam=None, trials=3, smooth=False,
         epigraph=None, scale=1.0, domain=None):
    for trial in range(trials):
        rng = np.random.RandomState(100 + trial)
        v = rng.randn(N) * scale
        if domain == "pos":
            v = np.abs(v) + 0.5
        lam_t = lam if lam is not None else 10.0 ** rng.uniform(-1, 0.7)
        x_var = ep.Variable(N)
        f = f_builder(x_var)
        out = ep.eval_prox(f, {x_var: v}, lam=lam_t,
                           expected_kind=expected_kind, epigraph=epigraph)
        x = x_var.value.ravel()
        check_prox_vi(f_np, v, lam_t, x, rng=rng, tol=1e-5)
        if smooth is not None:
            check_prox_scipy(f_np, v, lam_t, x, smooth=smooth, rng=rng,
                             tol=1e-5)


def test_norm1():
    _run(lambda x: ep.norm1(x), ProxKind.NORM_1,
         lambda z: np.sum(np.abs(z)))


def test_norm1_weighted():
    """norm1(w .* x) exercises the diagonal reduction."""
    rng = np.random.RandomState(0)
    w = rng.rand(N) + 0.5
    v = rng.randn(N) * 2
    lam = 0.7
    x_var = ep.Variable(N)
    ep.eval_prox(ep.norm1(ep.mul_elemwise(w.reshape(-1, 1), x_var)),
                 {x_var: v}, lam=lam, expected_kind=ProxKind.NORM_1)
    x = x_var.value.ravel()
    check_prox_vi(lambda z: np.sum(w * np.abs(z)), v, lam, x, rng=rng)


def test_hinge():
    _run(lambda x: ep.sum_entries(ep.max_elemwise(x, 0)), ProxKind.SUM_HINGE,
         lambda z: np.sum(np.maximum(z, 0)))


def test_deadzone():
    _run(lambda x: ep.sum_entries(ep.max_elemwise(ep.abs(x) - 0.5, 0)),
         ProxKind.SUM_DEADZONE,
         lambda z: np.sum(np.maximum(np.abs(z) - 0.5, 0)))


def test_sum_square():
    _run(lambda x: ep.sum_squares(x), ProxKind.SUM_SQUARE,
         lambda z: np.sum(z * z), smooth=True)


def test_sum_square_affine():
    """sum_squares(Ax - b): the KKT-based general path."""
    rng = np.random.RandomState(1)
    A = rng.randn(8, N)
    b = rng.randn(8)
    v = rng.randn(N)
    lam = 0.8
    x_var = ep.Variable(N)
    ep.eval_prox(ep.sum_squares(ep._wrap(A) * x_var - b), {x_var: v}, lam=lam,
                 expected_kind=ProxKind.SUM_SQUARE)
    x = x_var.value.ravel()
    # closed form: (I + 2 lam A'A) x = v + 2 lam A'b
    expected = np.linalg.solve(np.eye(N) + 2 * lam * A.T @ A,
                               v + 2 * lam * A.T @ b)
    np.testing.assert_allclose(x, expected, atol=1e-6)


def test_norm2():
    _run(lambda x: ep.norm2(x), ProxKind.NORM_2,
         lambda z: np.linalg.norm(z))


def test_max():
    _run(lambda x: ep.max_entries(x), ProxKind.MAX, lambda z: np.max(z))


def test_sum_largest():
    _run(lambda x: ep.sum_largest(x, 3), ProxKind.SUM_LARGEST,
         lambda z: np.sum(np.sort(z)[::-1][:3]))


def test_log_sum_exp():
    _run(lambda x: ep.log_sum_exp(x), ProxKind.LOG_SUM_EXP,
         lambda z: np.log(np.sum(np.exp(z - z.max()))) + z.max(), smooth=True)


def test_sum_exp():
    _run(lambda x: ep.sum_entries(ep.exp(x)), ProxKind.SUM_EXP,
         lambda z: np.sum(np.exp(z)), smooth=True)


def test_sum_logistic():
    _run(lambda x: ep.sum_entries(ep.logistic(x)), ProxKind.SUM_LOGISTIC,
         lambda z: np.sum(np.logaddexp(0, z)), smooth=True)


def test_sum_neg_log():
    def f(z):
        if np.any(z <= 0):
            return np.inf
        return -np.sum(np.log(z))
    _run(lambda x: ep.sum_entries(-ep.log(x)), ProxKind.SUM_NEG_LOG, f,
         smooth=None)


def test_sum_neg_entr():
    def f(z):
        if np.any(z < 0):
            return np.inf
        with np.errstate(all="ignore"):
            return float(np.sum(np.where(z > 0, z * np.log(np.maximum(z, 1e-300)), 0)))
    _run(lambda x: ep.sum_entries(-ep.entr(x)), ProxKind.SUM_NEG_ENTR, f,
         smooth=None)


def test_sum_inv_pos():
    def f(z):
        if np.any(z <= 0):
            return np.inf
        return np.sum(1.0 / z)
    _run(lambda x: ep.sum_entries(ep.power(x, -1)), ProxKind.SUM_INV_POS, f,
         smooth=None, domain="pos")


def test_non_negative():
    rng = np.random.RandomState(2)
    v = rng.randn(N)
    x_var = ep.Variable(N)
    ep.eval_prox(ep.sum_entries(ep.max_elemwise(x_var, 0)), {x_var: v},
                 lam=1e12, expected_kind=ProxKind.SUM_HINGE)
    # large-lam hinge behaves like projection onto x <= 0... use direct kind:
    # indicator compiles through constraints; test the direct projection
    from epsilon_tpu.frontend import expression as exl
    # projection via solve: min I(x>=0) + 1/2||x - v||^2
    prob = ep.Problem(ep.Minimize(ep.sum_squares(x_var - v)), [x_var >= 0])
    prob.solve(rel_tol=1e-6, abs_tol=1e-9)
    np.testing.assert_allclose(x_var.value.ravel(), np.maximum(v, 0),
                               atol=1e-4)


def test_total_variation_1d():
    rng = np.random.RandomState(3)
    n = 30
    v = np.cumsum(rng.randn(n))
    lam = 0.8
    x_var = ep.Variable(n)
    ep.eval_prox(ep.tv(x_var), {x_var: v}, lam=lam,
                 expected_kind=ProxKind.TOTAL_VARIATION_1D)
    x = x_var.value.ravel()
    from epsilon_tpu.ops.prox.tv1d import tv1d_exact_numpy
    np.testing.assert_allclose(x, tv1d_exact_numpy(v, lam), atol=5e-4)


def test_neg_log_det():
    rng = np.random.RandomState(4)
    n = 4
    V = rng.randn(n, n)
    V = 0.5 * (V + V.T)
    lam = 0.5
    X_var = ep.Variable(n, n)
    ep.eval_prox(-ep.log_det(X_var), {X_var: V}, lam=lam,
                 expected_kind=ProxKind.NEG_LOG_DET)
    X = X_var.value
    # spectral solution
    d, U = np.linalg.eigh(V)
    dd = 0.5 * (d + np.sqrt(d * d + 4 * lam))
    np.testing.assert_allclose(X, (U * dd) @ U.T, atol=1e-6)


def test_norm_nuclear():
    rng = np.random.RandomState(5)
    m, n = 5, 4
    V = rng.randn(m, n)
    lam = 0.6
    X_var = ep.Variable(m, n)
    ep.eval_prox(ep.norm_nuc(X_var), {X_var: V}, lam=lam,
                 expected_kind=ProxKind.NORM_NUCLEAR)
    U, s, Vt = np.linalg.svd(V, full_matrices=False)
    np.testing.assert_allclose(X_var.value,
                               (U * np.maximum(s - lam, 0)) @ Vt, atol=1e-6)


def test_lambda_max():
    rng = np.random.RandomState(6)
    n = 4
    V = rng.randn(n, n)
    V = 0.5 * (V + V.T)
    X_var = ep.Variable(n, n)
    ep.eval_prox(ep.lambda_max(X_var), {X_var: V}, lam=0.7,
                 expected_kind=ProxKind.LAMBDA_MAX)
    X = X_var.value
    def f(z):
        Z = z.reshape(n, n)
        return np.max(np.linalg.eigvalsh(0.5 * (Z + Z.T)))
    def sampler(rng):
        B = rng.randn(n, n) * 10.0 ** rng.uniform(-2, 0.5)
        return (X + 0.5 * (B + B.T)).ravel()
    check_prox_vi(f, V.ravel(), 0.7, X.ravel(), sampler=sampler,
                  rng=rng)


# --- epigraph variants through the compiler --------------------------------

def _run_epi(make_constraint, expected_kind, f_np, trials=2):
    for trial in range(trials):
        rng = np.random.RandomState(200 + trial)
        v = rng.randn(N) * 2
        s = rng.randn()
        x_var = ep.Variable(N)
        t_var = ep.Variable(1)
        constr = make_constraint(x_var, t_var)
        out = ep.eval_prox(constr, {x_var: v, t_var: np.array([s])}, lam=1.0,
                           expected_kind=expected_kind, epigraph=True)
        x = x_var.value.ravel()
        t = float(t_var.value.ravel()[0])
        from oracles import check_epigraph
        check_epigraph(f_np, v, s, x, t, rng=rng, tol=1e-5)


def test_epi_norm1():
    _run_epi(lambda x, t: ep.norm1(x) <= t, ProxKind.NORM_1,
             lambda z: np.sum(np.abs(z)))


def test_epi_max():
    _run_epi(lambda x, t: ep.max_entries(x) <= t, ProxKind.MAX,
             lambda z: np.max(z))


def test_epi_sum_square():
    _run_epi(lambda x, t: ep.sum_squares(x) <= t, ProxKind.SUM_SQUARE,
             lambda z: np.sum(z * z))


def test_epi_log_sum_exp():
    _run_epi(lambda x, t: ep.log_sum_exp(x) <= t, ProxKind.LOG_SUM_EXP,
             lambda z: float(np.log(np.sum(np.exp(z - z.max()))) + z.max()))


def test_eval_prox_type_mismatch_raises():
    x = ep.Variable(N)
    with pytest.raises(ValueError):
        ep.eval_prox(ep.norm1(x), {x: np.zeros(N)}, lam=1.0,
                     expected_kind=ProxKind.NORM_2)
