"""Axis-mode prox/epigraph coverage for the full separable kernel family.

The reference applies every 1-D kernel across rows/cols via a serial loop
(``vector_prox.cc:147-183``); here the operator layer vmaps the kernel over
slices (``ops/prox/operator.py`` axis paths).  Round-3 verdict: only
LSE/MAX/NORM_2 axis forms were exercised — this file adds the scaled-zone
family (norm_1 / hinge / deadzone / quantile), the Newton family
(sum_exp / logistic / neg_log / neg_entr / inv_pos), and norm_inf, each
validated per-slice against the independent epigraph/VI oracles
(``prox_test.py:250-287`` protocol).
"""

import numpy as np
import pytest

import epsilon_tpu as ep
from epsilon_tpu.ir import ProxKind
from oracles import check_epigraph, check_prox_vi

M, N = 5, 4


def _slices(V, axis):
    """Iterate 1-D slices along the REDUCTION axis (axis=0 -> columns)."""
    if axis == 0:
        return [V[:, j] for j in range(V.shape[1])]
    return [V[i, :] for i in range(V.shape[0])]


def _run_axis_epi(make_constraint, expected_kind, f_slice, axis,
                  domain=None, trials=2, tol=1e-5):
    """Project (V, s) onto {(X, t): f(X_slice_j) <= t_j for all slices j}
    and check every slice independently against the epigraph oracle —
    per-slice projections are independent, so the joint projection must
    equal the slice-wise one."""
    k = N if axis == 0 else M
    for trial in range(trials):
        rng = np.random.RandomState(300 + trial)
        V = rng.randn(M, N) * 1.5
        if domain == "pos":
            V = np.abs(V) + 0.5
        s = rng.randn(k)
        X_var = ep.Variable(M, N)
        # axis=0 reductions are row-shaped (1, n); match t's shape
        t_var = ep.Variable(1, k) if axis == 0 else ep.Variable(k)
        t_val = s.reshape(1, k) if axis == 0 else s
        constr = make_constraint(X_var, t_var)
        ep.eval_prox(constr, {X_var: V, t_var: t_val}, lam=1.0,
                     expected_kind=expected_kind, epigraph=True)
        X = X_var.value
        t = t_var.value.ravel()
        for j, (vj, xj) in enumerate(zip(_slices(V, axis), _slices(X, axis))):
            check_epigraph(f_slice, vj, float(s[j]), xj, float(t[j]),
                           rng=rng, tol=tol)


# --- scaled-zone family ------------------------------------------------------

@pytest.mark.parametrize("axis", [0, 1])
def test_epi_norm1_axis(axis):
    _run_axis_epi(lambda X, t: ep.norm1(X, axis=axis) <= t,
                  ProxKind.NORM_1, lambda z: np.sum(np.abs(z)), axis)


@pytest.mark.parametrize("axis", [0, 1])
def test_epi_hinge_axis(axis):
    _run_axis_epi(
        lambda X, t: ep.sum_entries(ep.max_elemwise(X, 0), axis=axis) <= t,
        ProxKind.SUM_HINGE, lambda z: np.sum(np.maximum(z, 0)), axis)


@pytest.mark.parametrize("axis", [0, 1])
def test_epi_deadzone_axis(axis):
    _run_axis_epi(
        lambda X, t: ep.sum_entries(
            ep.max_elemwise(ep.abs(X) - 0.5, 0), axis=axis) <= t,
        ProxKind.SUM_DEADZONE,
        lambda z: np.sum(np.maximum(np.abs(z) - 0.5, 0)), axis)


@pytest.mark.parametrize("axis", [0, 1])
def test_epi_quantile_axis(axis):
    a, b = 0.3, 0.7
    _run_axis_epi(
        lambda X, t: ep.sum_entries(
            ep.max_elemwise(a * X, -b * X), axis=axis) <= t,
        ProxKind.SUM_QUANTILE,
        lambda z: np.sum(np.maximum(a * z, -b * z)), axis)


# --- Newton family -----------------------------------------------------------

@pytest.mark.parametrize("axis", [0, 1])
def test_epi_sum_exp_axis(axis):
    _run_axis_epi(
        lambda X, t: ep.sum_entries(ep.exp(X), axis=axis) <= t,
        ProxKind.SUM_EXP, lambda z: np.sum(np.exp(z)), axis)


@pytest.mark.parametrize("axis", [0, 1])
def test_epi_logistic_axis(axis):
    _run_axis_epi(
        lambda X, t: ep.sum_entries(ep.logistic(X), axis=axis) <= t,
        ProxKind.SUM_LOGISTIC,
        lambda z: np.sum(np.logaddexp(0.0, z)), axis)


@pytest.mark.parametrize("axis", [0, 1])
def test_epi_neg_log_axis(axis):
    _run_axis_epi(
        lambda X, t: ep.sum_entries(-ep.log(X), axis=axis) <= t,
        ProxKind.SUM_NEG_LOG,
        lambda z: np.inf if np.any(z <= 0) else -np.sum(np.log(z)),
        axis, domain="pos")


@pytest.mark.parametrize("axis", [0, 1])
def test_epi_neg_entr_axis(axis):
    def f(z):
        if np.any(z < 0):
            return np.inf
        zp = np.where(z > 0, z, 1.0)
        return float(np.sum(np.where(z > 0, zp * np.log(zp), 0.0)))
    _run_axis_epi(
        lambda X, t: ep.sum_entries(-ep.entr(X), axis=axis) <= t,
        ProxKind.SUM_NEG_ENTR, f, axis, domain="pos", tol=2e-5)


@pytest.mark.parametrize("axis", [0, 1])
def test_epi_inv_pos_axis(axis):
    _run_axis_epi(
        lambda X, t: ep.sum_entries(ep.power(X, -1), axis=axis) <= t,
        ProxKind.SUM_INV_POS,
        lambda z: np.inf if np.any(z <= 1e-9) else float(np.sum(1.0 / z)),
        axis, domain="pos", tol=2e-5)


@pytest.mark.parametrize("axis", [0, 1])
def test_epi_norm_inf_axis(axis):
    _run_axis_epi(
        lambda X, t: ep.norm_inf(X, axis=axis) <= t,
        ProxKind.NORM_INF, lambda z: np.max(np.abs(z)), axis)


# --- prox-mode forms: nested/mixed sums compile to the flat separable kernel

def _flat_prox(f_expr_builder, expected_kind, f_np, domain=None):
    rng = np.random.RandomState(7)
    V = rng.randn(M, N)
    if domain == "pos":
        V = np.abs(V) + 0.5
    lam = 0.8
    X_var = ep.Variable(M, N)
    ep.eval_prox(f_expr_builder(X_var), {X_var: V}, lam=lam,
                 expected_kind=expected_kind)
    X = X_var.value
    check_prox_vi(f_np, V.ravel(order="F"), lam, X.ravel(order="F"), rng=rng,
                  tol=1e-5)


def test_prox_nested_sum_exp():
    """sum(sum(exp(X), axis=0)) == sum(exp(X)): flat separable kernel."""
    _flat_prox(lambda X: ep.sum_entries(ep.sum_entries(ep.exp(X), axis=0)),
               ProxKind.SUM_EXP, lambda z: np.sum(np.exp(z)))


def test_prox_mixed_norm1():
    """sum(norm1(X, axis=1)) == norm1(vec(X)): flat L1."""
    _flat_prox(lambda X: ep.sum_entries(ep.norm1(X, axis=1)),
               ProxKind.NORM_1, lambda z: np.sum(np.abs(z)))


def test_prox_nested_sum_hinge():
    _flat_prox(lambda X: ep.sum_entries(
        ep.sum_entries(ep.max_elemwise(X, 0), axis=1)),
        ProxKind.SUM_HINGE, lambda z: np.sum(np.maximum(z, 0)))


def test_prox_nested_logistic():
    _flat_prox(lambda X: ep.sum_entries(
        ep.sum_entries(ep.logistic(X), axis=0)),
        ProxKind.SUM_LOGISTIC, lambda z: np.sum(np.logaddexp(0.0, z)))


# --- end-to-end: per-column exp budget through the full ADMM solver ---------

def test_e2e_per_column_exp_budget():
    """min ||X - B||^2  s.t.  sum(exp(X), axis=0) <= c: solved per column by
    an independent scipy oracle (the problem separates across columns)."""
    import scipy.optimize
    rng = np.random.RandomState(11)
    m, n = 4, 3
    B = rng.randn(m, n)
    c = np.sum(np.exp(B), axis=0) * 0.5  # make the bound bind
    X = ep.Variable(m, n)
    prob = ep.Problem(ep.Minimize(ep.sum_squares(X - B)),
                      [ep.sum_entries(ep.exp(X), axis=0)
                       <= ep._wrap(c.reshape(1, n))])
    obj = prob.solve(rel_tol=1e-7, abs_tol=1e-9, max_iterations=4000)
    Xv = X.value
    assert (np.sum(np.exp(Xv), axis=0) <= c + 1e-3).all()
    ref_obj = 0.0
    for j in range(n):
        r = scipy.optimize.minimize(
            lambda x: np.sum((x - B[:, j]) ** 2),
            B[:, j] - 0.5,
            constraints=[{"type": "ineq",
                          "fun": lambda x, jj=j: c[jj] - np.sum(np.exp(x))}],
            method="SLSQP", options={"maxiter": 300, "ftol": 1e-12})
        ref_obj += r.fun
    assert obj <= ref_obj + 1e-3 * (1 + abs(ref_obj))
    assert obj >= ref_obj - 1e-3 * (1 + abs(ref_obj))
