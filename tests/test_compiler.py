"""Compiler structure tests (mirror compiler/compiler_test.py: compile known
problems, assert the multiset of emitted prox kinds and constraint counts)."""

import numpy as np
import pytest

import epsilon_tpu as ep
from epsilon_tpu.compiler import compile_problem, text_format
from epsilon_tpu.ir import ProxKind


def _kinds(prox_problem):
    return sorted(t.spec.kind.value + (":epi" if t.spec.epigraph else "")
                  for t in prox_problem.terms)


def _compile(prob, **kw):
    return compile_problem(prob.expression_problem(), **kw)


def test_lasso_structure(rng):
    m, n = 10, 5
    A = rng.randn(m, n)
    b = rng.randn(m)
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        ep.sum_squares(A @ x - b) + 2.0 * ep.norm1(x)))
    p = _compile(prob)
    assert _kinds(p) == ["norm_1", "sum_square"]
    assert len(p.constraints) == 1  # x separated into copy
    # alpha folded into norm_1 term
    norm1_term = [t for t in p.terms if t.spec.kind == ProxKind.NORM_1][0]
    assert norm1_term.spec.alpha == 2.0
    txt = text_format.format_problem(p)
    assert "sum_square" in txt and "norm_1" in txt


def test_nonneg_ls_structure(rng):
    m, n = 8, 4
    A = rng.randn(m, n)
    b = rng.randn(m)
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(ep.sum_squares(A @ x - b)), [x >= 0])
    p = _compile(prob)
    assert _kinds(p) == ["non_negative", "sum_square"]
    assert len(p.constraints) == 1


def test_tv1d_structure(rng):
    n = 20
    x = ep.Variable(n)
    b = rng.randn(n)
    prob = ep.Problem(ep.Minimize(
        ep.sum_squares(x - b) + 0.5 * ep.tv(x)))
    p = _compile(prob)
    assert _kinds(p) == ["sum_square", "total_variation_1d"]
    assert len(p.constraints) == 1


def test_hinge_structure(rng):
    m, n = 12, 4
    X = rng.randn(m, n)
    y = np.sign(rng.randn(m))
    y[y == 0] = 1
    theta = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        ep.hinge_loss(theta, X, y) + ep.norm1(theta)))
    p = _compile(prob)
    # like the reference (compiler_test.py:36-40), the data-matrix variable
    # is separated behind an epigraph split and kept via a CONSTANT term
    assert _kinds(p) == ["constant", "norm_1", "sum_hinge"]
    assert len(p.constraints) == 2


def test_epigraph_compilation(rng):
    """norm2 <= affine becomes an SOC prox term."""
    n = 5
    x = ep.Variable(n)
    t = ep.Variable(1)
    prob = ep.Problem(ep.Minimize(ep.sum_squares(x - rng.randn(n)) + 1.0 * t),
                      [ep.norm2(x) <= t])
    p = _compile(prob)
    kinds = _kinds(p)
    assert "second_order_cone" in kinds


def test_max_entries_epigraph(rng):
    n = 6
    x = ep.Variable(n)
    b = rng.randn(n)
    prob = ep.Problem(ep.Minimize(ep.max_entries(x) + ep.sum_squares(x - b)))
    p = _compile(prob)
    assert _kinds(p) == ["max", "sum_square"]


def test_logreg_structure(rng):
    m, n = 10, 4
    X = rng.randn(m, n)
    y = np.sign(rng.randn(m))
    y[y == 0] = 1
    theta = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        ep.logistic_loss(theta, X, y) + 0.1 * ep.norm1(theta)))
    p = _compile(prob)
    assert _kinds(p) == ["constant", "norm_1", "sum_logistic"]


def test_use_epigraph_false(rng):
    """With epigraph rules off, norm1 <= t goes through the conic path."""
    n = 4
    x = ep.Variable(n)
    t = ep.Variable(1)
    prob = ep.Problem(ep.Minimize(ep.sum_squares(x - rng.randn(n)) + t),
                      [ep.norm1(x) <= t])
    p_epi = _compile(prob, use_epigraph=True)
    assert any(tm.spec.epigraph for tm in p_epi.terms)
    p_con = _compile(prob, use_epigraph=False)
    assert not any(tm.spec.epigraph for tm in p_con.terms)


def test_sum_largest_structure(rng):
    n = 6
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        ep.sum_largest(x, 3) + ep.sum_squares(x - rng.randn(n))))
    p = _compile(prob)
    assert "sum_largest" in _kinds(p)
    term = [t for t in p.terms if t.spec.kind == ProxKind.SUM_LARGEST][0]
    assert term.spec.k == 3


def test_matrix_problem_structure(rng):
    """covsel-style: -log det(S) + trace(S A) + norm1."""
    n = 4
    A = rng.randn(n, n)
    A = A @ A.T + n * np.eye(n)
    S = ep.Variable(n, n)
    prob = ep.Problem(ep.Minimize(
        -ep.log_det(S) + ep.trace(A @ S) + ep.norm1(ep.vec(S))))
    p = _compile(prob)
    kinds = _kinds(p)
    assert "neg_log_det" in kinds
    assert "norm_1" in kinds
    assert "affine" in kinds


def test_constant_objective():
    x = ep.Variable(3)
    prob = ep.Problem(ep.Minimize(ep.sum_squares(x)), [x == np.ones(3)])
    p = _compile(prob)
    assert "sum_square" in _kinds(p)
    assert len(p.constraints) == 1


def test_deadzone_structure(rng):
    n = 5
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        ep.sum_entries(ep.max_elemwise(ep.abs(x) - 0.5, 0))
        + ep.sum_squares(x - rng.randn(n))))
    p = _compile(prob)
    assert "sum_deadzone" in _kinds(p)


def test_quantile_structure(rng):
    n = 5
    x = ep.Variable(n)
    alpha = 0.3
    z = x - rng.randn(n)
    prob = ep.Problem(ep.Minimize(
        ep.sum_entries(ep.max_elemwise(
            ep.mul_elemwise(np.full((n, 1), -alpha), z),
            ep.mul_elemwise(np.full((n, 1), 1 - alpha), z)))
        + ep.sum_squares(x)))
    p = _compile(prob)
    assert "sum_quantile" in _kinds(p)


def test_norm_inf_structure(rng):
    """norm_inf matches the direct NORM_INF kernel, not the conic fallback."""
    m, n = 8, 4
    A = rng.randn(m, n)
    b = rng.randn(m)
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        ep.norm_inf(A @ x - b) + 0.1 * ep.sum_squares(x)))
    p = _compile(prob)
    assert "norm_inf" in _kinds(p)


def test_sigma_max_structure(rng):
    """sigma_max matches the direct SVD kernel instead of the reference's
    (m+n)x(m+n) SDP embedding (conic.py transform_sigma_max)."""
    m, n = 5, 4
    X = ep.Variable(m, n)
    B = rng.randn(m, n)
    prob = ep.Problem(ep.Minimize(
        ep.sigma_max(X) + ep.sum_squares(X - B)))
    p = _compile(prob)
    kinds = _kinds(p)
    assert "sigma_max" in kinds
    assert "semidefinite" not in kinds  # no SDP embedding


def test_sigma_max_epigraph_structure(rng):
    m, n = 4, 3
    X = ep.Variable(m, n)
    B = rng.randn(m, n)
    prob = ep.Problem(ep.Minimize(ep.sum_squares(X - B)),
                      [ep.sigma_max(X) <= 2.0])
    p = _compile(prob)
    assert "sigma_max:epi" in _kinds(p)


def test_group_norm_axis_structure(rng):
    """sum(norm2(X, axis=1)) matches the direct axis-batched NORM_2 kernel
    (vmapped rows), not the conic SOC detour."""
    X = ep.Variable(6, 4)
    B = rng.randn(6, 4)
    prob = ep.Problem(ep.Minimize(
        ep.sum_entries(ep.norm2(X, axis=1)) + ep.sum_squares(X - B)))
    p = _compile(prob)
    kinds = _kinds(p)
    assert "norm_2" in kinds and "second_order_cone" not in kinds
    term = [t for t in p.terms if t.spec.kind == ProxKind.NORM_2][0]
    assert term.spec.axis == 1


def test_axis_epigraph_structure(rng):
    """Per-row epigraph norm2(X, axis=1) <= t compiles to an axis-mode
    epigraph term (vmapped per-slice projections)."""
    X = ep.Variable(5, 3)
    t = ep.Variable(5)
    prob = ep.Problem(ep.Minimize(ep.sum_squares(X) + ep.sum_entries(t)),
                      [ep.norm2(X, axis=1) <= t])
    p = _compile(prob)
    assert "norm_2:epi" in _kinds(p)
    term = [t_ for t_ in p.terms if t_.spec.kind == ProxKind.NORM_2][0]
    assert term.spec.axis == 1 and term.spec.epigraph
