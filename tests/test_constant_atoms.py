"""Atom evaluation at constants (constant_atoms_test.py parity): every atom
evaluated through the compiler's constant evaluator matches numpy truth, and
constant objective addends survive to the reported objective."""

import numpy as np
import pytest

import epsilon_tpu as ep
from epsilon_tpu.compiler.affine import constant_value
from epsilon_tpu.frontend import expression as ex

rng = np.random.RandomState(0)
C = rng.randn(4, 3)
D = rng.randn(4, 3)
S = rng.randn(4, 4)
v = rng.randn(4, 1)

CASES = [
    ("add", ep._wrap(C) + D, C + D),
    ("sub", ep._wrap(C) - D, C - D),
    ("neg", -ep._wrap(C), -C),
    ("scale", 2.5 * ep._wrap(C), 2.5 * C),
    ("matmul", ep._wrap(C.T) * ep._wrap(D), C.T @ D),
    ("mul_elemwise", ep.mul_elemwise(C, D), C * D),
    ("index", ep._wrap(C)[1:3, 0:2], C[1:3, 0:2]),
    ("transpose", ep.transpose(C), C.T),
    ("reshape", ep.reshape(C, 3, 4), C.reshape((3, 4), order="F")),
    ("sum", ep.sum_entries(C), np.full((1, 1), C.sum())),
    ("sum_ax0", ep.sum_entries(C, axis=0), C.sum(axis=0, keepdims=True)),
    ("sum_ax1", ep.sum_entries(C, axis=1), C.sum(axis=1, keepdims=True)),
    ("hstack", ep.hstack(C, D), np.hstack([C, D])),
    ("vstack", ep.vstack(C, D), np.vstack([C, D])),
    ("trace", ep.trace(S), np.full((1, 1), np.trace(S))),
    ("diag_vec", ep.diag(ep._wrap(v)), np.diag(v.ravel())),
    ("diag_mat", ep.diag(ep._wrap(S)), np.diag(S).reshape(-1, 1)),
    ("kron", ep.kron(np.eye(2), C), np.kron(np.eye(2), C)),
    ("abs", ep.abs(C), np.abs(C)),
    ("exp", ep.exp(C), np.exp(C)),
    ("log", ep.log(ep._wrap(np.abs(C) + 1)), np.log(np.abs(C) + 1)),
    ("square", ep.square(C), C * C),
    ("max_elemwise", ep.max_elemwise(C, D), np.maximum(C, D)),
    ("min_elemwise", ep.min_elemwise(C, D), np.minimum(C, D)),
]


@pytest.mark.parametrize("name,expr,expected", CASES,
                         ids=[c[0] for c in CASES])
def test_constant_evaluation(name, expr, expected):
    assert expr.dcp_props.constant
    np.testing.assert_allclose(constant_value(expr), expected, atol=1e-12)


def test_constant_objective_addend():
    rng = np.random.RandomState(1)
    n = 5
    b = rng.randn(n)
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(ep.sum_squares(x - b) + 7.0))
    obj = prob.solve(rel_tol=1e-6, abs_tol=1e-9)
    np.testing.assert_allclose(obj, 7.0, atol=1e-4)
    np.testing.assert_allclose(x.value.ravel(), b, atol=1e-4)
