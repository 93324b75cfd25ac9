"""Bridge validation against the FROZEN cvxpy-AST corpus.

``tests/fixtures/cvxpy_ast/*.json`` hold explicit attribute trees in real
cvxpy's public shape (class names / args order / atom attrs — e.g.
``sum_squares`` arrives as ``QuadOverLin(x, 1)``, matmul as
``MulExpression``).  The loader below reconstructs duck-typed objects
WITHOUT touching ``cvxpy_mini``'s expression builders, so the bridge is
exercised by a corpus that none of its own construction code produced;
solutions are checked against independent scipy/closed-form oracles.
Reference: ``python/epopt/cvxpy_expr.py:141-236``.
"""

import glob
import json
import os

import numpy as np
import pytest
import scipy.optimize

import cvxpy_mini

cvxpy_mini.install()
import cvxpy as cp  # noqa: E402  (real cvxpy if installed, else mini)

from epsilon_tpu.frontend import cvxpy_bridge  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "cvxpy_ast")

_ATOM_CLASSES = {}


def _atom_class(name):
    if name not in _ATOM_CLASSES:
        _ATOM_CLASSES[name] = type(name, (), {})
    return _ATOM_CLASSES[name]


def _load_expr(tree, var_reg):
    cls = tree["cls"]
    if cls == "Variable":
        vid = tree["id"]
        if vid not in var_reg:
            v = cp.Variable.__new__(cp.Variable)
            v.id = vid
            # real cvxpy's Variable.shape is a read-only property backed by
            # a private attribute; set the backing slot directly
            try:
                v.shape = tuple(tree["shape"])
            except AttributeError:
                v._shape = tuple(tree["shape"])
            v.value = None
            var_reg[vid] = v
        return var_reg[vid]
    if cls == "Constant":
        c = _atom_class("Constant")()
        c.value = np.asarray(tree["value"], dtype=float)
        c.args = []
        return c
    node = _atom_class(cls)()
    node.args = [_load_expr(a, var_reg) for a in tree.get("args", [])]
    for k, v in (tree.get("attrs") or {}).items():
        if k == "key":
            v = tuple(slice(*s) for s in v)
        if k == "shape":
            v = tuple(v)
        setattr(node, k, v)
    return node


class _DuckProblem:
    def __init__(self, objective, constraints, variables):
        self.objective = objective
        self.constraints = constraints
        self._vars = variables

    def variables(self):
        return self._vars


def load_fixture(path):
    with open(path) as f:
        spec = json.load(f)
    var_reg = {}
    expr = _load_expr(spec["objective"], var_reg)
    cons = [_load_expr(c, var_reg) for c in spec.get("constraints", [])]
    sense_cls = cp.Maximize if spec["sense"] == "Maximize" else cp.Minimize
    obj = sense_cls.__new__(sense_cls)
    obj.expr = expr
    prob = _DuckProblem(obj, cons, list(var_reg.values()))
    return prob, spec, var_reg


def _prox_grad(grad, prox, x0, L, iters=30000):
    x = x0
    for _ in range(iters):
        x = prox(x - grad(x) / L, 1.0 / L)
    return x


def _soft(v, t):
    return np.sign(v) * np.maximum(np.abs(v) - t, 0)


def _oracle_value(o):
    """Independent optimum for each fixture kind."""
    kind = o["kind"]
    if kind == "lasso":
        A, b, lam = np.asarray(o["A"]), np.asarray(o["b"]), o["lam"]
        L = 2 * 0.5 * np.linalg.norm(A, 2) ** 2
        x = _prox_grad(lambda x: A.T @ (A @ x - b),
                       lambda v, t: _soft(v, lam * t),
                       np.zeros(A.shape[1]), L)
        return 0.5 * np.sum((A @ x - b) ** 2) + lam * np.sum(np.abs(x))
    if kind == "ridge":
        A, b, lam = np.asarray(o["A"]), np.asarray(o["b"]), o["lam"]
        x = np.linalg.solve(A.T @ A + lam * np.eye(A.shape[1]), A.T @ b)
        return np.sum((A @ x - b) ** 2) + lam * np.sum(x * x)
    if kind == "nnls":
        A, b = np.asarray(o["A"]), np.asarray(o["b"])
        x, _ = scipy.optimize.nnls(A, b)
        return np.sum((A @ x - b) ** 2)
    if kind == "chebyshev":
        A, b = np.asarray(o["A"]), np.asarray(o["b"])
        m, n = A.shape
        # min t st -t <= Ax-b <= t
        c = np.r_[np.zeros(n), 1.0]
        G = np.r_[np.c_[A, -np.ones(m)], np.c_[-A, -np.ones(m)]]
        h = np.r_[b, -b]
        r = scipy.optimize.linprog(c, A_ub=G, b_ub=h,
                                   bounds=[(None, None)] * (n + 1))
        return r.fun
    if kind == "lad":
        A, b = np.asarray(o["A"]), np.asarray(o["b"])
        m, n = A.shape
        c = np.r_[np.zeros(n), np.ones(m)]
        G = np.r_[np.c_[A, -np.eye(m)], np.c_[-A, -np.eye(m)]]
        h = np.r_[b, -b]
        r = scipy.optimize.linprog(c, A_ub=G, b_ub=h,
                                   bounds=[(None, None)] * (n + m))
        return r.fun
    if kind == "group":
        w, lam = np.asarray(o["w"]), o["lam"]
        # separable: min ||s-w_g||^2 + lam ||s||  per group of 3
        val = 0.0
        for g in (slice(0, 3), slice(3, 6)):
            wg = w[g]
            nw = np.linalg.norm(wg)
            s = np.zeros(3) if nw <= lam / 2 else wg * (1 - lam / (2 * nw))
            val += np.sum((s - wg) ** 2) + lam * np.linalg.norm(s)
        return val
    if kind == "logreg":
        Ay, lam = np.asarray(o["Ay"]), o["lam"]
        L = 0.25 * np.linalg.norm(Ay, 2) ** 2 + 1.0
        x = _prox_grad(
            lambda x: Ay.T @ (1.0 / (1.0 + np.exp(-(Ay @ x)))),
            lambda v, t: _soft(v, lam * t), np.zeros(Ay.shape[1]), L)
        z = Ay @ x
        return np.sum(np.logaddexp(0.0, z)) + lam * np.sum(np.abs(x))
    if kind == "huber":
        A, b, M = np.asarray(o["A"]), np.asarray(o["b"]), o["M"]

        def f(x):
            r = A @ x - b
            a = np.abs(r)
            return np.sum(np.where(a <= M, a * a, 2 * M * a - M * M))
        r = scipy.optimize.minimize(f, np.zeros(A.shape[1]), method="BFGS",
                                    options=dict(maxiter=2000, gtol=1e-10))
        return r.fun
    if kind == "box_qp":
        w = np.asarray(o["w"])
        x = np.clip(w, -1, 1)
        return np.sum((x - w) ** 2)
    if kind == "eq_ls":
        A, b = np.asarray(o["A"]), np.asarray(o["b"])
        C, d = np.asarray(o["C"]), np.asarray(o["d"])
        n, p = A.shape[1], C.shape[0]
        K = np.zeros((n + p, n + p))
        K[:n, :n] = 2 * A.T @ A
        K[:n, n:] = C.T
        K[n:, :n] = C
        rhs = np.r_[2 * A.T @ b, d]
        sol = np.linalg.solve(K, rhs)
        x = sol[:n]
        return np.sum((A @ x - b) ** 2)
    if kind == "max_plus_quad":
        A, b = np.asarray(o["A"]), np.asarray(o["b"])
        n = A.shape[1]

        def f(z):
            x, t = z[:n], z[n]
            return t + np.sum(x * x)
        cons = [dict(type="ineq",
                     fun=lambda z, i=i: z[n] - (A[i] @ z[:n] - b[i]))
                for i in range(A.shape[0])]
        r = scipy.optimize.minimize(f, np.zeros(n + 1), constraints=cons,
                                    method="SLSQP",
                                    options=dict(maxiter=500, ftol=1e-12))
        return r.fun
    if kind == "lse":
        A, lam = np.asarray(o["A"]), o["lam"]

        def f(x):
            z = A @ x
            mx = z.max()
            return mx + np.log(np.sum(np.exp(z - mx))) + lam * np.sum(x * x)
        r = scipy.optimize.minimize(f, np.zeros(A.shape[1]), method="BFGS",
                                    options=dict(maxiter=2000, gtol=1e-12))
        return r.fun
    if kind == "abs_max":
        w = np.asarray(o["w"])
        val = 0.0
        for wi in w:
            r = scipy.optimize.minimize_scalar(
                lambda s: abs(s - wi) + max(s, 0.0) + 0.5 * s * s,
                bounds=(-10, 10), method="bounded",
                options=dict(xatol=1e-10))
            val += r.fun
        return val
    if kind == "matrix_soft":
        M, lam = np.asarray(o["M"]), o["lam"]
        X = _soft(M, lam / 2)
        return np.sum((X - M) ** 2) + lam * np.sum(np.abs(X))
    if kind == "maximize_neg_quad":
        return 0.0
    raise ValueError(kind)


FIXTURES = sorted(glob.glob(os.path.join(FIXDIR, "*.json")))


@pytest.mark.parametrize("path", FIXTURES,
                         ids=[os.path.basename(p)[:-5] for p in FIXTURES])
def test_fixture_roundtrip(path):
    prob, spec, var_reg = load_fixture(path)
    obj = cvxpy_bridge.solve(prob, rel_tol=1e-6, abs_tol=1e-9,
                             max_iterations=20000)
    oracle = _oracle_value(spec["oracle"])
    assert np.isfinite(obj)
    tol = 2e-3 * max(1.0, abs(oracle)) + 2e-4
    assert obj <= oracle + tol, (obj, oracle)
    assert obj >= oracle - tol, (obj, oracle)
    # write-back happened for the fixture's variables
    for v in prob.variables():
        assert v.value is not None


def test_corpus_covers_fifteen_problems():
    assert len(FIXTURES) >= 15
