"""Generate the frozen cvxpy-AST fixture corpus (tests/fixtures/cvxpy_ast).

Each fixture is the EXPLICIT attribute tree a real ``cvxpy.Problem``
exposes to the bridge (class names, ``args`` order, atom attributes),
written out node-by-node — deliberately NOT built through
``tests/cvxpy_mini``'s expression builders, so the corpus is an
independent structural falsifier for ``frontend/cvxpy_bridge.py``
(reference: ``python/epopt/cvxpy_expr.py:141-236``).

Class names follow real cvxpy >= 1.1 semantics the bridge dispatches on;
notably ``sum_squares`` lowers to ``QuadOverLin(x, 1)`` and ``A @ x`` is a
``MulExpression`` — shapes cvxpy_mini could have gotten wrong without this
corpus noticing.

Run ``python tests/gen_cvxpy_fixtures.py`` to regenerate (deterministic).
If real cvxpy is ever installable, regenerate by serializing actual
``cvxpy.Problem`` objects instead and diff.
"""

import json
import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "fixtures", "cvxpy_ast")


def var(vid, *shape):
    return {"cls": "Variable", "id": vid, "shape": list(shape)}


def const(value):
    return {"cls": "Constant", "value": np.asarray(value).tolist()}


def node(cls, *args, **attrs):
    return {"cls": cls, "args": list(args), "attrs": attrs}


def add(*args):
    return node("AddExpression", *args)


def neg(a):
    return node("NegExpression", a)


def matmul(a, b):
    return node("MulExpression", a, b)


def scale(alpha, a):
    # real cvxpy: scalar Constant * expr promotes through MulExpression
    return node("MulExpression", const(alpha), a)


def sum_squares(a):
    # cvxpy.sum_squares(x) == quad_over_lin(x, 1)
    return node("QuadOverLin", a, const(1.0))


def norm1(a):
    return node("norm1", a)


def pnorm(a, p, axis=None):
    return node("Pnorm", a, p=p, axis=axis)


def problem(sense, expr, constraints=(), oracle=None, name=""):
    return {"name": name, "sense": sense, "objective": expr,
            "constraints": list(constraints), "oracle": oracle}


def main():
    rng = np.random.RandomState(7)
    os.makedirs(OUT, exist_ok=True)
    fixtures = []

    # 1. lasso:  0.5*sum_squares(A@x - b) + 0.4*norm1(x)
    m, n = 16, 8
    A = rng.randn(m, n).round(4)
    b = rng.randn(m).round(4)
    x = var(101, n)
    fixtures.append(problem(
        "Minimize",
        add(scale(0.5, sum_squares(add(matmul(const(A), x), neg(const(b))))),
            scale(0.4, norm1(x))),
        name="lasso",
        oracle={"kind": "lasso", "A": A.tolist(), "b": b.tolist(),
                "lam": 0.4, "var": 101}))

    # 2. ridge (pure QuadOverLin + sum_squares composition)
    fixtures.append(problem(
        "Minimize",
        add(sum_squares(add(matmul(const(A), x), neg(const(b)))),
            scale(0.3, sum_squares(x))),
        name="ridge",
        oracle={"kind": "ridge", "A": A.tolist(), "b": b.tolist(),
                "lam": 0.3, "var": 101}))

    # 3. nonneg least squares:  sum_squares(A@x-b) s.t. x >= 0
    # real cvxpy: (x >= 0) is Inequality(Constant(0), x) ... the bridge
    # consumes Inequality(args[0] <= args[1]) as leq
    fixtures.append(problem(
        "Minimize",
        sum_squares(add(matmul(const(A), x), neg(const(b)))),
        constraints=[node("Inequality", neg(x), const(np.zeros(n)))],
        name="nnls",
        oracle={"kind": "nnls", "A": A.tolist(), "b": b.tolist(),
                "var": 101}))

    # 4. chebyshev: minimize norm_inf(A@x - b)
    fixtures.append(problem(
        "Minimize", node("norm_inf", add(matmul(const(A), x), neg(const(b)))),
        name="chebyshev",
        oracle={"kind": "chebyshev", "A": A.tolist(), "b": b.tolist(),
                "var": 101}))

    # 5. least abs dev: norm1(A@x - b)
    fixtures.append(problem(
        "Minimize", norm1(add(matmul(const(A), x), neg(const(b)))),
        name="lad",
        oracle={"kind": "lad", "A": A.tolist(), "b": b.tolist(),
                "var": 101}))

    # 6. group norm: sum of norm2 on slices (index nodes)
    x2 = var(102, 6)
    w = rng.randn(6).round(4)
    fixtures.append(problem(
        "Minimize",
        add(sum_squares(add(x2, neg(const(w)))),
            scale(0.5, pnorm(node("index", x2, key=[[0, 3, 1]]), 2)),
            scale(0.5, pnorm(node("index", x2, key=[[3, 6, 1]]), 2))),
        name="group",
        oracle={"kind": "group", "w": w.tolist(), "lam": 0.5, "var": 102}))

    # 7. logistic regression:  sum(logistic(-y*(A@x))) + norm1
    y = np.where(rng.rand(m) > 0.5, 1.0, -1.0)
    Ay = (-(y[:, None] * A)).round(4)
    fixtures.append(problem(
        "Minimize",
        add(node("Sum", node("logistic", matmul(const(Ay), x)), axis=None),
            scale(0.2, norm1(x))),
        name="logreg",
        oracle={"kind": "logreg", "Ay": Ay.tolist(), "lam": 0.2,
                "var": 101}))

    # 8. huber regression
    fixtures.append(problem(
        "Minimize",
        node("Sum", node("huber", add(matmul(const(A), x), neg(const(b))),
                         M=1.0), axis=None),
        name="huber",
        oracle={"kind": "huber", "A": A.tolist(), "b": b.tolist(), "M": 1.0,
                "var": 101}))

    # 9. box-constrained QP: sum_squares(x - w) s.t. -1 <= x <= 1 (scaled w)
    fixtures.append(problem(
        "Minimize", sum_squares(add(x2, neg(const(3.0 * w)))),
        constraints=[
            node("Inequality", x2, const(np.ones(6))),
            node("Inequality", const(-np.ones(6)), x2)],
        name="box_qp",
        oracle={"kind": "box_qp", "w": (3.0 * w).tolist(), "var": 102}))

    # 10. equality-constrained least squares
    C = rng.randn(3, n).round(4)
    d = rng.randn(3).round(4)
    fixtures.append(problem(
        "Minimize", sum_squares(add(matmul(const(A), x), neg(const(b)))),
        constraints=[node("Equality", matmul(const(C), x), const(d))],
        name="eq_ls",
        oracle={"kind": "eq_ls", "A": A.tolist(), "b": b.tolist(),
                "C": C.tolist(), "d": d.tolist(), "var": 101}))

    # 11. max_entries epigraph form: minimize max(A@x - b) + sum_squares(x)
    fixtures.append(problem(
        "Minimize",
        add(node("max", add(matmul(const(A), x), neg(const(b))), axis=None),
            sum_squares(x)),
        name="max_plus_quad",
        oracle={"kind": "max_plus_quad", "A": A.tolist(), "b": b.tolist(),
                "var": 101}))

    # 12. log_sum_exp bound: minimize log_sum_exp(A@x) + 0.1*sum_squares(x)
    fixtures.append(problem(
        "Minimize",
        add(node("log_sum_exp", matmul(const(A), x), axis=None),
            scale(0.1, sum_squares(x))),
        name="lse",
        oracle={"kind": "lse", "A": A.tolist(), "lam": 0.1, "var": 101}))

    # 13. elementwise ops: abs/maximum composition
    fixtures.append(problem(
        "Minimize",
        add(node("Sum", node("abs", add(x2, neg(const(w)))), axis=None),
            node("Sum", node("maximum", x2, const(np.zeros(6))), axis=None),
            scale(0.5, sum_squares(x2))),
        name="abs_max",
        oracle={"kind": "abs_max", "w": w.tolist(), "var": 102}))

    # 14. matrix variable with transpose + reshape + trace structure
    X = var(103, 4, 4)
    M4 = rng.randn(4, 4).round(4)
    fixtures.append(problem(
        "Minimize",
        add(sum_squares(add(X, neg(const(M4)))),
            scale(0.2, norm1(node("reshape", X, shape=[16, 1])))),
        name="matrix_soft",
        oracle={"kind": "matrix_soft", "M": M4.tolist(), "lam": 0.2,
                "var": 103}))

    # 15. maximize form: maximize -sum_squares(x - w)  (Maximize sense)
    fixtures.append(problem(
        "Maximize", neg(sum_squares(add(x2, neg(const(w))))),
        name="maximize_neg_quad",
        oracle={"kind": "maximize_neg_quad", "w": w.tolist(), "var": 102}))

    for f in fixtures:
        path = os.path.join(OUT, f["name"] + ".json")
        with open(path, "w") as fh:
            json.dump(f, fh, indent=1)
        print("wrote", path)


if __name__ == "__main__":
    main()
