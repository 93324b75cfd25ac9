"""Tests for the generalized prox-operator layer.

Oracle: brute scipy minimization of alpha*f(H(x)) + 1/2||A(x) - v||^2 over
the flattened variable space.
"""

import numpy as np
import pytest
import scipy.optimize
import jax.numpy as jnp

from epsilon_tpu.ir import AffineOperator, ProxFunctionSpec, ProxKind, arg_key
from epsilon_tpu.ops import linop
from epsilon_tpu.ops.block import BlockMatrix, BlockVector
from epsilon_tpu.ops.prox.operator import create_prox_operator


def _generalized_oracle(f, H, g, A, alpha, v, n, smooth=False, x0s=None):
    """min_x alpha*f(Hx + g) + 1/2||Ax - v||^2 via scipy."""
    def obj(x):
        return float(alpha * f(H @ x + g) + 0.5 * np.sum((A @ x - v) ** 2))

    best_x, best = None, np.inf
    rng = np.random.RandomState(7)
    starts = x0s or [np.zeros(n)] + [rng.randn(n) for _ in range(4)]
    for x0 in starts:
        method = "L-BFGS-B" if smooth else "Powell"
        opts = ({"maxiter": 2000, "ftol": 1e-15, "gtol": 1e-12} if smooth
                else {"maxiter": 40000, "xtol": 1e-12, "ftol": 1e-14})
        res = scipy.optimize.minimize(obj, x0, method=method, options=opts)
        if res.fun < best:
            best, best_x = res.fun, res.x
    return best_x, best, obj


def _mk(spec_kind, H_op, g_vec, A_op, alpha=1.0, epigraph=False, **kw):
    spec = ProxFunctionSpec(kind=spec_kind, alpha=alpha, epigraph=epigraph, **kw)
    aff_arg = AffineOperator(
        BlockMatrix({(arg_key(0), "x"): H_op}),
        BlockVector({arg_key(0): jnp.asarray(g_vec)}) if g_vec is not None
        else BlockVector())
    aff_con = AffineOperator(BlockMatrix({("v", "x"): A_op}), BlockVector())
    return create_prox_operator(spec, aff_arg, aff_con)


def test_scalar_reduction_norm1(rng):
    """H = 2I, A = 3I: prox of norm1 under scaled metric."""
    n = 6
    v = rng.randn(n) * 3
    op = _mk(ProxKind.NORM_1, linop.scalar(2.0, n), None, linop.scalar(3.0, n),
             alpha=1.5)
    x = np.asarray(op.apply(BlockVector({"v": jnp.asarray(v)}))["x"])
    x_o, best, obj = _generalized_oracle(
        lambda y: np.sum(np.abs(y)), 2.0 * np.eye(n), np.zeros(n),
        3.0 * np.eye(n), 1.5, v, n)
    assert obj(x) <= best + 1e-8
    np.testing.assert_allclose(x, x_o, atol=1e-5)


def test_scalar_reduction_with_offset(rng):
    n = 5
    v = rng.randn(n)
    g = rng.randn(n)
    op = _mk(ProxKind.SUM_HINGE, linop.scalar(-1.0, n), g, linop.identity(n))
    x = np.asarray(op.apply(BlockVector({"v": jnp.asarray(v)}))["x"])
    f = lambda y: np.sum(np.maximum(y, 0))
    x_o, best, obj = _generalized_oracle(f, -np.eye(n), g, np.eye(n), 1.0, v, n)
    assert obj(x) <= best + 1e-8


def test_diagonal_reduction_norm1(rng):
    n = 6
    v = rng.randn(n) * 2
    d = rng.rand(n) + 0.5
    op = _mk(ProxKind.NORM_1, linop.diagonal(d), None, linop.identity(n))
    x = np.asarray(op.apply(BlockVector({"v": jnp.asarray(v)}))["x"])
    x_o, best, obj = _generalized_oracle(
        lambda y: np.sum(np.abs(y)), np.diag(d), np.zeros(n), np.eye(n),
        1.0, v, n)
    assert obj(x) <= best + 1e-8
    np.testing.assert_allclose(x, x_o, atol=1e-5)


def test_sum_square_kkt(rng):
    m, n = 4, 6
    Hm = rng.randn(m, n)
    g = rng.randn(m)
    v = rng.randn(n)
    op = _mk(ProxKind.SUM_SQUARE, linop.dense(Hm), g, linop.identity(n),
             alpha=0.7)
    x = np.asarray(op.apply(BlockVector({"v": jnp.asarray(v)}))["x"])
    # closed form: (I + 2*0.7*H'H) x = v - 2*0.7*H'g
    lhs = np.eye(n) + 1.4 * Hm.T @ Hm
    expected = np.linalg.solve(lhs, v - 1.4 * Hm.T @ g)
    np.testing.assert_allclose(x, expected, atol=1e-8)


def test_zero_kkt(rng):
    """Projection onto {Hx = 0} in a scaled metric."""
    m, n = 3, 6
    Hm = rng.randn(m, n)
    v = rng.randn(n)
    op = _mk(ProxKind.ZERO, linop.dense(Hm), None, linop.scalar(2.0, n))
    x = np.asarray(op.apply(BlockVector({"v": jnp.asarray(2.0 * v)}))["x"])
    # argmin ||2x - 2v||^2 s.t. Hx=0  -> projection of v onto null(H)
    P = np.eye(n) - Hm.T @ np.linalg.solve(Hm @ Hm.T, Hm)
    np.testing.assert_allclose(x, P @ v, atol=1e-8)
    np.testing.assert_allclose(Hm @ x, 0, atol=1e-8)


def test_affine_kkt(rng):
    n = 5
    c = rng.randn(n)
    v = rng.randn(n)
    op = _mk(ProxKind.AFFINE, linop.dense(c[None, :]), None, linop.identity(n),
             alpha=2.0)
    x = np.asarray(op.apply(BlockVector({"v": jnp.asarray(v)}))["x"])
    # argmin 2*c'x + 1/2||x - v||^2 = v - 2c
    np.testing.assert_allclose(x, v - 2.0 * c, atol=1e-9)


def test_constant_prox(rng):
    n = 4
    v = rng.randn(n)
    spec = ProxFunctionSpec(kind=ProxKind.CONSTANT)
    aff_arg = AffineOperator(BlockMatrix(), BlockVector())
    aff_con = AffineOperator(BlockMatrix({("v", "x"): linop.identity(n)}),
                             BlockVector())
    op = create_prox_operator(spec, aff_arg, aff_con)
    x = np.asarray(op.apply(BlockVector({"v": jnp.asarray(v)}))["x"])
    np.testing.assert_allclose(x, v, atol=1e-10)


def test_second_order_cone(rng):
    m, n = 3, 4
    spec = ProxFunctionSpec(kind=ProxKind.SECOND_ORDER_CONE,
                            arg_sizes=[(m,), (m, n)])
    aff_arg = AffineOperator(
        BlockMatrix({(arg_key(0), "t"): linop.identity(m),
                     (arg_key(1), "X"): linop.identity(m * n)}),
        BlockVector())
    aff_con = AffineOperator(
        BlockMatrix({("vt", "t"): linop.identity(m),
                     ("vX", "X"): linop.identity(m * n)}),
        BlockVector())
    op = create_prox_operator(spec, aff_arg, aff_con)
    t = rng.randn(m)
    X = rng.randn(m, n) * 2
    out = op.apply(BlockVector({"vt": jnp.asarray(t),
                                "vX": jnp.asarray(X.flatten(order="F"))}))
    Xp = np.asarray(out["X"]).reshape((n, m)).T
    tp = np.asarray(out["t"])
    assert np.all(np.linalg.norm(Xp, axis=1) <= tp + 1e-8)
    # projection check per row
    for i in range(m):
        nrm = np.linalg.norm(X[i])
        if nrm <= t[i]:
            np.testing.assert_allclose(Xp[i], X[i], atol=1e-9)
        elif nrm <= -t[i]:
            np.testing.assert_allclose(Xp[i], 0, atol=1e-9)
        else:
            alpha = 0.5 * (1 + t[i] / nrm)
            np.testing.assert_allclose(Xp[i], alpha * X[i], atol=1e-8)
            np.testing.assert_allclose(tp[i], alpha * nrm, atol=1e-8)


def test_epigraph_through_operator(rng):
    """norm1 epigraph via the operator layer: args (x, t)."""
    n = 5
    spec = ProxFunctionSpec(kind=ProxKind.NORM_1, epigraph=True,
                            arg_sizes=[(n,), (1,)])
    aff_arg = AffineOperator(
        BlockMatrix({(arg_key(0), "x"): linop.identity(n),
                     (arg_key(1), "t"): linop.identity(1)}),
        BlockVector())
    aff_con = AffineOperator(
        BlockMatrix({("vx", "x"): linop.identity(n),
                     ("vt", "t"): linop.identity(1)}),
        BlockVector())
    op = create_prox_operator(spec, aff_arg, aff_con)
    v = rng.randn(n) * 2
    s = rng.randn()
    out = op.apply(BlockVector({"vx": jnp.asarray(v),
                                "vt": jnp.asarray([s])}))
    x, t = np.asarray(out["x"]), float(np.asarray(out["t"])[0])
    from oracles import check_epigraph
    check_epigraph(lambda z: np.sum(np.abs(z)), v, s, x, t, rng=rng)


def test_sum_square_epigraph(rng):
    n = 5
    spec = ProxFunctionSpec(kind=ProxKind.SUM_SQUARE, epigraph=True,
                            arg_sizes=[(n,), (1,)])
    aff_arg = AffineOperator(
        BlockMatrix({(arg_key(0), "x"): linop.identity(n),
                     (arg_key(1), "t"): linop.identity(1)}),
        BlockVector())
    aff_con = AffineOperator(
        BlockMatrix({("vx", "x"): linop.identity(n),
                     ("vt", "t"): linop.identity(1)}),
        BlockVector())
    op = create_prox_operator(spec, aff_arg, aff_con)
    v = rng.randn(n) * 2
    s = rng.randn()
    out = op.apply(BlockVector({"vx": jnp.asarray(v), "vt": jnp.asarray([s])}))
    x, t = np.asarray(out["x"]), float(np.asarray(out["t"])[0])
    from oracles import check_epigraph
    check_epigraph(lambda z: np.sum(z * z), v, s, x, t, rng=rng)


def test_axis_mode(rng):
    """Vector kernel batched along matrix columns via vmap."""
    m, n = 4, 3
    spec = ProxFunctionSpec(kind=ProxKind.NORM_2, arg_sizes=[(m, n)], axis=0)
    aff_arg = AffineOperator(
        BlockMatrix({(arg_key(0), "X"): linop.identity(m * n)}), BlockVector())
    aff_con = AffineOperator(
        BlockMatrix({("v", "X"): linop.identity(m * n)}), BlockVector())
    op = create_prox_operator(spec, aff_arg, aff_con)
    V = rng.randn(m, n) * 2
    out = op.apply(BlockVector({"v": jnp.asarray(V.flatten(order="F"))}))
    X = np.asarray(out["X"]).reshape((n, m)).T
    for j in range(n):
        nrm = np.linalg.norm(V[:, j])
        expected = max(0.0, 1 - 1.0 / nrm) * V[:, j]
        np.testing.assert_allclose(X[:, j], expected, atol=1e-9)


def test_multi_variable_term(rng):
    """One prox term over two variables: f(H1 x1 + H2 x2)."""
    n = 4
    v1, v2 = rng.randn(n), rng.randn(n)
    spec = ProxFunctionSpec(kind=ProxKind.NORM_1)
    aff_arg = AffineOperator(
        BlockMatrix({(arg_key(0), "a"): linop.identity(n)}), BlockVector())
    aff_con = AffineOperator(
        BlockMatrix({("va", "a"): linop.identity(n)}), BlockVector())
    op = create_prox_operator(spec, aff_arg, aff_con)
    x = np.asarray(op.apply(BlockVector({"va": jnp.asarray(v1)}))["a"])
    expected = np.sign(v1) * np.maximum(np.abs(v1) - 1.0, 0)
    np.testing.assert_allclose(x, expected, atol=1e-9)


def test_collapsed_kkt_matches_chain(rng):
    """The solve-operator collapse (x = S v + c) is algebraically the same
    map as the block-substitution chain it replaces — compare the two on
    the same factored system (collapse forced on/off via the entry gate)."""
    from epsilon_tpu.ops.prox import operator as opmod
    import jax.numpy as jnp

    m, n = 6, 10
    H = rng.randn(m, n)
    g = rng.randn(m)
    Hb = BlockMatrix({("c0", "x"): linop.dense(H)})
    A = BlockMatrix({("x", "x"): linop.scalar(1.3, n)})
    spec = ProxFunctionSpec(kind=ProxKind.ZERO)
    op = opmod.ZeroProxOperator(
        spec, AffineOperator(Hb, BlockVector({"c0": np.asarray(g)})),
        AffineOperator(A, BlockVector()))
    v = BlockVector({"x": jnp.asarray(rng.randn(n))})
    saved_max = opmod._COLLAPSE_MAX_ENTRIES
    try:
        if op._collapsed is None:
            opmod._COLLAPSE_MAX_ENTRIES = 1e9
            op2 = opmod.ZeroProxOperator(
                spec, AffineOperator(Hb, BlockVector({"c0": np.asarray(g)})),
                AffineOperator(A, BlockVector()))
        else:
            op2 = op
        assert op2._collapsed is not None
        x_col = op2.apply(v)
        op2._collapsed, saved = None, op2._collapsed
        x_chain = op2.apply(v)
        op2._collapsed = saved
        np.testing.assert_allclose(np.asarray(x_col["x"]),
                                   np.asarray(x_chain["x"]), atol=1e-9)
    finally:
        opmod._COLLAPSE_MAX_ENTRIES = saved_max
