"""Tests for the block LDL^T (mirror block_cholesky_test.cc:12-57)."""

import numpy as np
import jax
import jax.numpy as jnp

from epsilon_tpu.ops import linop
from epsilon_tpu.ops.block import BlockMatrix, BlockVector
from epsilon_tpu.ops.cholesky import BlockCholesky


def _solve_dense(M: BlockMatrix, b: BlockVector):
    """Ground truth via dense assembly in key-sorted order."""
    keys = M.col_keys()
    dims = {k: M.col_dim(k) for k in keys}
    bb = np.concatenate([np.asarray(b[k]) for k in keys])
    x = np.linalg.solve(M.as_dense(), bb)
    out, off = {}, 0
    for k in keys:
        out[k] = x[off:off + dims[k]]
        off += dims[k]
    return out


def test_spd_block_system(rng):
    n1, n2 = 4, 3
    A = rng.randn(n1, n1)
    P = A @ A.T + n1 * np.eye(n1)
    C = rng.randn(n1, n2)
    B = rng.randn(n2, n2)
    Q = B @ B.T + (n2 + np.linalg.norm(C, 2) ** 2) * np.eye(n2)
    M = BlockMatrix({
        ("p", "p"): linop.dense(P),
        ("p", "q"): linop.dense(C),
        ("q", "p"): linop.dense(C.T),
        ("q", "q"): linop.dense(Q),
    })
    chol = BlockCholesky(M).factor()
    b = BlockVector({"p": jnp.asarray(rng.randn(n1)), "q": jnp.asarray(rng.randn(n2))})
    x = chol.solve(b)
    expected = _solve_dense(M, b)
    np.testing.assert_allclose(np.asarray(x["p"]), expected["p"], rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(x["q"]), expected["q"], rtol=1e-8, atol=1e-8)


def test_quasi_definite_kkt(rng):
    """KKT system [I A'; A -I] like the reference's prox solves."""
    m, n = 3, 5
    A = rng.randn(m, n)
    M = BlockMatrix({
        ("x", "x"): linop.identity(n),
        ("x", "nu"): linop.dense(A.T),
        ("nu", "x"): linop.dense(A),
        ("nu", "nu"): linop.scalar(-1.0, m),
    })
    chol = BlockCholesky(M).factor()
    b = BlockVector({"x": jnp.asarray(rng.randn(n)), "nu": jnp.asarray(rng.randn(m))})
    x = chol.solve(b)
    expected = _solve_dense(M, b)
    np.testing.assert_allclose(np.asarray(x["nu"]), expected["nu"], rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(x["x"]), expected["x"], rtol=1e-8, atol=1e-8)


def test_structure_preserved_diag_pivots(rng):
    """Diagonal/scalar pivots should stay structured (no densification)."""
    n = 6
    d = rng.rand(n) + 1.0
    M = BlockMatrix({
        ("a", "a"): linop.diagonal(d),
        ("b", "b"): linop.scalar(2.0, n),
    })
    chol = BlockCholesky(M).factor()
    b = BlockVector({"a": jnp.asarray(rng.randn(n)), "b": jnp.asarray(rng.randn(n))})
    x = chol.solve(b)
    np.testing.assert_allclose(np.asarray(x["a"]), np.asarray(b["a"]) / d, atol=1e-12)
    np.testing.assert_allclose(np.asarray(x["b"]), np.asarray(b["b"]) / 2.0, atol=1e-12)


def test_missing_rhs_blocks_treated_as_zero(rng):
    n = 3
    M = BlockMatrix({
        ("a", "a"): linop.scalar(2.0, n),
        ("a", "b"): linop.identity(n),
        ("b", "a"): linop.identity(n),
        ("b", "b"): linop.scalar(-1.0, n),
    })
    chol = BlockCholesky(M).factor()
    b = BlockVector({"a": jnp.asarray(rng.randn(n))})
    x = chol.solve(b)
    full = _solve_dense(M, BlockVector({"a": b["a"], "b": jnp.zeros(n)}))
    np.testing.assert_allclose(np.asarray(x["a"]), full["a"], atol=1e-10)
    np.testing.assert_allclose(np.asarray(x["b"]), full["b"], atol=1e-10)


def test_native_ordering_many_blocks(rng):
    """>=50-block arrow system goes through native.min_fill_order and must
    match the dense ground truth; the arrow structure also checks the order
    is sensible (spoke pivots before the hub avoids O(k^2) fill)."""
    from epsilon_tpu import native

    k, n = 55, 3
    blocks = {}
    hub = rng.randn(n, n)
    blocks[("hub", "hub")] = linop.dense(hub @ hub.T + (10.0 * k) * np.eye(n))
    for i in range(k):
        key = f"s{i:02d}"
        S = rng.randn(n, n)
        blocks[(key, key)] = linop.dense(S @ S.T + 10.0 * np.eye(n))
        C = rng.randn(n, n)
        blocks[(key, "hub")] = linop.dense(C)
        blocks[("hub", key)] = linop.dense(C.T)
    M = BlockMatrix(blocks)
    chol = BlockCholesky(M)
    keys = sorted({r for r, _ in M.blocks} | {c for _, c in M.blocks})
    for kk in keys:
        chol._dims[kk] = n
    order = chol._native_order(dict(M.blocks), keys)
    if native.available():
        assert order is not None and len(order) == k + 1
        # hub elimination first would fill all k^2 spoke pairs; min-fill
        # must defer it past (nearly) all spokes
        assert order.index("hub") > k // 2
    chol._dims = {}
    chol.factor()
    b = BlockVector({key: jnp.asarray(rng.randn(n))
                     for key in ["hub"] + [f"s{i:02d}" for i in range(k)]})
    x = chol.solve(b)
    expected = _solve_dense(M, b)
    for key in expected:
        np.testing.assert_allclose(np.asarray(x[key]), expected[key],
                                   rtol=1e-7, atol=1e-7)


def test_solve_is_jittable(rng):
    n = 4
    A = rng.randn(n, n)
    P = A @ A.T + n * np.eye(n)
    M = BlockMatrix({("p", "p"): linop.dense(P)})
    chol = BlockCholesky(M).factor()

    @jax.jit
    def solve(b):
        return chol.solve(b)

    b = BlockVector({"p": jnp.asarray(rng.randn(n))})
    x = solve(b)
    np.testing.assert_allclose(np.asarray(x["p"]),
                               np.linalg.solve(P, np.asarray(b["p"])),
                               rtol=1e-8, atol=1e-8)
