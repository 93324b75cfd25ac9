"""Tests for the structured linear-operator algebra.

Mirrors the reference's C++ unit tests ``linear_map_test.cc:15-60`` (all impl
types checked against dense ground truth), ``kronecker_product_impl_test``,
``dense_matrix_impl_test``.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from epsilon_tpu.ops import linop


def _random_ops(rng, n=4, m=5):
    dense_A = rng.randn(m, n)
    sparse_A = sp.random(m, n, density=0.4, random_state=rng, format="csr")
    return {
        "scalar": (linop.scalar(2.5, n), 2.5 * np.eye(n)),
        "diagonal": (linop.diagonal(rng.randn(n)), None),
        "dense": (linop.dense(dense_A), dense_A),
        "sparse": (linop.sparse(sparse_A), sparse_A.toarray()),
        "kron": (linop.kronecker(linop.dense(rng.randn(3, 2)),
                                 linop.dense(rng.randn(4, 5))), None),
    }


@pytest.mark.parametrize("kind", ["scalar", "diagonal", "dense", "sparse", "kron"])
def test_matvec_matches_dense(rng, kind):
    op, _ = _random_ops(rng)[kind]
    A = op.as_dense()
    x = rng.randn(op.n)
    np.testing.assert_allclose(np.asarray(op.matvec(jnp.asarray(x))), A @ x,
                               rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("kind", ["scalar", "diagonal", "dense", "sparse", "kron"])
def test_transpose(rng, kind):
    op, _ = _random_ops(rng)[kind]
    np.testing.assert_allclose(op.T.as_dense(), op.as_dense().T, atol=1e-12)


@pytest.mark.parametrize("kind", ["scalar", "diagonal", "dense", "sparse", "kron"])
def test_matmat(rng, kind):
    op, _ = _random_ops(rng)[kind]
    X = rng.randn(op.n, 3)
    np.testing.assert_allclose(np.asarray(op.matmat(jnp.asarray(X))),
                               op.as_dense() @ X, rtol=1e-9, atol=1e-9)


def test_kron_vec_trick(rng):
    A = rng.randn(3, 4)
    B = rng.randn(5, 2)
    op = linop.kronecker(linop.dense(A), linop.dense(B))
    X = rng.randn(2, 4)  # B.n x A.n
    x = X.flatten(order="F")
    expected = np.kron(A, B) @ x
    np.testing.assert_allclose(np.asarray(op.matvec(jnp.asarray(x))), expected,
                               atol=1e-10)
    # and vec identity
    np.testing.assert_allclose(expected, (B @ X @ A.T).flatten(order="F"),
                               atol=1e-10)


def test_multiply_promotions(rng):
    n = 4
    d1, d2 = rng.randn(n), rng.randn(n)
    # diag*diag -> diag
    out = linop.diagonal(d1) @ linop.diagonal(d2)
    assert isinstance(out, linop.DiagonalOp)
    np.testing.assert_allclose(out.d, d1 * d2)
    # scalar*dense -> dense scaled
    A = rng.randn(n, n)
    out = linop.scalar(3.0, n) @ linop.dense(A)
    np.testing.assert_allclose(out.as_dense(), 3.0 * A)
    # kron*kron -> kron when conformable
    k1 = linop.kronecker(linop.dense(rng.randn(2, 3)), linop.dense(rng.randn(4, 5)))
    k2 = linop.kronecker(linop.dense(rng.randn(3, 2)), linop.dense(rng.randn(5, 3)))
    out = k1 @ k2
    assert isinstance(out, linop.KronOp)
    np.testing.assert_allclose(out.as_dense(), k1.as_dense() @ k2.as_dense(),
                               atol=1e-10)
    # sparse*sparse stays sparse
    s1 = linop.sparse(sp.random(4, 4, density=0.5, random_state=rng))
    s2 = linop.sparse(sp.random(4, 4, density=0.5, random_state=rng))
    out = s1 @ s2
    assert isinstance(out, linop.SparseOp)
    np.testing.assert_allclose(out.as_dense(), s1.as_dense() @ s2.as_dense(),
                               atol=1e-12)


def test_add_promotions(rng):
    n = 4
    out = linop.scalar(1.0, n) + linop.scalar(2.0, n)
    assert out.scalar_value() == 3.0
    out = linop.diagonal(rng.randn(n)) + linop.scalar(1.0, n)
    assert isinstance(out, linop.DiagonalOp)
    A = rng.randn(n, n)
    out = linop.dense(A) + linop.scalar(1.0, n)
    np.testing.assert_allclose(out.as_dense(), A + np.eye(n))


def test_inverse(rng):
    n = 4
    # scalar
    inv = linop.scalar(2.0, n).inverse()
    assert inv.scalar_value() == 0.5
    # diagonal
    d = rng.rand(n) + 1.0
    np.testing.assert_allclose(linop.diagonal(d).inverse().diag_value(), 1.0 / d)
    # dense SPD via factorization
    A = rng.randn(n, n)
    M = A @ A.T + n * np.eye(n)
    inv = linop.dense(M).inverse()
    x = rng.randn(n)
    np.testing.assert_allclose(np.asarray(inv.matvec(jnp.asarray(x))),
                               np.linalg.solve(M, x), rtol=1e-8, atol=1e-8)
    # kron inverse is kron of inverses
    K = linop.kronecker(linop.dense(M), linop.scalar(2.0, 3))
    np.testing.assert_allclose(K.inverse().as_dense(),
                               np.linalg.inv(K.as_dense()), atol=1e-6)


def test_structural_builders(rng):
    n = 4
    # index
    op = linop.index_op(1, 4, 2, n)
    x = rng.randn(n)
    np.testing.assert_allclose(op.as_dense() @ x, x[1:4:2])
    # one_hot / sum / promote
    np.testing.assert_allclose(linop.one_hot(2, n).as_dense() @ x, [x[2]])
    np.testing.assert_allclose(linop.sum_op(n).as_dense() @ x, [x.sum()])
    np.testing.assert_allclose(linop.promote(n).as_dense() @ np.array([3.0]),
                               3.0 * np.ones(n))
    # matrix structural ops on vec(X), column-major
    m, k = 3, 4
    X = rng.randn(m, k)
    x = X.flatten(order="F")
    np.testing.assert_allclose(
        linop.transpose_matrix(m, k).as_dense() @ x, X.T.flatten(order="F"))
    np.testing.assert_allclose(
        linop.sum_left(m, k).as_dense() @ x, X.sum(axis=0))
    np.testing.assert_allclose(
        linop.sum_right(m, k).as_dense() @ x, X.sum(axis=1))
    # square-matrix ops
    S = rng.randn(k, k)
    s = S.flatten(order="F")
    np.testing.assert_allclose(linop.diag_mat(k).as_dense() @ s, np.diag(S))
    np.testing.assert_allclose(linop.trace_op(k).as_dense() @ s, [np.trace(S)])
    v = rng.randn(k)
    np.testing.assert_allclose(linop.diag_vec(k).as_dense() @ v,
                               np.diag(v).flatten(order="F"))
    ut = linop.upper_tri_op(k).as_dense() @ s
    expected = np.array([S[i, j] for i in range(k) for j in range(i + 1, k)])
    np.testing.assert_allclose(ut, expected)
    # left/right matrix product
    A = rng.randn(5, m)
    op = linop.left_matrix_product(linop.dense(A), k)
    np.testing.assert_allclose(op.as_dense() @ x, (A @ X).flatten(order="F"))
    B = rng.randn(k, 2)
    op = linop.right_matrix_product(linop.dense(B), m)
    np.testing.assert_allclose(op.as_dense() @ x, (X @ B).flatten(order="F"))


def test_gram(rng):
    A = rng.randn(6, 4)
    g = linop.dense(A).gram()
    np.testing.assert_allclose(g.as_dense(), A.T @ A, atol=1e-12)
    assert linop.scalar(2.0, 3).gram().scalar_value() == 4.0


def test_scalar_plus_kron_structure(rng):
    """s*I + (I_k (x) B) must stay Kronecker (no densification) — the
    multiclass KKT Schur-complement structure."""
    k, n = 3, 4
    B = rng.randn(n, n)
    K = linop.kronecker(linop.identity(k), linop.dense(B))
    out = linop.scalar(2.0, k * n) + K
    assert isinstance(out, linop.KronOp)
    np.testing.assert_allclose(out.as_dense(),
                               2.0 * np.eye(k * n) + np.kron(np.eye(k), B),
                               atol=1e-12)
    # inverse stays Kronecker-structured
    Binv = out.inverse()
    assert isinstance(Binv, linop.KronOp)
    np.testing.assert_allclose(
        Binv.as_dense(),
        np.linalg.inv(2.0 * np.eye(k * n) + np.kron(np.eye(k), B)), atol=1e-8)
    # scalar right factor case
    A = rng.randn(k, k)
    K2 = linop.kronecker(linop.dense(A), linop.scalar(1.5, n))
    out2 = linop.scalar(1.0, k * n) + K2
    assert isinstance(out2, linop.KronOp)
    np.testing.assert_allclose(out2.as_dense(),
                               np.eye(k * n) + np.kron(A, 1.5 * np.eye(n)),
                               atol=1e-12)
