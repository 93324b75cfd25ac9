"""Tests for BlockVector/BlockMatrix (mirror block_vector_test/block_matrix_test)."""

import numpy as np
import jax
import jax.numpy as jnp

from epsilon_tpu.ops import linop
from epsilon_tpu.ops.block import BlockMatrix, BlockVector


def test_block_vector_algebra(rng):
    a = BlockVector({"x": jnp.asarray(rng.randn(3)), "y": jnp.asarray(rng.randn(2))})
    b = BlockVector({"x": jnp.asarray(rng.randn(3)), "z": jnp.asarray(rng.randn(4))})
    s = a + b
    np.testing.assert_allclose(s["x"], a["x"] + b["x"])
    np.testing.assert_allclose(s["y"], a["y"])
    np.testing.assert_allclose(s["z"], b["z"])
    d = a - b
    np.testing.assert_allclose(d["z"], -b["z"])
    np.testing.assert_allclose((2.0 * a)["x"], 2.0 * a["x"])
    np.testing.assert_allclose(a.dot(b), np.vdot(a["x"], b["x"]))
    np.testing.assert_allclose(
        a.norm(), np.sqrt(np.sum(np.square(a["x"])) + np.sum(np.square(a["y"]))))


def test_block_vector_is_pytree(rng):
    a = BlockVector({"x": jnp.asarray(rng.randn(3))})

    @jax.jit
    def f(v):
        return (2.0 * v).norm_squared()

    np.testing.assert_allclose(f(a), 4.0 * np.sum(np.square(np.asarray(a["x"]))))


def test_block_matrix_apply(rng):
    A = rng.randn(3, 4)
    B = rng.randn(3, 2)
    M = BlockMatrix()
    M.insert("r", "x", linop.dense(A))
    M.insert("r", "y", linop.dense(B))
    x = BlockVector({"x": jnp.asarray(rng.randn(4)), "y": jnp.asarray(rng.randn(2))})
    out = M.apply(x)
    np.testing.assert_allclose(np.asarray(out["r"]),
                               A @ np.asarray(x["x"]) + B @ np.asarray(x["y"]),
                               atol=1e-12)


def test_block_matrix_transpose_matmul(rng):
    A = rng.randn(3, 4)
    M = BlockMatrix({("r", "x"): linop.dense(A)})
    G = M.T @ M  # x'x block = A^T A
    np.testing.assert_allclose(G[("x", "x")].as_dense(), A.T @ A, atol=1e-12)


def test_block_matrix_insert_accumulates(rng):
    A, B = rng.randn(3, 3), rng.randn(3, 3)
    M = BlockMatrix()
    M.insert("r", "x", linop.dense(A))
    M.insert("r", "x", linop.dense(B))
    np.testing.assert_allclose(M[("r", "x")].as_dense(), A + B)


def test_block_matrix_inverse_permutation(rng):
    M = BlockMatrix({("a", "x"): linop.scalar(2.0, 3),
                     ("b", "y"): linop.diagonal(rng.rand(2) + 1.0)})
    Minv = M.inverse()
    assert ("x", "a") in Minv.blocks
    np.testing.assert_allclose(Minv[("x", "a")].scalar_value(), 0.5)
