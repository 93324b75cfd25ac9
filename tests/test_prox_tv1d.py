"""Tests for the TV-1D prox: device ADMM-DCT kernel vs two exact oracles
(scipy bound-constrained dual LSQ, and the host taut-string algorithm)."""

import numpy as np
import pytest
import scipy.optimize
import jax.numpy as jnp

from epsilon_tpu.ops.prox import tv1d
from oracles import check_prox_vi


def _tv_oracle_dual(v, lam):
    """Exact via the dual box-constrained least squares:
    min_z ||D^T z - v||^2, |z| <= lam; x = v - D^T z."""
    n = v.size
    D = np.zeros((n - 1, n))
    for i in range(n - 1):
        D[i, i] = -1.0
        D[i, i + 1] = 1.0
    res = scipy.optimize.lsq_linear(D.T, v, bounds=(-lam, lam), tol=1e-14,
                                    max_iter=500)
    return v - D.T @ res.x


@pytest.mark.parametrize("trial", range(4))
def test_tv1d_vs_dual_oracle(trial):
    rng = np.random.RandomState(trial)
    n = 40
    v = np.cumsum(rng.randn(n)) * 0.5  # random-walk signal
    lam = 10.0 ** rng.uniform(-1.5, 0.7)
    x = np.asarray(tv1d.prox_tv1d(jnp.asarray(v), lam, iters=400))
    x_oracle = _tv_oracle_dual(v, lam)
    np.testing.assert_allclose(x, x_oracle, atol=2e-5)
    f = lambda z: np.sum(np.abs(np.diff(z)))
    check_prox_vi(f, v, lam, x, rng=rng, tol=1e-4)


@pytest.mark.parametrize("trial", range(4))
def test_taut_string_exact(trial):
    rng = np.random.RandomState(10 + trial)
    n = 60
    v = np.cumsum(rng.randn(n))
    lam = 10.0 ** rng.uniform(-1.5, 0.7)
    x = tv1d.tv1d_exact_numpy(v, lam)
    x_oracle = _tv_oracle_dual(v, lam)
    np.testing.assert_allclose(x, x_oracle, atol=1e-9)


def test_taut_string_edge_cases():
    np.testing.assert_allclose(tv1d.tv1d_exact_numpy(np.array([3.0]), 1.0), [3.0])
    v = np.array([1.0, 1.0, 1.0])
    np.testing.assert_allclose(tv1d.tv1d_exact_numpy(v, 0.5), v)
    # large lam -> constant at mean
    v = np.array([0.0, 1.0, 2.0, 3.0])
    np.testing.assert_allclose(tv1d.tv1d_exact_numpy(v, 100.0),
                               np.full(4, 1.5), atol=1e-12)


def test_tv1d_device_matches_taut_string(rng):
    n = 128
    v = np.repeat(rng.randn(8), 16) + 0.1 * rng.randn(n)  # piecewise const
    lam = 0.5
    x_dev = np.asarray(tv1d.prox_tv1d(jnp.asarray(v), lam, iters=500))
    x_exact = tv1d.tv1d_exact_numpy(v, lam)
    np.testing.assert_allclose(x_dev, x_exact, atol=5e-5)


def test_neumann_solve():
    rng = np.random.RandomState(3)
    n = 17
    r = rng.randn(n)
    rho = 0.7
    L = np.zeros((n, n))
    for i in range(n - 1):
        L[i, i] += 1
        L[i + 1, i + 1] += 1
        L[i, i + 1] -= 1
        L[i + 1, i] -= 1
    expected = np.linalg.solve(np.eye(n) + rho * L, r)
    got = np.asarray(tv1d.neumann_laplacian_solve(jnp.asarray(r), rho))
    np.testing.assert_allclose(got, expected, atol=1e-10)
