"""Oracle tests for vector prox kernels (max, sum_largest, norm2, SOC, lse)."""

import numpy as np
import pytest
import jax.numpy as jnp

from epsilon_tpu.ops.prox import vector as vec
from oracles import check_epigraph, check_prox_scipy, check_prox_vi

N_TRIALS = 5


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_max(trial):
    rng = np.random.RandomState(trial)
    v = rng.randn(9) * 2
    lam = 10.0 ** rng.uniform(-2, 1.5)
    x = np.asarray(vec.prox_max(jnp.asarray(v), lam))
    f = lambda z: np.max(z)
    check_prox_vi(f, v, lam, x, rng=rng)
    check_prox_scipy(f, v, lam, x, rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_epi_max(trial):
    rng = np.random.RandomState(10 + trial)
    v = rng.randn(9) * 2
    s = rng.randn() * 2
    x, t = vec.epi_max(jnp.asarray(v), s)
    f = lambda z: np.max(z)
    check_epigraph(f, v, s, np.asarray(x), float(t), rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_sum_largest(trial):
    rng = np.random.RandomState(20 + trial)
    n = 9
    v = rng.randn(n) * 2
    lam = 10.0 ** rng.uniform(-2, 1)
    k = rng.randint(1, n + 1)
    x = np.asarray(vec.prox_sum_largest(jnp.asarray(v), lam, k))
    f = lambda z: np.sum(np.sort(z)[::-1][:k])
    check_prox_vi(f, v, lam, x, rng=rng)
    check_prox_scipy(f, v, lam, x, rng=rng)


def test_sum_largest_k_equals_n(rng):
    # degenerate plateau: sum of all entries, prox subtracts lam from each
    v = rng.randn(7)
    lam = 0.3
    x = np.asarray(vec.prox_sum_largest(jnp.asarray(v), lam, 7))
    np.testing.assert_allclose(x, v - lam, atol=1e-9)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_norm2(trial):
    rng = np.random.RandomState(30 + trial)
    v = rng.randn(8) * 2
    lam = 10.0 ** rng.uniform(-2, 1)
    x = np.asarray(vec.prox_norm2(jnp.asarray(v), lam))
    f = lambda z: np.linalg.norm(z)
    check_prox_vi(f, v, lam, x, rng=rng)
    np.testing.assert_allclose(
        x, np.maximum(0, 1 - lam / np.linalg.norm(v)) * v, atol=1e-10)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_epi_norm2(trial):
    rng = np.random.RandomState(40 + trial)
    v = rng.randn(8) * 2
    s = rng.randn() * 3
    x, t = vec.epi_norm2(jnp.asarray(v), s)
    f = lambda z: np.linalg.norm(z)
    check_epigraph(f, v, s, np.asarray(x), float(t), rng=rng)


def test_epi_norm2_polar(rng):
    # deep inside the polar cone -> projects to origin
    v = 0.1 * rng.randn(5)
    s = -10.0
    x, t = vec.epi_norm2(jnp.asarray(v), s)
    np.testing.assert_allclose(np.asarray(x), 0, atol=1e-12)
    assert float(t) == 0.0


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_project_soc_rows(trial):
    rng = np.random.RandomState(50 + trial)
    m, n = 4, 6
    X = rng.randn(m, n) * 2
    t = rng.randn(m) * 2
    beta = abs(rng.randn()) + 0.5
    Xp, tp = vec.project_soc_rows(jnp.asarray(X), jnp.asarray(t), beta)
    Xp, tp = np.asarray(Xp), np.asarray(tp)
    # feasibility
    assert np.all(np.linalg.norm(Xp, axis=1) <= beta * tp + 1e-8)
    # row-wise projection VI against feasible samples
    for i in range(m):
        from oracles import check_projection_vi

        def sampler(rng):
            z = rng.randn(n) * 2
            u = np.linalg.norm(z) / beta + abs(rng.randn())
            return z, np.asarray([u])

        check_projection_vi(sampler, (X[i], np.asarray([t[i]])),
                            (Xp[i], np.asarray([tp[i]])), rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_log_sum_exp(trial):
    rng = np.random.RandomState(60 + trial)
    v = rng.randn(8) * 2
    lam = 10.0 ** rng.uniform(-2, 1)
    x = np.asarray(vec.prox_log_sum_exp(jnp.asarray(v), lam))
    f = lambda z: float(np.log(np.sum(np.exp(z - np.max(z)))) + np.max(z))
    check_prox_vi(f, v, lam, x, rng=rng)
    check_prox_scipy(f, v, lam, x, smooth=True, rng=rng)
    # optimality residual
    p = np.exp(x - np.max(x))
    p /= p.sum()
    np.testing.assert_allclose(x + lam * p - v, 0, atol=1e-8)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_epi_log_sum_exp(trial):
    rng = np.random.RandomState(70 + trial)
    v = rng.randn(6) * 2
    s = rng.randn()
    x, t = vec.epi_log_sum_exp(jnp.asarray(v), s)
    f = lambda z: float(np.log(np.sum(np.exp(z - np.max(z)))) + np.max(z))
    check_epigraph(f, v, s, np.asarray(x), float(t), rng=rng, tol=1e-5,
                   feas_tol=1e-5)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_norm_inf(trial):
    rng = np.random.RandomState(80 + trial)
    v = rng.randn(9) * 2
    lam = 10.0 ** rng.uniform(-2, 1.5)
    x = np.asarray(vec.prox_norm_inf(jnp.asarray(v), lam))
    f = lambda z: np.max(np.abs(z))
    check_prox_vi(f, v, lam, x, rng=rng)
    check_prox_scipy(f, v, lam, x, rng=rng)


def test_norm_inf_large_lam():
    # lam >= ||v||_1 collapses the prox to 0
    v = np.array([1.0, -2.0, 0.5])
    x = np.asarray(vec.prox_norm_inf(jnp.asarray(v), 10.0))
    np.testing.assert_allclose(x, 0.0, atol=1e-12)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_epi_norm_inf(trial):
    rng = np.random.RandomState(90 + trial)
    v = rng.randn(9) * 2
    s = rng.randn() * 2
    x, t = vec.epi_norm_inf(jnp.asarray(v), s)
    f = lambda z: np.max(np.abs(z))
    check_epigraph(f, v, s, np.asarray(x), float(t), rng=rng)


def test_epi_norm_inf_polar():
    # deep inside the polar cone the projection is the origin
    v = np.array([0.01, -0.02, 0.005])
    x, t = vec.epi_norm_inf(jnp.asarray(v), -5.0)
    np.testing.assert_allclose(np.asarray(x), 0.0, atol=1e-12)
    assert float(t) == 0.0
