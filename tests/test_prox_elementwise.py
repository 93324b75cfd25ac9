"""Oracle tests for elementwise prox kernels (protocol of prox_test.py:250-287)."""

import numpy as np
import pytest
import jax.numpy as jnp

from epsilon_tpu.ops.prox import elementwise as ew
from oracles import (check_epigraph, check_prox_scipy, check_prox_vi,
                     prox_objective)

N_TRIALS = 5


def _trials(seed=0, n=8):
    rng = np.random.RandomState(seed)
    for trial in range(N_TRIALS):
        v = rng.randn(n) * (1 + trial)
        lam = 10.0 ** rng.uniform(-2, 1)
        yield rng, v, lam


def test_non_negative(rng):
    v = rng.randn(10)
    x = np.asarray(ew.prox_non_negative(jnp.asarray(v)))
    np.testing.assert_allclose(x, np.maximum(v, 0))


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_norm1(trial):
    rng = np.random.RandomState(trial)
    v = rng.randn(8) * 2
    lam = 10.0 ** rng.uniform(-2, 1)
    x = np.asarray(ew.prox_norm1(jnp.asarray(v), lam))
    f = lambda z: np.sum(np.abs(z))
    check_prox_vi(f, v, lam, x, rng=rng)
    check_prox_scipy(f, v, lam, x, rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_norm1_elementwise_lam(trial):
    rng = np.random.RandomState(10 + trial)
    v = rng.randn(8) * 2
    lam = 10.0 ** rng.uniform(-2, 1, size=8)
    x = np.asarray(ew.prox_norm1(jnp.asarray(v), jnp.asarray(lam)))
    f = lambda z: np.sum(np.abs(z))
    check_prox_vi(f, v, lam, x, rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_deadzone(trial):
    rng = np.random.RandomState(20 + trial)
    v = rng.randn(8) * 3
    lam = 10.0 ** rng.uniform(-2, 1)
    M = abs(rng.randn()) + 0.1
    x = np.asarray(ew.prox_deadzone(jnp.asarray(v), lam, M))
    f = lambda z: np.sum(np.maximum(np.abs(z) - M, 0))
    check_prox_vi(f, v, lam, x, rng=rng)
    check_prox_scipy(f, v, lam, x, rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_hinge(trial):
    rng = np.random.RandomState(30 + trial)
    v = rng.randn(8) * 2
    lam = 10.0 ** rng.uniform(-2, 1)
    x = np.asarray(ew.prox_hinge(jnp.asarray(v), lam))
    f = lambda z: np.sum(np.maximum(z, 0))
    check_prox_vi(f, v, lam, x, rng=rng)
    check_prox_scipy(f, v, lam, x, rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_quantile(trial):
    rng = np.random.RandomState(40 + trial)
    n = 8
    v = rng.randn(n) * 2
    lam = 10.0 ** rng.uniform(-2, 1)
    alpha = rng.rand(n) + 0.05
    beta = rng.rand(n) + 0.05
    x = np.asarray(ew.prox_quantile(jnp.asarray(v), lam, jnp.asarray(alpha),
                                    jnp.asarray(beta)))
    f = lambda z: np.sum(alpha * np.maximum(z, 0) + beta * np.maximum(-z, 0))
    check_prox_vi(f, v, lam, x, rng=rng)
    check_prox_scipy(f, v, lam, x, rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_sum_exp(trial):
    rng = np.random.RandomState(50 + trial)
    v = rng.randn(8) * 3
    lam = 10.0 ** rng.uniform(-2, 1)
    x = np.asarray(ew.prox_sum_exp(jnp.asarray(v), lam))
    f = lambda z: np.sum(np.exp(z))
    check_prox_vi(f, v, lam, x, rng=rng)
    check_prox_scipy(f, v, lam, x, smooth=True, rng=rng)


def test_sum_exp_extreme():
    # stability across magnitudes
    v = jnp.asarray([-700.0, -50.0, 0.0, 50.0, 700.0])
    x = np.asarray(ew.prox_sum_exp(v, 1.0))
    assert np.all(np.isfinite(x))
    # optimality residual: x + lam e^x - v = 0 where representable
    r = x[:4] + np.exp(x[:4]) - np.asarray(v)[:4]
    np.testing.assert_allclose(r, 0, atol=1e-8)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_sum_logistic(trial):
    rng = np.random.RandomState(60 + trial)
    v = rng.randn(8) * 4
    lam = 10.0 ** rng.uniform(-2, 1)
    x = np.asarray(ew.prox_sum_logistic(jnp.asarray(v), lam))
    f = lambda z: np.sum(np.logaddexp(0, z))
    check_prox_vi(f, v, lam, x, rng=rng)
    check_prox_scipy(f, v, lam, x, smooth=True, rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_sum_inv_pos(trial):
    rng = np.random.RandomState(70 + trial)
    v = rng.randn(8) * 2
    lam = 10.0 ** rng.uniform(-2, 1)
    x = np.asarray(ew.prox_sum_inv_pos(jnp.asarray(v), lam))
    assert np.all(x > 0)

    def f(z):
        if np.any(z <= 0):
            return np.inf
        return np.sum(1.0 / z)

    check_prox_vi(f, v, lam, x, rng=rng)
    # residual check: (x - v) x^2 = lam
    np.testing.assert_allclose((x - v) * x * x, lam, rtol=1e-7)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_sum_neg_entr(trial):
    rng = np.random.RandomState(80 + trial)
    v = rng.randn(8) * 2
    lam = 10.0 ** rng.uniform(-2, 1)
    x = np.asarray(ew.prox_sum_neg_entr(jnp.asarray(v), lam))
    assert np.all(x > 0)

    def f(z):
        if np.any(z < 0):
            return np.inf
        with np.errstate(all="ignore"):
            return float(np.sum(np.where(z > 0, z * np.log(np.maximum(z, 1e-300)), 0.0)))

    check_prox_vi(f, v, lam, x, rng=rng)
    # optimality: lam*(log x + 1) + x - v = 0
    np.testing.assert_allclose(lam * (np.log(x) + 1) + x - v, 0, atol=1e-7)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_sum_neg_log(trial):
    rng = np.random.RandomState(90 + trial)
    v = rng.randn(8) * 2
    lam = 10.0 ** rng.uniform(-2, 1)
    x = np.asarray(ew.prox_sum_neg_log(jnp.asarray(v), lam))
    assert np.all(x > 0)

    def f(z):
        if np.any(z <= 0):
            return np.inf
        return -np.sum(np.log(z))

    check_prox_vi(f, v, lam, x, rng=rng)
    np.testing.assert_allclose(x * x - v * x - lam, 0, atol=1e-8)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_sum_kl_div(trial):
    rng = np.random.RandomState(100 + trial)
    n = 6
    u = rng.rand(n) * 3 - 0.5
    w = rng.rand(n) * 3 - 0.5
    lam = 10.0 ** rng.uniform(-1.5, 0.5)
    x, y = ew.prox_sum_kl_div(jnp.asarray(u), jnp.asarray(w), lam)
    x, y = np.asarray(x), np.asarray(y)
    assert np.all(x > 0) and np.all(y > 0)

    def f(z):
        a, b = z[:n], z[n:]
        if np.any(a < 0) or np.any(b <= 0):
            return np.inf
        with np.errstate(all="ignore"):
            val = np.sum(np.where(a > 0, a * np.log(np.maximum(a, 1e-300) / b), 0.0)
                         - a + b)
        return float(val)

    vv = np.concatenate([u, w])
    xx = np.concatenate([x, y])
    check_prox_vi(f, vv, lam, xx, rng=rng, tol=1e-5)


# --------------------------- epigraph projections --------------------------

@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_epi_norm1(trial):
    rng = np.random.RandomState(110 + trial)
    v = rng.randn(8) * 2
    s = rng.randn() * 2
    x, t = ew.epi_scaled_zone(jnp.asarray(v), s)
    f = lambda z: np.sum(np.abs(z))
    check_epigraph(f, v, s, np.asarray(x), float(t), rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_epi_hinge(trial):
    rng = np.random.RandomState(120 + trial)
    v = rng.randn(8) * 2
    s = rng.randn() * 2
    x, t = ew.epi_scaled_zone(jnp.asarray(v), s, alpha=1.0, beta=0.0)
    f = lambda z: np.sum(np.maximum(z, 0))
    check_epigraph(f, v, s, np.asarray(x), float(t), rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_epi_deadzone(trial):
    rng = np.random.RandomState(130 + trial)
    v = rng.randn(8) * 3
    s = rng.randn()
    M = 0.5
    x, t = ew.epi_scaled_zone(jnp.asarray(v), s, M=M)
    f = lambda z: np.sum(np.maximum(np.abs(z) - M, 0))
    check_epigraph(f, v, s, np.asarray(x), float(t), rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_epi_quantile(trial):
    rng = np.random.RandomState(135 + trial)
    n = 8
    v = rng.randn(n) * 2
    s = rng.randn()
    alpha = rng.rand(n) + 0.05
    beta = rng.rand(n) + 0.05
    x, t = ew.epi_scaled_zone(jnp.asarray(v), s, alpha=jnp.asarray(alpha),
                              beta=jnp.asarray(beta))
    f = lambda z: np.sum(alpha * np.maximum(z, 0) + beta * np.maximum(-z, 0))
    check_epigraph(f, v, s, np.asarray(x), float(t), rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_epi_exp(trial):
    rng = np.random.RandomState(140 + trial)
    v = rng.randn(6) * 2
    s = rng.randn(6) * 2
    x, t = ew.epi_exp(jnp.asarray(v), jnp.asarray(s))
    x, t = np.asarray(x), np.asarray(t)
    # elementwise projection onto {e^x <= t}
    for i in range(6):
        f = lambda z: np.exp(z[0])
        check_epigraph(f, v[i:i + 1], s[i], x[i:i + 1], t[i], rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_epi_sum_neg_log(trial):
    rng = np.random.RandomState(150 + trial)
    v = rng.randn(6) + 1.0
    s = rng.randn() * 3

    def f(z):
        if np.any(z <= 0):
            return np.inf
        return -np.sum(np.log(z))

    x, t = ew.epi_sum_neg_log(jnp.asarray(v), s)
    x, t = np.asarray(x), float(t)
    assert np.all(x > 0)

    def sampler(rng):
        z = np.abs(x + 10.0 ** rng.uniform(-3, 0) * rng.randn(6)) + 1e-6
        u = f(z) + abs(rng.randn()) * 10.0 ** rng.uniform(-3, 1)
        return z, u

    check_epigraph(f, v, s, x, t, feasible_sampler=sampler, rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_epi_sum_kl_div(trial):
    rng = np.random.RandomState(160 + trial)
    n = 4
    u = rng.rand(n) * 2 + 0.1
    w = rng.rand(n) * 2 + 0.1
    s = rng.randn()
    x, y, t = ew.epi_sum_kl_div(jnp.asarray(u), jnp.asarray(w), s)
    x, y, t = np.asarray(x), np.asarray(y), float(t)

    def f(z):
        a, b = z[:n], z[n:]
        if np.any(a < 0) or np.any(b <= 0):
            return np.inf
        with np.errstate(all="ignore"):
            return float(np.sum(np.where(a > 0,
                                         a * np.log(np.maximum(a, 1e-300) / b), 0.0)
                                - a + b))

    vv = np.concatenate([u, w])
    xx = np.concatenate([x, y])
    assert f(xx) <= t + 1e-6

    def sampler(rng):
        z = np.abs(xx + 10.0 ** rng.uniform(-3, 0) * rng.randn(2 * n)) + 1e-6
        uu = f(z) + abs(rng.randn()) * 10.0 ** rng.uniform(-3, 1)
        return z, uu

    check_epigraph(f, vv, s, xx, t, feasible_sampler=sampler, rng=rng, tol=1e-5)


# -- Newton epigraphs for the smooth family (newton_epi.py; newton.cc:109-190)

def _registry_epi(kind):
    from epsilon_tpu.ops.prox.registry import KERNELS
    return KERNELS[kind].epi


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_epi_sum_exp(trial):
    from epsilon_tpu.ir import ProxKind
    rng = np.random.RandomState(170 + trial)
    v = rng.randn(6) * (1 + trial * 0.5)
    s = rng.randn() * 2
    x, t = _registry_epi(ProxKind.SUM_EXP)(jnp.asarray(v), s)
    check_epigraph(lambda z: np.sum(np.exp(z)), v, s, np.asarray(x),
                   float(t), rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_epi_sum_logistic(trial):
    from epsilon_tpu.ir import ProxKind
    rng = np.random.RandomState(180 + trial)
    v = rng.randn(6) * (1 + trial)
    s = rng.randn() * 2
    x, t = _registry_epi(ProxKind.SUM_LOGISTIC)(jnp.asarray(v), s)
    check_epigraph(lambda z: np.sum(np.logaddexp(0.0, z)), v, s,
                   np.asarray(x), float(t), rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_epi_sum_inv_pos(trial):
    from epsilon_tpu.ir import ProxKind
    rng = np.random.RandomState(190 + trial)
    v = np.abs(rng.randn(6)) + 0.2
    s = abs(rng.randn()) * 20

    def f(z):
        if np.any(z <= 0):
            return np.inf
        return np.sum(1.0 / z)

    x, t = _registry_epi(ProxKind.SUM_INV_POS)(jnp.asarray(v), s)
    x = np.asarray(x)
    assert np.all(x > 0)

    def sampler(rng):
        z = np.abs(x + 10.0 ** rng.uniform(-3, 0) * rng.randn(6)) + 1e-5
        u = f(z) + abs(rng.randn()) * 10.0 ** rng.uniform(-3, 1)
        return z, u

    check_epigraph(f, v, s, x, float(t), feasible_sampler=sampler, rng=rng)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_epi_sum_neg_entr(trial):
    from epsilon_tpu.ir import ProxKind
    rng = np.random.RandomState(210 + trial)
    v = np.abs(rng.randn(6)) + 0.05
    s = rng.randn()

    def f(z):
        if np.any(z < 0):
            return np.inf
        with np.errstate(all="ignore"):
            return float(np.sum(np.where(z > 0, z * np.log(np.maximum(z, 1e-300)), 0.0)))

    x, t = _registry_epi(ProxKind.SUM_NEG_ENTR)(jnp.asarray(v), s)
    x = np.asarray(x)
    assert np.all(x >= 0)

    def sampler(rng):
        z = np.abs(x + 10.0 ** rng.uniform(-3, 0) * rng.randn(6)) + 1e-8
        u = f(z) + abs(rng.randn()) * 10.0 ** rng.uniform(-3, 1)
        return z, u

    check_epigraph(f, v, s, x, float(t), feasible_sampler=sampler, rng=rng)
