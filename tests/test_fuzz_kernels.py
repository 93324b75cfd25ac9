"""Kernel-extremes property fuzzing (reference protocol:
``prox_test.py:168-307`` — 70 cases x 10 trials; here: every registry kernel
swept over magnitudes 1e-6..1e6 in BOTH f32 and f64, asserting the
variational-inequality oracle with magnitude-scaled tolerances).

The VI oracle lives in :mod:`oracles` and shares zero code with the kernels;
the per-kind ``f`` below are independent numpy re-implementations.

What "extreme" means per family:
- scale extremes on v: 1e-6 .. 1e+6 (capped per-kind where the *function*
  itself overflows, e.g. exp(1e6) — a math property, not a kernel bug);
- scale extremes on lam: 1e-6 .. 1e+6;
- f32 runs exercise the fixed Newton/bisection brackets at f32 dynamic
  range, which pure-f64 unit tests never hit.
"""

import zlib

import numpy as np
import pytest
import jax.numpy as jnp

from epsilon_tpu.ir import ProxKind
from epsilon_tpu.ops.prox.registry import KERNELS
from oracles import check_prox_vi


pytestmark = pytest.mark.fuzz

# ---------------------------------------------------------------------------
# per-kind spec: (kind, params, numpy feval, v-sampler, v-scale cap (f64),
#                 v-scale cap (f32))
# v-sampler maps (rng, n, scale) -> v in the prox's domain of definition
# ---------------------------------------------------------------------------


def _gauss(rng, n, s):
    return s * rng.randn(n)


def _pos(rng, n, s):
    return s * np.abs(rng.randn(n)) + 1e-3 * s


def _sum_largest_np(x, k):
    return np.sort(x)[::-1][:k].sum()


SPECS = [
    (ProxKind.NORM_1, {}, lambda x: np.abs(x).sum(), _gauss, 1e6, 1e4),
    (ProxKind.SUM_SQUARE, {}, lambda x: np.sum(x * x), _gauss, 1e6, 1e4),
    (ProxKind.SUM_DEADZONE, dict(M=0.5), lambda x: np.maximum(np.abs(x) - 0.5, 0).sum(),
     _gauss, 1e6, 1e4),
    (ProxKind.SUM_HINGE, {}, lambda x: np.maximum(x, 0).sum(), _gauss, 1e6, 1e4),
    (ProxKind.SUM_QUANTILE, dict(alpha=0.3, beta=1.7),
     lambda x: (0.3 * np.maximum(x, 0) + 1.7 * np.maximum(-x, 0)).sum(),
     _gauss, 1e6, 1e4),
    (ProxKind.SUM_EXP, {}, lambda x: np.exp(x).sum(), _gauss, 2e2, 2e1),
    (ProxKind.SUM_LOGISTIC, {}, lambda x: np.logaddexp(0, x).sum(),
     _gauss, 1e4, 1e3),
    (ProxKind.SUM_INV_POS, {},
     lambda x: np.where(np.all(x > 0), (1.0 / np.maximum(x, 1e-300)).sum(), np.inf),
     _pos, 1e4, 1e2),
    (ProxKind.SUM_NEG_ENTR, {},
     lambda x: np.where(np.all(x >= 0),
                        np.sum(np.where(x > 0, x * np.log(np.maximum(x, 1e-300)), 0.0)),
                        np.inf),
     _pos, 1e4, 1e2),
    (ProxKind.SUM_NEG_LOG, {},
     lambda x: np.where(np.all(x > 0), -np.log(np.maximum(x, 1e-300)).sum(), np.inf),
     _pos, 1e4, 1e2),
    (ProxKind.MAX, {}, lambda x: x.max(), _gauss, 1e6, 1e4),
    (ProxKind.SUM_LARGEST, dict(k=3), lambda x: _sum_largest_np(x, 3),
     _gauss, 1e6, 1e4),
    (ProxKind.NORM_2, {}, lambda x: np.linalg.norm(x), _gauss, 1e6, 1e4),
    (ProxKind.NORM_INF, {}, lambda x: np.abs(x).max(), _gauss, 1e6, 1e4),
    (ProxKind.LOG_SUM_EXP, {},
     lambda x: np.logaddexp.reduce(x), _gauss, 1e4, 1e3),
    (ProxKind.TOTAL_VARIATION_1D, {},
     lambda x: np.abs(np.diff(x)).sum(), _gauss, 1e4, 1e2),
]


def _run_prox_trial(kind, params, f_np, sampler, scale, lam, n, dtype, rng):
    entry = KERNELS[kind]
    v = sampler(rng, n, scale).astype(dtype)
    vj = jnp.asarray(v)
    x = np.asarray(entry.prox(vj, jnp.asarray(dtype(lam)), **params),
                   dtype=np.float64)
    assert np.all(np.isfinite(x)), f"{kind}: non-finite prox at scale={scale} lam={lam}"
    v64 = v.astype(np.float64)
    fx = f_np(x)
    # magnitude-scaled VI tolerance: terms in the VI are O(|v|^2/lam + f)
    mag = max(1.0, float(np.abs(v64).max()) ** 2 / lam, abs(float(fx)))
    eps = 2e-5 if dtype == np.float32 else 1e-9
    tol = max(eps * mag, 1e-8)

    def z_sampler(r):
        s = 10.0 ** r.uniform(-3, 0) * max(scale, 1e-3)
        base = x if r.rand() < 0.7 else v64
        z = base + s * r.randn(*x.shape)
        if kind in (ProxKind.SUM_INV_POS, ProxKind.SUM_NEG_LOG):
            z = np.abs(z) + 1e-8 * scale
        elif kind == ProxKind.SUM_NEG_ENTR:
            z = np.abs(z)
        return z

    check_prox_vi(f_np, v64, lam, x, sampler=z_sampler, n_samples=80, tol=tol,
                  rng=rng)


@pytest.mark.parametrize("kind,params,f_np,sampler,cap64,cap32",
                         SPECS, ids=[s[0].name for s in SPECS])
@pytest.mark.parametrize("dtype", [np.float64, np.float32], ids=["f64", "f32"])
def test_fuzz_prox_extremes(kind, params, f_np, sampler, cap64, cap32, dtype):
    rng = np.random.RandomState(zlib.crc32(kind.name.encode()) % 2**31)
    cap = cap64 if dtype == np.float64 else cap32
    lam_hi = 1e6 if dtype == np.float64 else 1e4
    for trial in range(10):
        scale = 10.0 ** rng.uniform(-6, np.log10(cap))
        lam = 10.0 ** rng.uniform(-6, np.log10(lam_hi))
        n = int(rng.choice([1, 7, 64]))
        if kind == ProxKind.TOTAL_VARIATION_1D and n == 1:
            n = 7
        _run_prox_trial(kind, params, f_np, sampler, scale, lam, n, dtype, rng)


# ---------------------------------------------------------------------------
# epigraph extremes: (x, t) = epi(v, s) must satisfy f(x) <= t (+tol) and the
# projection VI against feasible samples (z, f(z) + slack)
# ---------------------------------------------------------------------------

EPI_SPECS = [s for s in SPECS
             if KERNELS[s[0]].epi is not None]


@pytest.mark.parametrize("kind,params,f_np,sampler,cap64,cap32",
                         EPI_SPECS, ids=[s[0].name for s in EPI_SPECS])
@pytest.mark.parametrize("dtype", [np.float64, np.float32], ids=["f64", "f32"])
def test_fuzz_epigraph_extremes(kind, params, f_np, sampler, cap64, cap32,
                                dtype):
    entry = KERNELS[kind]
    rng = np.random.RandomState(zlib.crc32(("epi" + kind.name).encode()) % 2**31)
    cap = min(cap64 if dtype == np.float64 else cap32, 1e4)
    for trial in range(8):
        scale = 10.0 ** rng.uniform(-4, np.log10(cap))
        n = int(rng.choice([2, 7, 64]))
        v = sampler(rng, n, scale).astype(dtype)
        v64 = v.astype(np.float64)
        fv = float(f_np(v64))
        # s above, near, and below f(v): active and inactive projections
        s_off = rng.choice([-1.0, -0.1, 0.1, 1.0]) * max(abs(fv), scale, 1.0)
        s = dtype(fv + s_off)
        x, t = entry.epi(jnp.asarray(v), jnp.asarray(s), **params)
        x = np.asarray(x, np.float64)
        t = float(t)
        assert np.all(np.isfinite(x)) and np.isfinite(t), (
            f"{kind} epi non-finite at scale={scale}")
        mag = max(1.0, float(np.abs(v64).max()) ** 2, abs(fv), abs(t))
        eps = 5e-4 if dtype == np.float32 else 1e-7
        tol = eps * mag
        fx = float(f_np(x))
        assert fx <= t + tol, (
            f"{kind} epi infeasible: f(x)={fx:.6e} > t={t:.6e} (tol {tol:.1e})")
        # projection VI: <(v,s)-(x,t), (z,tz)-(x,t)> <= tol for feasible (z,tz)
        worst = -np.inf
        for _ in range(60):
            sc = 10.0 ** rng.uniform(-2, 0) * max(scale, 1e-3)
            z = x + sc * rng.randn(n)
            if kind in (ProxKind.SUM_INV_POS, ProxKind.SUM_NEG_LOG):
                z = np.abs(z) + 1e-8 * scale
            elif kind == ProxKind.SUM_NEG_ENTR:
                z = np.abs(z)
            fz = float(f_np(z))
            if not np.isfinite(fz):
                continue
            tz = fz + abs(rng.randn()) * max(abs(fz), 1.0) * 0.1
            viol = float(np.dot(v64 - x, z - x) + (s - t) * (tz - t))
            worst = max(worst, viol)
        assert worst <= tol, f"{kind} epi VI violated by {worst:.3e}"


# ---------------------------------------------------------------------------
# matrix-family epigraph extremes (VERDICT r2 item 9): NEG_LOG_DET /
# NORM_NUCLEAR / LAMBDA_MAX / SIGMA_MAX projections fuzzed over magnitudes,
# previously covered only by small fixed-trial oracle tests
# ---------------------------------------------------------------------------

def _sym_pd(rng, n, s):
    B = rng.randn(n, n)
    return s * (B @ B.T / n + 0.5 * np.eye(n))


def _sym(rng, n, s):
    B = rng.randn(n, n)
    return s * (B + B.T) / 2.0


def _gen(rng, n, s):
    return s * rng.randn(n, n)


def _pd_project(Z, floor):
    Zs = (Z + Z.T) / 2.0
    w, Q = np.linalg.eigh(Zs)
    return (Q * np.maximum(w, floor)) @ Q.T


MATRIX_EPI_SPECS = [
    (ProxKind.NEG_LOG_DET,
     lambda X: -np.linalg.slogdet(X)[1], _sym_pd, True),
    (ProxKind.LAMBDA_MAX,
     lambda X: float(np.linalg.eigvalsh((X + X.T) / 2)[-1]), _sym, False),
    (ProxKind.NORM_NUCLEAR,
     lambda X: float(np.sum(np.linalg.svd(X, compute_uv=False))), _gen, False),
    (ProxKind.SIGMA_MAX,
     lambda X: float(np.linalg.svd(X, compute_uv=False)[0]), _gen, False),
]


@pytest.mark.parametrize("kind,f_np,sampler,needs_pd", MATRIX_EPI_SPECS,
                         ids=[s[0].name for s in MATRIX_EPI_SPECS])
@pytest.mark.parametrize("dtype", [np.float64, np.float32], ids=["f64", "f32"])
def test_fuzz_epigraph_matrix(kind, f_np, sampler, needs_pd, dtype):
    entry = KERNELS[kind]
    rng = np.random.RandomState(
        zlib.crc32(("epimat" + kind.name).encode()) % 2**31)
    cap = 1e3 if dtype == np.float64 else 1e2
    for trial in range(8):
        scale = 10.0 ** rng.uniform(-3, np.log10(cap))
        n = int(rng.choice([2, 5, 12]))
        V = sampler(rng, n, scale).astype(dtype)
        V64 = V.astype(np.float64)
        fv = float(f_np(V64)) if not needs_pd else float(f_np(
            _pd_project(V64, 1e-6 * scale)))
        s_off = rng.choice([-1.0, -0.1, 0.1, 1.0]) * max(abs(fv), scale, 1.0)
        s = dtype(fv + s_off)
        X, t = entry.epi(jnp.asarray(V), jnp.asarray(s))
        X = np.asarray(X, np.float64)
        t = float(t)
        assert np.all(np.isfinite(X)) and np.isfinite(t), (
            f"{kind} epi non-finite at scale={scale}")
        mag = max(1.0, float(np.abs(V64).max()) ** 2, abs(fv), abs(t))
        eps = 2e-3 if dtype == np.float32 else 1e-6
        tol = eps * mag
        fx = float(f_np(X))
        assert fx <= t + tol, (
            f"{kind} epi infeasible: f(x)={fx:.6e} > t={t:.6e} (tol {tol:.1e})")
        # projection VI against feasible (Z, tz)
        worst = -np.inf
        for _ in range(40):
            sc = 10.0 ** rng.uniform(-2, 0) * max(scale, 1e-3)
            Z = X + sc * rng.randn(n, n)
            if needs_pd:
                Z = _pd_project(Z, 1e-8 * max(scale, 1.0))
            elif kind == ProxKind.LAMBDA_MAX:
                Z = (Z + Z.T) / 2.0
            fz = float(f_np(Z))
            if not np.isfinite(fz):
                continue
            tz = fz + abs(rng.randn()) * max(abs(fz), 1.0) * 0.1
            viol = float(np.sum((V64 - X) * (Z - X)) + (s - t) * (tz - t))
            worst = max(worst, viol)
        assert worst <= tol, f"{kind} epi VI violated by {worst:.3e}"
