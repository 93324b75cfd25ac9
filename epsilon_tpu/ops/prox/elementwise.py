"""Elementwise (separable) proximal operators.

Each kernel solves ``argmin_x f(x) + sum_i (x_i - v_i)^2 / (2 lam_i)`` with
``lam`` scalar or elementwise (the diagonal reduction of
``vector_prox.cc:72-116``), as closed forms or fixed-iteration safeguarded
Newton — everything vectorized on the VPU; no data-dependent loops.

Reference kernels being re-designed here: ``scaled_zone.cc`` (NORM_1 /
SUM_DEADZONE / SUM_HINGE / SUM_QUANTILE), ``non_negative.cc``, ``exp.cc``,
``sum_exp.cc``, ``sum_logistic.cc``, ``sum_inv_pos.cc``, ``sum_neg_entr.cc``,
``sum_neg_log.cc``, ``sum_kl_div.cc``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .util import bisect, newton_safeguarded, pwl_root, solve_w_log_w

# ---------------------------------------------------------------------------
# non_negative: f = I(x >= 0)                     (non_negative.cc:3-11)
# ---------------------------------------------------------------------------

def prox_non_negative(v, lam=None):
    return jnp.maximum(v, 0.0)


# ---------------------------------------------------------------------------
# scaled zone family                              (scaled_zone.cc:80-121)
# f(x) = sum_i alpha_i*max(0, (x_i-C)-M) + beta_i*max(0, -(x_i-C)-M)
#   NORM_1:       alpha=beta=1, C=M=0
#   SUM_DEADZONE: alpha=beta=1, C=0, M=margin
#   SUM_HINGE:    alpha=1, beta=0, C=M=0
#   SUM_QUANTILE: alpha, beta vectors, C=M=0
# ---------------------------------------------------------------------------

def prox_scaled_zone(v, lam, alpha=1.0, beta=1.0, C=0.0, M=0.0):
    x = v - C
    la = lam * alpha
    lb = lam * beta
    shrunk = jnp.where(
        x > M + la, x - la,
        jnp.where(x < -M - lb, x + lb, jnp.clip(x, -M, M)))
    out = jnp.where(jnp.abs(x) <= M, x, shrunk)
    return out + C


def eval_scaled_zone(x, alpha=1.0, beta=1.0, C=0.0, M=0.0):
    y = x - C
    return jnp.sum(alpha * jnp.maximum(0.0, y - M)
                   + beta * jnp.maximum(0.0, -y - M))


def epi_scaled_zone(v, s, alpha=1.0, beta=1.0, C=0.0, M=0.0):
    """Projection onto {(x, t): f_scaled_zone(x) <= t}.

    Replaces the randomized partition search (``scaled_zone.cc:122-280``)
    with the exact piecewise-linear root: with keys
    ``k_i = (|v_i - C| - M)/c_i`` and weights ``c_i^2`` (c = alpha or beta by
    side), lambda* solves ``sum_i c_i^2 max(0, k_i - lam) - s - lam = 0``.
    """
    alpha = jnp.broadcast_to(jnp.asarray(alpha, dtype=v.dtype), v.shape)
    beta = jnp.broadcast_to(jnp.asarray(beta, dtype=v.dtype), v.shape)
    y = v - C
    pos = y > M
    neg = y < -M
    c = jnp.where(pos, alpha, jnp.where(neg, beta, 0.0))
    active = (pos & (alpha > 0)) | (neg & (beta > 0))
    safe_c = jnp.where(active, c, 1.0)
    keys = jnp.where(active, (jnp.abs(y) - M) / safe_c, 0.0)
    w = jnp.where(active, c * c, 0.0)

    fval = eval_scaled_zone(v, alpha, beta, C, M)
    lam = pwl_root(-s, -1.0, keys, w)
    lam = jnp.maximum(lam, 0.0)
    x = prox_scaled_zone(v, lam, alpha, beta, C, M)
    t = s + lam
    inactive = fval <= s
    return jnp.where(inactive, v, x), jnp.where(inactive, s, t)


# Convenience wrappers matching the reference parameterization.
def prox_norm1(v, lam):
    return prox_scaled_zone(v, lam, 1.0, 1.0, 0.0, 0.0)


def prox_deadzone(v, lam, M):
    return prox_scaled_zone(v, lam, 1.0, 1.0, 0.0, M)


def prox_hinge(v, lam):
    return prox_scaled_zone(v, lam, 1.0, 0.0, 0.0, 0.0)


def prox_quantile(v, lam, alpha, beta):
    return prox_scaled_zone(v, lam, alpha, beta, 0.0, 0.0)


# ---------------------------------------------------------------------------
# sum_exp: f = sum exp(x)                          (sum_exp.cc:10-47)
# optimality: x + lam*exp(x) = v  =>  x = v - W(lam * e^v)
# ---------------------------------------------------------------------------

def prox_sum_exp(v, lam):
    c = jnp.log(lam) + v
    w = solve_w_log_w(c)
    return v - w


def eval_sum_exp(x):
    return jnp.sum(jnp.exp(x))


# ---------------------------------------------------------------------------
# exp epigraph: project (v, s) onto {(x, t): e^x <= t} elementwise
# (exp.cc:12-77). Active KKT: x = v - mu*e^x, t = e^x = s + mu. Eliminating
# mu: g(x) = x + e^{2x} - s e^x - v = 0 on x < v; g is increasing there.
# ---------------------------------------------------------------------------

def epi_exp(v, s):
    inactive = jnp.exp(v) <= s

    def g(x):
        ex = jnp.exp(x)
        return x + ex * ex - s * ex - v

    def gp(x):
        ex = jnp.exp(x)
        return 1.0 + 2.0 * ex * ex - s * ex

    # Bracket: g(v) = e^v(e^v - s) > 0 when active. Lower bound: decrease
    # until g < 0 (g -> -inf as x -> -inf).
    hi = v

    def widen(_, lo):
        return jnp.where(g(lo) > 0, lo - 2.0 * jnp.abs(lo) - 2.0, lo)

    lo = jax.lax.fori_loop(0, 40, widen, jnp.minimum(v, 0.0) - 1.0)
    # g is increasing wherever 2 e^x > s; the root has e^{x*} = s + mu > s,
    # i.e. x* > log(s/2), so clamping the bracket there keeps Newton's
    # monotonicity precondition without excluding the root.
    tiny = jnp.finfo(v.dtype).tiny
    lo = jnp.where(s > 0,
                   jnp.maximum(lo, jnp.log(jnp.maximum(s, tiny) * 0.5)), lo)
    x = newton_safeguarded(g, gp, 0.5 * (lo + hi), lo, hi, iters=25)
    t = jnp.exp(x)
    return jnp.where(inactive, v, x), jnp.where(inactive, s, t)


# ---------------------------------------------------------------------------
# sum_logistic: f = sum log(1 + e^x)              (sum_logistic.cc:8-44)
# optimality: x + lam*sigmoid(x) = v
# ---------------------------------------------------------------------------

def prox_sum_logistic(v, lam):
    def g(x):
        return x + lam * jax.nn.sigmoid(x) - v

    def gp(x):
        sig = jax.nn.sigmoid(x)
        return 1.0 + lam * sig * (1.0 - sig)

    lo = v - lam
    hi = v
    x0 = v - lam * jax.nn.sigmoid(v)
    return newton_safeguarded(g, gp, x0, lo - 1e-9, hi + 1e-9, iters=40)


def eval_sum_logistic(x):
    return jnp.sum(jnp.logaddexp(0.0, x))


# ---------------------------------------------------------------------------
# sum_inv_pos: f = sum 1/x, x > 0                 (sum_inv_pos.cc:11-50)
# optimality: (x - v) x^2 = lam, largest real root of x^3 - v x^2 - lam
# ---------------------------------------------------------------------------

def prox_sum_inv_pos(v, lam):
    def g(x):
        return x * x * (x - v) - lam

    def gp(x):
        return 3.0 * x * x - 2.0 * v * x

    lam = jnp.broadcast_to(jnp.asarray(lam, dtype=v.dtype), v.shape)
    hi = jnp.maximum(v, 0.0) + jnp.cbrt(lam) + 1.0

    def widen(_, hi):
        return jnp.where(g(hi) < 0, 2.0 * hi, hi)

    hi = jax.lax.fori_loop(0, 40, widen, hi)
    lo = jnp.full_like(v, 1e-12)
    x0 = jnp.maximum(v, jnp.cbrt(lam))
    return newton_safeguarded(g, gp, x0, lo, hi, iters=50)


def eval_sum_inv_pos(x):
    return jnp.sum(1.0 / x)


# ---------------------------------------------------------------------------
# sum_neg_entr: f = sum x log x, x >= 0           (sum_neg_entr.cc:11-56)
# optimality: lam*(log x + 1) + x - v = 0. With x = lam*u:
#   u + log u = (v - lam)/lam - log lam
# ---------------------------------------------------------------------------

def prox_sum_neg_entr(v, lam):
    c = (v - lam) / lam - jnp.log(lam)
    u = solve_w_log_w(c)
    return lam * u


def eval_sum_neg_entr(x):
    return jnp.sum(jax.scipy.special.xlogy(x, x))


# ---------------------------------------------------------------------------
# sum_neg_log: f = -sum log x, x > 0              (sum_neg_log.cc:10-89)
# optimality: x^2 - v x - lam = 0 => x = (v + sqrt(v^2 + 4 lam))/2
# ---------------------------------------------------------------------------

def prox_sum_neg_log(v, lam):
    return 0.5 * (v + jnp.sqrt(v * v + 4.0 * lam))


def eval_sum_neg_log(x):
    return -jnp.sum(jnp.log(x))


def epi_sum_neg_log(v, s):
    """Projection onto {(x, t): -sum log x_i <= t} via arrowhead-KKT Newton
    (``sum_neg_log.cc:34-79`` scalar-Newton equivalent; newton.cc:109-190)."""
    from .newton_epi import make_epigraph
    eps = jnp.finfo(v.dtype).tiny
    epi = make_epigraph(
        eval_sum_neg_log,
        lambda x: -1.0 / x,
        fhess=lambda x: 1.0 / (x * x),
        proj=lambda x: jnp.maximum(
            x, 1e-12 if v.dtype == jnp.float64 else 1e-6),
        dom=lambda u: jnp.all(u > 0),
        prox=prox_sum_neg_log)
    return epi(v, s)


# ---------------------------------------------------------------------------
# sum_kl_div: f(x, y) = sum x log(x/y) - x + y    (sum_kl_div.cc:6-120)
# Inner per-element Newton on r = x/y (the reference's "yhat"):
#   lam*r^2 + (v - lam)*r - u + lam*log r = 0,  then
#   y = lam*r + v - lam,  x = y*r.
# ---------------------------------------------------------------------------

def prox_sum_kl_div(u, v, lam):
    eps = 1e-13 if jnp.result_type(u) == jnp.float64 else 1e-6
    lam = jnp.broadcast_to(jnp.asarray(lam, dtype=u.dtype), u.shape)

    def g(r):
        return lam * r * r + (v - lam) * r - u + lam * jnp.log(r)

    def gp(r):
        return 2.0 * lam * r + (v - lam) + lam / r

    lo = jnp.full_like(u, eps)
    # feasibility also requires y = lam*r + v - lam > 0, i.e.
    # r > (lam - v)/lam; tighten the lower bracket accordingly.
    lo = jnp.maximum(lo, (lam - v) / lam + eps)

    def widen(_, hi):
        return jnp.where(g(hi) < 0, 2.0 * hi, hi)

    hi = jax.lax.fori_loop(0, 60, widen, jnp.maximum(lo * 2.0, 1.0))
    r0 = jnp.clip(jnp.maximum((0.5 + lam - v) / lam, eps), lo, hi)
    r = newton_safeguarded(g, gp, r0, lo, hi, iters=60)
    y = lam * r + v - lam
    x = y * r
    tiny = (jnp.abs(u) < eps * eps) & (jnp.abs(v) < eps * eps)
    return jnp.where(tiny, u, x), jnp.where(tiny, v, y)


def eval_sum_kl_div(x, y):
    return jnp.sum(jax.scipy.special.rel_entr(x, y) - x + y)


def epi_sum_kl_div(u, v, s):
    """Projection onto {(x, y, t): KL(x, y) <= t} via arrowhead-KKT Newton
    with per-element 2x2 Hessian blocks (``sum_kl_div.cc:69-120``)."""
    from .newton_epi import epi_sum_kl_div as _newton_kl
    return _newton_kl(u, v, s)
