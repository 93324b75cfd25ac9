"""Vector (non-separable) proximal operators.

Reference kernels re-designed here: ``max.cc`` (sort-and-pool),
``sum_largest.cc`` (two-pointer window), ``norm_2.cc`` (block soft
threshold), ``second_order_cone.cc`` (row-wise SOC projection),
``log_sum_exp.cc`` (Newton with Sherman-Morrison Hessian inverse).
All pointer loops become one sort + :func:`pwl_root` prefix-sum closed forms.
``lam`` is scalar for these kernels (``vector_prox.cc:51-70`` scalar case).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .util import pwl_root

# ---------------------------------------------------------------------------
# max: f(x) = max_i x_i                            (max.cc:7-44)
# prox: x = min(v, t) with t solving sum_i max(0, v_i - t) = lam
# ---------------------------------------------------------------------------

def prox_max(v, lam):
    t = pwl_root(-lam, 0.0, v, jnp.ones_like(v))
    x = jnp.minimum(v, t)
    return jnp.where(lam <= 0, v, x)


def eval_max(x):
    return jnp.max(x)


def epi_max(v, s):
    """Project (v, s) onto {(x, t): max x_i <= t} (``max.cc:46-87``):
    delta solves sum_i max(0, (v_i - s) - delta) = delta."""
    delta = pwl_root(0.0, -1.0, v - s, jnp.ones_like(v))
    delta = jnp.maximum(delta, 0.0)
    t = s + delta
    x = jnp.minimum(v, t)
    inactive = jnp.max(v) <= s
    return jnp.where(inactive, v, x), jnp.where(inactive, s, t)


# ---------------------------------------------------------------------------
# sum_largest: f(x) = sum of k largest entries     (sum_largest.cc:8-85)
# prox: x = v - clip(v - q, 0, lam) with q solving
#   sum_i clip(v_i - q, 0, lam) = k*lam
# (the reference's sliding-window search; here clip = max(0,v-q) -
#  max(0,(v-lam)-q) makes it a pwl_root in q with mixed-sign weights)
# ---------------------------------------------------------------------------

def prox_sum_largest(v, lam, k):
    keys = jnp.concatenate([v, v - lam])
    w = jnp.concatenate([jnp.ones_like(v), -jnp.ones_like(v)])
    q = pwl_root(-k * lam, 0.0, keys, w)
    x = v - jnp.clip(v - q, 0.0, lam)
    return jnp.where(lam <= 0, v, x)


def eval_sum_largest(x, k):
    n = x.shape[-1]
    top = jax.lax.top_k(x, min(k, n))[0]
    return jnp.sum(top)


# ---------------------------------------------------------------------------
# norm_2: f(x) = ||x||_2                           (norm_2.cc:4-19)
# ---------------------------------------------------------------------------

def prox_norm2(v, lam):
    nrm = jnp.linalg.norm(v)
    tiny = jnp.finfo(v.dtype).tiny
    scale = jnp.maximum(0.0, 1.0 - lam / jnp.maximum(nrm, tiny))
    return scale * v


def eval_norm2(x):
    return jnp.linalg.norm(x)


def epi_norm2(v, s):
    """Projection onto the second-order cone {(x, t): ||x|| <= t}."""
    nrm = jnp.linalg.norm(v)
    tiny = jnp.finfo(v.dtype).tiny
    inside = nrm <= s
    polar = nrm <= -s
    t = 0.5 * (nrm + s)
    scale = t / jnp.maximum(nrm, tiny)
    x = jnp.where(inside, v, jnp.where(polar, 0.0, scale * v))
    tt = jnp.where(inside, s, jnp.where(polar, 0.0, t))
    return x, tt


# ---------------------------------------------------------------------------
# norm_inf: f(x) = max_i |x_i|
# No direct reference kernel (the reference routes norm_inf through the
# conic fallback, ``conic.py:15-43`` p=inf branch); this direct kernel is
# the Moreau dual of the l1-ball projection and also powers SIGMA_MAX.
# prox: x = clip(v, -t, t) with t >= 0 solving sum_i max(0, |v_i| - t) = lam
# (one sort + prefix sums via pwl_root, same pattern as prox_max).
# ---------------------------------------------------------------------------

def prox_norm_inf(v, lam):
    a = jnp.abs(v)
    t = pwl_root(-lam, 0.0, a, jnp.ones_like(a))
    t = jnp.maximum(t, 0.0)
    x = jnp.clip(v, -t, t)
    return jnp.where(lam <= 0, v, x)


def eval_norm_inf(x):
    return jnp.max(jnp.abs(x))


def epi_norm_inf(v, s):
    """Project (v, s) onto {(x, t): ||x||_inf <= t}: for fixed t the cost is
    phi(t) = sum_i max(0, |v_i|-t)^2/2 + (t-s)^2/2, so t* solves
    s - t + sum_i max(0, |v_i| - t) = 0, clamped at t >= 0 (phi convex)."""
    a = jnp.abs(v)
    t = pwl_root(s, -1.0, a, jnp.ones_like(a))
    t = jnp.maximum(t, 0.0)
    x = jnp.clip(v, -t, t)
    inactive = eval_norm_inf(v) <= s
    return jnp.where(inactive, v, x), jnp.where(inactive, s, t)


# ---------------------------------------------------------------------------
# second_order_cone: row-wise projection onto ||x_i|| <= beta * t_i
# (second_order_cone.cc:59-76, ApplyProjection)
# ---------------------------------------------------------------------------

def project_soc_rows(X, t, beta=1.0):
    """Project each row x_i of X and scalar t_i onto {||x|| <= beta*t}."""
    nrm = jnp.linalg.norm(X, axis=-1)
    tiny = jnp.finfo(X.dtype).tiny
    beta2 = beta * beta
    alpha = (beta2 + beta * t / jnp.maximum(nrm, tiny)) / (beta2 + 1.0)
    inside = (nrm <= beta * t) | (nrm <= tiny)
    polar = alpha < 0
    alpha = jnp.clip(alpha, 0.0, 1.0)
    alpha = jnp.where(inside, 1.0, alpha)
    t_out = jnp.where(inside, t, jnp.where(polar, 0.0, alpha * nrm / beta))
    X_out = alpha[..., None] * X
    return X_out, t_out


# ---------------------------------------------------------------------------
# log_sum_exp: f(x) = log sum_i exp(x_i)          (log_sum_exp.cc:21-78)
# prox optimality: x + lam * softmax(x) = v.  Newton with the
# Sherman-Morrison rank-1 corrected Hessian inverse, fixed iterations.
# ---------------------------------------------------------------------------

def prox_log_sum_exp(v, lam):
    """Moreau-dual solve, robust for ALL lam (the joint-Newton form 2-cycles
    at lam >> |v|):  prox_{lam*LSE}(v) = v - q  where  q = lam*p,  p in the
    simplex minimizes the entropic projection (LSE* = neg-entropy on the
    simplex).  Stationarity gives the elementwise Lambert-type equation

        q_i + log q_i = v_i + log lam - 1 - nu   (q_i = solve_w_log_w)

    closed by the monotone scalar condition sum_i q_i = lam, solved with
    bracketed safeguarded Newton.  Both bracket endpoints are log-lam-free
    after cancellation, so the method is stable from lam = 1e-6 to 1e+6
    (``log_sum_exp.cc:21-78`` parity at extremes the reference never
    reaches)."""
    from .util import newton_safeguarded, solve_w_log_w
    v = jnp.asarray(v)
    dt = v.dtype
    lam = jnp.asarray(lam, dt)
    n = v.shape[-1] if v.ndim else 1
    c0 = v + jnp.log(lam) - 1.0
    lse_c0 = jax.scipy.special.logsumexp(c0)
    # W(c) <= e^c  =>  at hi = LSE(c0) - log lam + 1, sum q <= lam/e < lam;
    # W(lam/n + log(lam/n)) = lam/n  =>  at lo, every q_i >= lam/n
    lo = jnp.min(c0) - lam / n - jnp.log(lam / n)
    hi = lse_c0 - jnp.log(lam) + 1.0

    def g(nu):
        return lam - jnp.sum(solve_w_log_w(c0 - nu))

    def gp(nu):
        q = solve_w_log_w(c0 - nu)
        return jnp.sum(q / (1.0 + q))

    nu0 = jnp.clip(lse_c0 - jnp.log(lam), lo, hi)
    nu = newton_safeguarded(g, gp, nu0, lo, hi, iters=25)
    q = solve_w_log_w(c0 - nu)
    return v - q


def eval_log_sum_exp(x):
    return jax.scipy.special.logsumexp(x)


def epi_log_sum_exp(v, s):
    """Projection onto {(x, t): logsumexp(x) <= t} via arrowhead-KKT Newton
    with the Sherman-Morrison rank-1 metric solve (``log_sum_exp.cc:21-78``,
    ``newton.cc:109-190``)."""
    from .newton_epi import epi_log_sum_exp as _newton_lse
    return _newton_lse(v, s)
