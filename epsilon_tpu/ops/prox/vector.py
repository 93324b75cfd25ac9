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
    def body(_, x):
        p = jax.nn.softmax(x)
        g = x + lam * p - v
        # H = I + lam*(diag(p) - p p^T);  H^{-1} g via Sherman-Morrison:
        # H = D - lam p p^T with D = I + lam diag(p)
        d = 1.0 + lam * p
        Dinv_g = g / d
        Dinv_p = p / d
        denom = 1.0 - lam * jnp.dot(p, Dinv_p)
        step = Dinv_g + lam * Dinv_p * jnp.dot(p, Dinv_g) \
            / jnp.maximum(denom, jnp.finfo(x.dtype).tiny)
        return x - step

    x0 = v - lam * jax.nn.softmax(v)
    return jax.lax.fori_loop(0, 50, body, x0)


def eval_log_sum_exp(x):
    return jax.scipy.special.logsumexp(x)


def epi_log_sum_exp(v, s):
    """Projection onto {(x, t): logsumexp(x) <= t} via arrowhead-KKT Newton
    with the Sherman-Morrison rank-1 metric solve (``log_sum_exp.cc:21-78``,
    ``newton.cc:109-190``)."""
    from .newton_epi import epi_log_sum_exp as _newton_lse
    return _newton_lse(v, s)
