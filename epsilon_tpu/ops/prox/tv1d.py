"""Total-variation 1-D prox (fused lasso signal approximator).

The reference delegates to glmgen's ``tf_dp`` dynamic program
(``total_variation_1d.cc:6-25``, third_party C) — an inherently sequential,
data-dependent algorithm that cannot jit onto a TPU.

TPU-native design: Douglas-Rachford/ADMM splitting of

    argmin_x  (1/2)||x - v||^2 + lam * ||D x||_1

whose x-update ``(I + rho D^T D)^{-1} r`` is solved *exactly* in closed form
in the DCT-II basis (D^T D is the free-boundary 1-D Laplacian with
eigenvalues ``2 - 2 cos(pi k / n)``), giving an O(n log n) FFT-based direct
solve per iteration — no tridiagonal scans, no data-dependent control flow.

Accuracy is *certified*, not assumed: the TV-denoising dual

    max_{|z|_inf <= lam}  v.(D^T z) - (1/2)||D^T z||^2,   x = v - D^T z

gives, for ANY feasible z (we clip the running scaled ADMM dual), a
primal-feasible candidate ``x_d = v - D^T z`` whose duality gap reduces to
the elementwise-nonnegative sum

    gap(z) = sum_i [ lam*|d_i| - z_i*d_i ],   d = D x_d,

and 1-strong convexity of the primal yields the certificate
``||x_d - x*||^2 <= 2*gap``.  :func:`prox_tv1d` runs epochs of ADMM
iterations under ``lax.while_loop``, stopping when the certified gap meets
tolerance (with residual-balancing rho adaptation between epochs) and
returns the *dual-certified* point ``x_d``.

A sequential exact host implementation lives in
:mod:`epsilon_tpu.native` (tf_dp-equivalent, for CPU offline use).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["prox_tv1d", "prox_tv1d_certified", "prox_tv1d_multiscale",
           "prox_tv1d_pdas", "prox_tv1d_registry", "pcr_tridiag_solve",
           "eval_tv1d", "neumann_laplacian_solve",
           "neumann_laplacian_solve_conv", "tv1d_gap", "tv_gap_tol",
           "default_tv_tol"]


def neumann_laplacian_solve(r, rho):
    """Solve ``(I + rho * D^T D) x = r`` exactly, where D^T D is the
    free-boundary (Neumann) 1-D Laplacian, via the mirror-extension FFT
    trick: on the even-symmetric length-2n extension the operator is a
    circulant, so the solve is one rfft / irfft pair."""
    n = r.shape[-1]
    ext = jnp.concatenate([r, r[..., ::-1]], axis=-1)
    R = jnp.fft.rfft(ext, axis=-1)
    k = jnp.arange(R.shape[-1], dtype=r.dtype)
    eig = 2.0 - 2.0 * jnp.cos(jnp.pi * k / n)
    x = jnp.fft.irfft(R / (1.0 + rho * eig), n=2 * n, axis=-1)
    return x[..., :n].astype(r.dtype)


def default_tv_tol(dtype):
    """Default certificate tolerance near sqrt-precision: the computed
    duality gap has a roundoff floor ~ n*eps*lam*scale, so demanding
    gap_tol = 0.5*(64*eps*scale)^2 is unreachable and the while_loop would
    always run to max_iters (round-2 advisor finding).  sqrt-precision is
    the tightest *certifiable* target: 1e-7 (f64) / 3e-4 (f32)."""
    return 1e-7 if jnp.finfo(dtype).bits == 64 else 3e-4


def pdas_default_tol(dtype):
    """Tighter default for the PDAS kernel (see prox_tv1d_pdas)."""
    return 1e-9 if jnp.finfo(dtype).bits == 64 else 3e-6


def tv_gap_tol(v, tol):
    """Gap threshold for ``||x - x*||_2 <= tol*scale``: 1-strong convexity
    gives ``||x - x*||^2 <= 2*gap``, so stop at ``gap <= 0.5*(tol*scale)^2``
    with ``scale = max(1, ||v||_2)``."""
    dt = v.dtype
    scale = jnp.maximum(1.0, jnp.sqrt(jnp.sum(v * v)))
    return 0.5 * (jnp.asarray(tol, dt) * scale) ** 2


def neumann_laplacian_solve_conv(r, rho, taps: int = 256, block: int = 256):
    """Same solve as :func:`neumann_laplacian_solve` via the decaying
    Toeplitz inverse kernel instead of FFT.  The infinite-grid inverse of
    ``I + rho*D^T D`` is ``g[d] = q^|d| / sqrt(1+4 rho)`` with
    ``q = (1+2 rho - sqrt(1+4 rho)) / (2 rho)`` (|q|<1), so the solve is a
    (2*taps-1)-tap correlation of the 'symmetric'-padded signal.

    Realized as overlapping frames x banded-Toeplitz MATMUL — XLA's 1D conv
    lowers to a ~1 GFLOP/s scalar path on TPU, while this form is pure MXU:
    frames (n/block, block+2*taps-2) gathered once, times the in-graph
    Toeplitz T[w, j] = g[w - j] (computable from a *traced* rho, so
    residual-balancing rho updates cost nothing).  Truncation error is
    ``O(q^taps * ||r||_inf)``; callers that need exactness certify a
    posteriori (the duality-gap certificate in :func:`prox_tv1d_certified`
    is oblivious to how x was produced)."""
    dt = r.dtype
    n = r.shape[-1]
    K, C = taps, block
    W = C + 2 * K - 2
    F = -(-n // C)
    rho = jnp.asarray(rho, dt)
    s = jnp.sqrt(1.0 + 4.0 * rho)
    q = jnp.where(rho > 0, (1.0 + 2.0 * rho - s) / (2.0 * rho), 0.0)

    # banded Toeplitz (W, C): T[w, j] = q^|w-j-(K-1)| / s inside the band
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (W, C), 1)
    d = w_idx - j_idx - (K - 1)
    band = (d > -K) & (d < K)
    T = jnp.where(band, jnp.power(q, jnp.abs(d).astype(dt)) / s, 0.0)

    # pad only the signal (last) axis so leading batch axes pass through
    pad = [(0, 0)] * (r.ndim - 1) + [(K - 1, K - 1 + F * C - n)]
    ext = jnp.pad(r, pad, mode="symmetric")
    idx = (C * jnp.arange(F, dtype=jnp.int32)[:, None]
           + jnp.arange(W, dtype=jnp.int32)[None, :])
    frames = jnp.take(ext, idx, axis=-1)          # (..., F, W)
    acc = jnp.promote_types(dt, jnp.float32)
    y = jnp.dot(frames, T, preferred_element_type=acc).astype(dt)
    return y.reshape(r.shape[:-1] + (F * C,))[..., :n]


def _diff(x):
    return x[..., 1:] - x[..., :-1]


def _diff_t(w):
    """D^T w for the forward-difference operator."""
    pad = jnp.zeros_like(w[..., :1])
    return jnp.concatenate([-w, pad], axis=-1) + jnp.concatenate([pad, w], axis=-1)


def _soft(x, t):
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - t, 0.0)


@partial(jax.jit, static_argnames=("iters",))
def prox_tv1d(v, lam, iters: int = 150, rho: float = 1.0):
    """ADMM with exact DCT-based x-update.

    minimize (1/2)||x-v||^2 + lam ||w||_1  s.t.  D x = w.
    """
    def x_update(r):
        return neumann_laplacian_solve(r, rho)

    def body(_, state):
        x, w, u = state
        x = x_update(v + rho * _diff_t(w - u))
        dx = _diff(x)
        w = _soft(dx + u, lam / rho)
        u = u + dx - w
        return x, w, u

    w0 = _soft(_diff(v), lam)
    u0 = jnp.zeros_like(w0)
    x0 = v
    x, w, u = jax.lax.fori_loop(0, iters, body, (x0, w0, u0))
    # final primal-feasible polish: project x to be consistent with w on
    # converged segments is unnecessary; return x directly
    return x


def tv1d_gap(v, lam, z):
    """Primal-dual gap of the feasible dual candidate ``z`` (``|z| <= lam``
    assumed): returns ``(x_d, gap)`` with ``x_d = v - D^T z`` primal and
    ``gap = sum_i lam*|d_i| - z_i*d_i`` (``d = D x_d``), an elementwise-
    nonnegative sum, hence numerically stable.  ``||x_d - x*||^2 <= 2*gap``."""
    xd = v - _diff_t(z)
    d = _diff(xd)
    gap = jnp.sum(lam * jnp.abs(d) - z * d)
    return xd, gap


@partial(jax.jit, static_argnames=("max_iters", "check_every"))
def prox_tv1d_certified(v, lam, tol=None, max_iters=3000, check_every=32,
                        rho0=1.0, w0=None, u0=None):
    """Gap-certified TV prox: DR/ADMM epochs under ``lax.while_loop`` with
    residual-balancing rho adaptation, stopping when the certified duality
    gap satisfies ``gap <= 0.5*(tol*scale)^2`` (``scale = max(1, ||v||_2)``),
    i.e. ``||x - x*||_2 <= tol*scale``.  Returns ``(x_d, gap, iters)`` where
    ``x_d`` is the dual-certified primal point.

    Replaces the reference's exact-but-sequential glmgen ``tf_dp``
    (``total_variation_1d.cc:6-25``) with a TPU-parallel method carrying an
    a-posteriori exactness certificate."""
    dt = v.dtype
    n = v.shape[-1]
    lam = jnp.asarray(lam, dt)
    if tol is None:
        tol = default_tv_tol(dt)
    gap_tol = tv_gap_tol(v, tol)

    # x-update solver: MXU conv with truncated inverse kernel for long
    # signals (rho clamped so the kernel tail is < ~1e-8), exact FFT solve
    # for short ones (where the conv padding would exceed the signal)
    taps = 256
    if n >= 2 * taps:   # conv framing pads up to 2*taps-2 on the right
        rho_hi = jnp.asarray(200.0, dt)
        solve = partial(neumann_laplacian_solve_conv, taps=taps)
    else:
        rho_hi = jnp.asarray(jnp.inf, dt)
        solve = neumann_laplacian_solve

    if w0 is None:
        w0 = _soft(_diff(v), lam)
    if u0 is None:
        u0 = jnp.zeros_like(w0)
    # the w-update threshold is lam/rho: start rho at ~lam so the first
    # epochs already operate at the right shrinkage scale (residual
    # balancing refines from there)
    rho_init = jnp.minimum(jnp.maximum(jnp.asarray(rho0, dt), lam), rho_hi)

    def epoch_body(state):
        w, u, rho, it, _gap = state

        def inner(_, s):
            w, w_prev, u = s
            x = solve(v + rho * _diff_t(w - u), rho)
            # over-relaxation (alpha = 1.8) on the splitting variable
            dx = 1.8 * _diff(x) + (1.0 - 1.8) * w
            w_new = _soft(dx + u, lam / rho)
            u = u + dx - w_new
            return w_new, w, u

        w, w_prev, u = jax.lax.fori_loop(
            0, check_every, inner, (w, w, u))
        # residual balancing (He-Yang-Wang): scaled dual u tracks y/rho
        x = solve(v + rho * _diff_t(w - u), rho)
        r_p = jnp.sqrt(jnp.sum((_diff(x) - w) ** 2))
        r_d = rho * jnp.sqrt(jnp.sum(_diff_t(w - w_prev) ** 2))
        grow = r_p > 10.0 * r_d
        shrink = r_d > 10.0 * r_p
        fac = jnp.where(grow, 2.0, jnp.where(shrink, 0.5, 1.0)).astype(dt)
        rho = jnp.minimum(rho * fac, rho_hi)
        u = u * (state[2] / rho)
        z = jnp.clip(rho * u, -lam, lam)
        _, gap = tv1d_gap(v, lam, z)
        return w, u, rho, it + check_every, gap

    def cond(state):
        _w, _u, _rho, it, gap = state
        return jnp.logical_and(it < max_iters, gap > gap_tol)

    gap_init = jnp.asarray(jnp.inf, dt)
    w, u, rho, iters, gap = jax.lax.while_loop(
        cond, epoch_body, (w0, u0, rho_init, jnp.zeros((), jnp.int32),
                           gap_init))
    z = jnp.clip(rho * u, -lam, lam)
    xd, gap = tv1d_gap(v, lam, z)
    return xd, gap, iters


def pcr_tridiag_solve(a, b, c, d):
    """Solve the tridiagonal system ``a_i z_{i-1} + b_i z_i + c_i z_{i+1}
    = d_i`` by parallel cyclic reduction: ceil(log2 n) elimination rounds of
    pure elementwise ops and static shifts — O(n log n) work at O(log n)
    depth, the TPU-parallel replacement for the sequential Thomas algorithm.
    Stable for the diagonally-dominant M-matrix systems produced by
    :func:`prox_tv1d_pdas`.  Out-of-range neighbours are identity rows."""
    n = a.shape[-1]
    steps = max(1, int(np.ceil(np.log2(max(n, 2)))))

    def shift(x, s, fill):
        # x shifted so result[i] = x[i - s] (s may be negative)
        if s >= 0:
            return jnp.concatenate([jnp.full((s,), fill, x.dtype), x[:n - s]])
        s = -s
        return jnp.concatenate([x[s:], jnp.full((s,), fill, x.dtype)])

    for k in range(steps):
        s = 1 << k
        bm, bp = shift(b, s, 1.0), shift(b, -s, 1.0)
        am, ap = shift(a, s, 0.0), shift(a, -s, 0.0)
        cm, cp = shift(c, s, 0.0), shift(c, -s, 0.0)
        dm, dp = shift(d, s, 0.0), shift(d, -s, 0.0)
        alpha = -a / bm
        gamma = -c / bp
        a = alpha * am
        c = gamma * cp
        b = b + alpha * cm + gamma * ap
        d = d + alpha * dm + gamma * dp
    return d / b


def prox_tv1d_pdas(v, lam, tol=None, max_iters: int = 40, z0=None,
                   return_dual: bool = False):
    """Exact-convergent TV prox via primal-dual active set (semismooth
    Newton) on the dual box-QP

        min_z  (1/2)||D^T z - v||^2   s.t.  |z| <= lam,

    whose Hessian ``D D^T`` is a tridiagonal M-matrix: each PDAS round
    guesses the active bound set from the primal-dual indicator, pins those
    coordinates at +-lam, solves the remaining (still tridiagonal) system
    with :func:`pcr_tridiag_solve`, and repeats until the active set is a
    fixed point — typically 10-20 rounds, each O(n log n)/O(log n)-depth,
    with *finite* termination (Hintermueller-Ito-Kunisch; the M-matrix
    structure is the favourable case).  The returned gap is the same
    a-posteriori duality-gap certificate as :func:`prox_tv1d_certified`,
    also used as the per-round stop: the loop exits as soon as
    ``gap <= tv_gap_tol(v, tol)`` (default tol: :func:`default_tv_tol`),
    so inner work is bounded by the caller's accuracy demand.
    Replaces glmgen ``tf_dp`` (``total_variation_1d.cc:6-25``) at scale.
    Returns ``(x, gap, iters)``."""
    v = jnp.asarray(v)
    dt = v.dtype
    lamd = jnp.asarray(lam, dt)
    n = v.shape[-1]
    if n <= 1:   # no differences: prox is the identity
        out = (v, jnp.zeros((), dt), jnp.zeros((), jnp.int32))
        return out + (jnp.zeros((0,), dt),) if return_dual else out
    dv = _diff(v)
    m = n - 1
    if tol is None:
        # tighter than default_tv_tol: PDAS exits on the active-set fixed
        # point when the dtype's gap floor is hit, so a tight default costs
        # a handful of extra rounds, never a runaway loop (measured at
        # n=1e6 f32: tol 3e-6 -> 16 rounds, max err 7e-6; tol 3e-4 -> 9
        # rounds but max err 1.9 on long large-offset signals whose
        # ||v||_2 scale makes the loose certificate nearly vacuous)
        tol = pdas_default_tol(dt)
    gap_tol = tv_gap_tol(v, tol)
    if z0 is None:
        z0 = jnp.zeros((m,), dt)
    else:
        # warm duals may come from a different lam (adaptive rho): project
        # into the current box so the first indicator reads feasible z
        z0 = jnp.clip(jnp.asarray(z0, dt), -lamd, lamd)

    def qmul(z):
        return _diff(_diff_t(z))        # D D^T z (tridiag [-1, 2, -1])

    def body(carry):
        z, _changed, it, act_prev, _gap = carry
        g = qmul(z) - dv
        # PDAS indicator (mu = -g): active_hi where mu + (z - lam) > 0
        act_hi = (-g + (z - lamd)) > 0
        act_lo = (-g + (z + lamd)) < 0
        act = act_hi.astype(jnp.int8) - act_lo.astype(jnp.int8)
        inactive = act == 0
        one = jnp.ones((), dt)
        b = jnp.where(inactive, 2.0 * one, one)
        a = jnp.where(inactive, -one, 0.0)
        c = jnp.where(inactive, -one, 0.0)
        # neighbours' couplings to pinned rows move to the RHS implicitly:
        # pinned rows read z = +-lam exactly, and inactive rows keep their
        # full stencil, so fold the pinned values into d via the solve on
        # the full modified system
        pin = jnp.where(act_hi, lamd, -lamd)
        d = jnp.where(inactive, dv, pin)
        # inactive rows still reference active neighbours through a/c: keep
        # those couplings (the pinned row's equation z_i = pin makes the
        # joint system correct)
        z_new = pcr_tridiag_solve(a, b, c, d)
        # projected line search on the dual objective J = ||D^T z - v||^2:
        # plain PDAS can 2-cycle between active-set guesses; damping toward
        # the incumbent restores monotone decrease while full steps near the
        # solution keep the finite-termination endgame.  J is exactly
        # quadratic, so each trial's CHANGE is evaluated without forming J
        # itself:  J(z+e) - J(z) = 2 e.(Qz - dv) + e.Qe  (Q = D D^T) —
        # every term scales with ||e||, so there is no large-sum
        # cancellation (in f32 at n ~ 1e6, J-differencing is pure roundoff
        # and the search used to stall; the quadratic form stays exact).
        alphas = (0.5 ** jnp.arange(6)).astype(dt)

        def dJ(al):
            e = jnp.clip(z + al * (z_new - z), -lamd, lamd) - z
            return 2.0 * jnp.dot(e, g) + jnp.dot(e, qmul(e))

        trials = jax.vmap(dJ)(alphas)
        # descent slack at the roundoff scale of the quadratic form itself
        tol0 = 64.0 * jnp.finfo(dt).eps * (1.0 + jnp.dot(dv, dv))
        full_ok = trials[0] <= tol0
        idx = jnp.where(full_ok, 0, jnp.argmin(trials))
        z_next = jnp.clip(z + alphas[idx] * (z_new - z), -lamd, lamd)
        # keep the incumbent if even the best trial increases J
        worse = trials[idx] > tol0
        z_next = jnp.where(worse, z, z_next)
        settled = jnp.all(act == act_prev) & full_ok
        _, gap = tv1d_gap(v, lamd, z_next)
        return z_next, ~settled, it + 1, act, gap

    def cond(carry):
        _z, changed, it, _act, gap = carry
        return changed & (it < max_iters) & (gap > gap_tol)

    act0 = jnp.full((m,), 127, jnp.int8)   # sentinel: never equals first act
    gap0 = jnp.asarray(jnp.inf, dt)
    z, _, iters, _, _ = jax.lax.while_loop(
        cond, body, (z0, jnp.asarray(True), jnp.zeros((), jnp.int32), act0,
                     gap0))
    z = jnp.clip(z, -lamd, lamd)
    x, gap = tv1d_gap(v, lamd, z)
    if return_dual:
        return x, gap, iters, z
    return x, gap, iters


def prox_tv1d_multiscale(v, lam, tol=1e-6, coarse_n: int = 2048,
                         fine_iters: int = 512, check_every: int = 32):
    """Gap-certified TV prox for LONG signals via multiscale continuation.

    Plain DR propagates information only ~sqrt(rho) positions per iteration,
    so signals with long flat segments (the canonical 1M-point trend-filter
    workload, BASELINE config[2]) converge slowly from a cold start.  The
    coarse-to-fine cure: pair-decimation of the prox is again a TV prox —
    averaging pairs gives ``argmin sum 2*(x_c - v_c)^2/2 + lam*TV(x_c)``,
    i.e. ``prox_{(lam/2) TV}(v_c)`` — so we recurse to <= ``coarse_n``
    points, upsample, and rebuild the *dual* from the primal candidate via
    the KKT identity ``z = -cumsum(v - x)`` (an associative scan), giving a
    fully warm primal-dual start for a short certified fine-level solve.
    Every level's solve carries the same duality-gap certificate; the
    returned gap is the FINE-level certificate, so coarse-level error never
    goes unnoticed.  Returns ``(x, gap, iters_at_finest)``."""
    v = jnp.asarray(v)
    n = v.shape[-1]
    if n <= coarse_n:
        return prox_tv1d_certified(v, lam, tol=tol)
    # Coarse level: pair-decimate (edge-pad to even first — the padding
    # only shapes the WARM START; the final certified solve below always
    # runs on the original signal, so the certificate is for the true
    # problem even when n is odd).
    v_even = v if n % 2 == 0 else jnp.pad(v, (0, 1), mode="edge")
    vc = 0.5 * (v_even[0::2] + v_even[1::2])
    xc, _, _ = prox_tv1d_multiscale(vc, 0.5 * jnp.asarray(lam, v.dtype),
                                    tol=tol, coarse_n=coarse_n,
                                    fine_iters=fine_iters)
    x_hat = jnp.repeat(xc, 2)[:n]
    # dual candidate from stationarity v - x = D^T z:  z_k = -sum_{i<=k}(v-x)
    z = -jnp.cumsum(v - x_hat)[:-1]
    lamd = jnp.asarray(lam, v.dtype)
    z = jnp.clip(z, -lamd, lamd)
    rho0 = jnp.maximum(jnp.asarray(1.0, v.dtype), lamd)
    w0 = _diff(x_hat)
    u0 = z / jnp.minimum(rho0, 200.0)
    return prox_tv1d_certified(v, lam, tol=tol, max_iters=fine_iters,
                               check_every=check_every, w0=w0, u0=u0)


def prox_tv1d_registry(v, lam):
    """Registry entry point for ``ProxKind.TOTAL_VARIATION_1D``: PDAS
    (finite-termination, 8-16 rounds at any n up to 1e6, exact to roundoff)
    at the inner tolerance the active solver requested via
    ``config.set_prox_inner_tol`` (None -> dtype sqrt-precision).  The gap
    certificate is *surfaced*: if the kernel exits uncertified, a host-side
    warning reports the residual gap and round count (gated by
    ``config.tv_warn_enabled``) instead of silently returning an
    inaccurate x."""
    from ... import config
    tol = config.prox_inner_tol()
    x, gap, iters = prox_tv1d_pdas(v, lam, tol=tol)
    if config.tv_warn_enabled():
        gtol = tv_gap_tol(v, tol if tol is not None else pdas_default_tol(v.dtype))

        def _warn(g, t, i):
            jax.debug.print(
                "epsilon_tpu: TV-1D prox uncertified: duality gap {g} "
                "(tol {t}) after {i} PDAS rounds", g=g, t=t, i=i)

        jax.lax.cond(gap > gtol, _warn, lambda g, t, i: None,
                     gap, gtol, iters)
    return x


def tv1d_state_init(dim, dtype):
    """Initial PDAS dual for the stateful kernel: z = 0 (cold)."""
    return jnp.zeros((max(dim - 1, 0),), dtype)


def prox_tv1d_registry_warm(v, lam, z_prev):
    """Stateful registry kernel: PDAS warm-started from the previous ADMM
    iteration's dual.  Across consecutive ADMM sweeps the prox input moves
    O(step), so the optimal active set is usually UNCHANGED — warm PDAS
    certifies in 1-3 rounds vs 8-16 cold (the inner-loop analogue of the
    reference reusing glmgen's workspace, ``total_variation_1d.cc:6-25``).
    Returns ``(x, z)`` with ``z`` fed back on the next sweep."""
    from ... import config
    tol = config.prox_inner_tol()
    x, _gap, _iters, z = prox_tv1d_pdas(v, lam, tol=tol, z0=z_prev,
                                        return_dual=True)
    return x, z


def eval_tv1d(x):
    return jnp.sum(jnp.abs(_diff(x)))


def tv1d_exact_numpy(v, lam):
    """Exact O(n) taut-string solution on the host (numpy), equivalent to
    glmgen tf_dp — used as CPU fallback and test oracle cross-check."""
    import numpy as np
    v = np.asarray(v, dtype=np.float64)
    n = v.size
    if n == 0:
        return v.copy()
    if n == 1 or lam <= 0:
        return v.copy()
    # Taut string through the tube [S - lam, S + lam] pinned at both ends,
    # where S is the prefix-sum path of v.  Greedy majorant/minorant walk.
    x = np.empty(n)
    # Condat (2013)-style direct algorithm.
    k = 0          # current index
    k0 = 0         # segment start
    vmin = v[0] - lam
    vmax = v[0] + lam
    umin = lam
    umax = -lam
    kminus = 0
    kplus = 0
    while True:
        if k == n - 1:
            if umin < 0.0:
                x[k0:kminus + 1] = vmin
                k = k0 = kminus = kminus + 1
                vmin = v[k]
                umin = lam
                umax = vmin + lam - vmax
            elif umax > 0.0:
                x[k0:kplus + 1] = vmax
                k = k0 = kplus = kplus + 1
                vmax = v[k]
                umax = -lam
                umin = vmax - lam - vmin
            else:
                x[k0:] = vmin + umin / (k - k0 + 1)
                return x
            if k == n - 1:
                x[k] = vmin + umin
                return x
            continue
        # k < n - 1
        if v[k + 1] + umin < vmin - lam:
            # negative jump: minorant breaks
            x[k0:kminus + 1] = vmin
            k = k0 = kminus = kplus = kminus + 1
            vmin = v[k]
            vmax = v[k] + 2 * lam
            umin = lam
            umax = -lam
        elif v[k + 1] + umax > vmax + lam:
            # positive jump: majorant breaks
            x[k0:kplus + 1] = vmax
            k = k0 = kminus = kplus = kplus + 1
            vmin = v[k] - 2 * lam
            vmax = v[k]
            umin = lam
            umax = -lam
        else:
            k += 1
            umin += v[k] - vmin
            umax += v[k] - vmax
            if umin >= lam:
                vmin += (umin - lam) / (k - k0 + 1)
                umin = lam
                kminus = k
            if umax <= -lam:
                vmax += (umax + lam) / (k - k0 + 1)
                umax = -lam
                kplus = k
