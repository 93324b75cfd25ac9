"""Independent numerical oracles for prox kernels.

The reference validates every kernel against CVXPY/ECOS solving
``min lam*f(x) + 1/2||x - v||^2`` (``prox_test.py:250-287``).  CVXPY is not
available here, so we use two *independent* characterizations:

1. Variational inequality (exact for convex f):
     x* = prox_{lam f}(v)  iff  for ALL z:  <v - x*, z - x*> <= lam*(f(z) - f(x*))
     p* = proj_C(w)        iff  for ALL feasible z:  <w - p*, z - p*> <= 0
   Sampling many z (random, structured, near x*) makes this a strong
   falsifier with zero shared code with the kernels.

2. scipy.optimize comparison: the prox objective is minimized from several
   starts (Powell for nonsmooth, BFGS/L-BFGS-B for smooth); our kernel's
   objective value must match or beat the best scipy found.
"""

import numpy as np
import scipy.optimize


def prox_objective(f, v, lam):
    v = np.asarray(v)

    def g(x):
        x = np.asarray(x)
        return float(f(x) + np.sum((x - v) ** 2 / (2.0 * lam)))

    return g


def check_prox_vi(f, v, lam, x, sampler=None, n_samples=300, tol=1e-6,
                  rng=None):
    """Variational-inequality check for x ~= prox_{lam f}(v).

    ``lam`` may be scalar or elementwise.  ``sampler()`` should return
    candidate z points in the domain of f; defaults to gaussian perturbations
    of x and v.
    """
    rng = rng or np.random.RandomState(42)
    v = np.asarray(v, dtype=float)
    x = np.asarray(x, dtype=float)
    fx = f(x)
    assert np.isfinite(fx), f"f(x*) not finite: {fx}"
    lhs_vec = (v - x) / lam  # elementwise or scalar lam both fine

    worst = -np.inf
    for i in range(n_samples):
        if sampler is not None:
            z = sampler(rng)
        else:
            scale = 10.0 ** rng.uniform(-3, 1)
            base = x if rng.rand() < 0.7 else v
            z = base + scale * rng.randn(*x.shape)
        fz = f(np.asarray(z, dtype=float))
        if not np.isfinite(fz):
            continue
        viol = float(np.vdot(lhs_vec, z - x) - (fz - fx))
        worst = max(worst, viol)
    assert worst <= tol, f"VI violated by {worst:.3e}"


def check_projection_vi(feasible_sampler, w, p, n_samples=300, tol=1e-6,
                        rng=None):
    """VI check for p ~= proj_C(w); w and p are tuples of arrays."""
    rng = rng or np.random.RandomState(43)
    w_flat = np.concatenate([np.ravel(a) for a in w])
    p_flat = np.concatenate([np.ravel(a) for a in p])
    worst = -np.inf
    for i in range(n_samples):
        z = feasible_sampler(rng)
        z_flat = np.concatenate([np.ravel(a) for a in z])
        viol = float(np.vdot(w_flat - p_flat, z_flat - p_flat))
        worst = max(worst, viol)
    assert worst <= tol, f"projection VI violated by {worst:.3e}"


def check_prox_scipy(f, v, lam, x, bounds=None, smooth=False, tol=1e-7,
                     rng=None, starts=4):
    """Our kernel's prox objective must match-or-beat scipy's best."""
    rng = rng or np.random.RandomState(44)
    g = prox_objective(f, v, lam)
    v = np.asarray(v, dtype=float)
    x = np.asarray(x, dtype=float)
    inits = [x, v] + [v + rng.randn(*v.shape) for _ in range(starts)]
    best = np.inf
    for x0 in inits:
        if bounds is not None:
            x0 = np.clip(x0, [b[0] + 1e-9 if b[0] is not None else -np.inf
                              for b in bounds],
                         [b[1] - 1e-9 if b[1] is not None else np.inf
                          for b in bounds])
        try:
            if smooth:
                res = scipy.optimize.minimize(
                    g, x0, method="L-BFGS-B", bounds=bounds,
                    options={"maxiter": 2000, "ftol": 1e-15, "gtol": 1e-12})
            else:
                res = scipy.optimize.minimize(
                    g, x0, method="Powell", bounds=bounds,
                    options={"maxiter": 20000, "xtol": 1e-12, "ftol": 1e-14})
            if np.isfinite(res.fun):
                best = min(best, res.fun)
        except Exception:
            continue
    ours = g(x)
    assert ours <= best + tol * (1.0 + abs(best)), (
        f"kernel objective {ours:.12g} worse than scipy {best:.12g}")


def check_epigraph(f, v, s, x, t, feasible_sampler=None, tol=1e-6, rng=None,
                   feas_tol=1e-7):
    """Check (x, t) ~= projection of (v, s) onto {(z, u): f(z) <= u}."""
    rng = rng or np.random.RandomState(45)
    x = np.asarray(x, dtype=float)
    fx = f(x)
    assert fx <= t + feas_tol * (1 + abs(t)), f"infeasible: f(x)={fx} > t={t}"

    if feasible_sampler is None:
        def feasible_sampler(rng):
            scale = 10.0 ** rng.uniform(-3, 1)
            z = (x if rng.rand() < 0.7 else np.asarray(v)) + scale * rng.randn(*x.shape)
            fz = f(z)
            if not np.isfinite(fz):
                z = x
                fz = f(x)
            u = fz + abs(rng.randn()) * scale
            return z, u

    check_projection_vi(feasible_sampler, (np.asarray(v), np.asarray([s])),
                        (x, np.asarray([t])),
                        rng=rng, tol=tol)
