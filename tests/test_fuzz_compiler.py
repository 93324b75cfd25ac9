"""Property-based fuzzing of the full compile->solve pipeline.

Random DCP objectives are generated as (frontend expression, numpy twin)
pairs, compiled through the prox-affine compiler, solved, and checked
against three independent properties:

1. consistency — the objective value the solver reports equals the numpy
   twin evaluated at the returned variable values (catches compiler
   miscompiles of the objective semantics);
2. optimality — the value is <= the best scipy Powell multi-start finds
   (catches wrong-solution miscompiles), within loose tolerance;
3. feasibility — equality constraints hold at the solution.

The reference's closest analogue is ``constant_atoms_test.py`` (fixed atom
table at constants); this goes further by fuzzing random *compositions*
with random affine arguments, the part of the rule set where greedy
pattern-matching bugs hide.
"""

import numpy as np
import pytest
import scipy.optimize

import epsilon_tpu as ep



pytestmark = pytest.mark.fuzz
def _affine(rng, m, n):
    G = rng.randn(m, n) / np.sqrt(n)
    h = rng.randn(m) * 0.5
    return G, h


def _logistic_np(z):
    # stable log(1 + e^z)
    return np.logaddexp(0.0, z)


def _huber_np(z, M):
    a = np.abs(z)
    return np.where(a <= M, z * z, 2 * M * a - M * M)


# each entry: name -> (make(rng, n, x_expr) -> (expr, numpy_fn))
def _atom_pool(rng, n, x, w):
    m = rng.randint(2, n + 2)
    G, h = _affine(rng, m, n)
    Gw = ep._wrap(G)

    def aff(e):
        return Gw * e + h

    def aff_np(v):
        return G @ v + h

    k = int(rng.randint(1, m + 1))
    M = float(0.5 + rng.rand())
    return [
        ("norm1", w * ep.norm1(aff(x)),
         lambda v: w * np.abs(aff_np(v)).sum()),
        ("norm2", w * ep.norm2(aff(x)),
         lambda v: w * np.linalg.norm(aff_np(v))),
        ("norm_inf", w * ep.norm_inf(aff(x)),
         lambda v: w * np.abs(aff_np(v)).max()),
        ("sum_squares", w * ep.sum_squares(aff(x)),
         lambda v: w * (aff_np(v) ** 2).sum()),
        ("log_sum_exp", w * ep.log_sum_exp(aff(x)),
         lambda v: w * scipy.special.logsumexp(aff_np(v))),
        ("max_entries", w * ep.max_entries(aff(x)),
         lambda v: w * aff_np(v).max()),
        ("sum_largest", w * ep.sum_largest(aff(x), k),
         lambda v: w * np.sort(aff_np(v))[::-1][:k].sum()),
        ("huber", w * ep.sum_entries(ep.huber(aff(x), M)),
         lambda v: w * _huber_np(aff_np(v), M).sum()),
        ("sum_exp", w * ep.sum_entries(ep.exp(aff(x))),
         lambda v: w * np.exp(aff_np(v)).sum()),
        ("logistic", w * ep.sum_entries(ep.logistic(aff(x))),
         lambda v: w * _logistic_np(aff_np(v)).sum()),
        ("hinge", w * ep.sum_entries(ep.pos(aff(x))),
         lambda v: w * np.maximum(aff_np(v), 0.0).sum()),
        ("abs", w * ep.sum_entries(ep.abs(aff(x))),
         lambda v: w * np.abs(aff_np(v)).sum()),
    ]


def _gen_problem(seed):
    """Returns (problem, vars, twin(vals_concat), n_total, eq_residual_fn)."""
    rng = np.random.RandomState(seed)
    n = int(rng.randint(3, 7))
    x = ep.Variable(n)

    terms = []
    twins = []
    names = []

    # coercive anchor keeps every combination bounded below
    x0 = rng.randn(n)
    w0 = 0.2 + rng.rand()
    terms.append(w0 * ep.sum_squares(x - x0))
    twins.append(lambda v, w0=w0, x0=x0: w0 * ((v - x0) ** 2).sum())
    names.append("anchor")

    n_extra = rng.randint(1, 4)
    for _ in range(n_extra):
        w = float(0.1 + rng.rand())
        pool = _atom_pool(rng, n, x, w)
        name, expr, twin = pool[rng.randint(len(pool))]
        terms.append(expr)
        twins.append(twin)
        names.append(name)

    # optional linear term
    if rng.rand() < 0.5:
        c = rng.randn(n) * 0.3
        terms.append(ep._wrap(c[None, :]) * x)
        twins.append(lambda v, c=c: float(c @ v))
        names.append("linear")

    obj = terms[0]
    for t in terms[1:]:
        obj = obj + t

    constraints = []
    eq = None
    if rng.rand() < 0.5:
        p = rng.randint(1, max(2, n - 1))
        E = rng.randn(p, n)
        d = E @ rng.randn(n)
        constraints.append(ep._wrap(E) * x == d)
        eq = (E, d)

    prob = ep.Problem(ep.Minimize(obj), constraints)

    def twin_total(v):
        return float(sum(t(v) for t in twins))

    return prob, x, twin_total, n, eq, names


def _scipy_best(twin, n, eq, rng, n_starts=4):
    """Multi-start Powell; equality constraints handled by optimizing in
    x = x_p + N z (nullspace parameterization), so the oracle is exactly
    feasible."""
    if eq is None:
        to_x = lambda z: z
        dim = n
    else:
        E, d = eq
        x_p = np.linalg.lstsq(E, d, rcond=None)[0]
        _, s, Vt = np.linalg.svd(E)
        rank = int((s > 1e-10).sum())
        N = Vt[rank:].T
        dim = N.shape[1]
        to_x = lambda z: x_p + N @ z
        if dim == 0:
            return twin(x_p)

    best = np.inf
    for i in range(n_starts):
        z0 = np.zeros(dim) if i == 0 else rng.randn(dim)
        r = scipy.optimize.minimize(lambda z: twin(to_x(z)), z0,
                                    method="Powell",
                                    options={"maxiter": 20000,
                                             "xtol": 1e-10, "ftol": 1e-12})
        best = min(best, float(r.fun))
    return best


@pytest.mark.parametrize("seed", range(24))
def test_fuzz_compile_solve(seed):
    prob, x, twin, n, eq, names = _gen_problem(seed)
    obj = prob.solve(rel_tol=1e-6, abs_tol=1e-9, max_iterations=40000)
    assert prob.status == "optimal", f"{names}: {prob.status}"

    xv = np.asarray(x.value).ravel()

    # 1. consistency: reported objective == numpy twin at the solution
    tw = twin(xv)
    assert abs(obj - tw) <= 1e-4 * max(1.0, abs(tw)), \
        f"{names}: reported {obj} vs twin {tw}"

    # 2. feasibility
    if eq is not None:
        E, d = eq
        assert np.linalg.norm(E @ xv - d) <= 1e-4 * max(1.0, np.linalg.norm(d))

    # 3. optimality vs independent scipy multi-start
    rng = np.random.RandomState(1000 + seed)
    best = _scipy_best(twin, n, eq, rng)
    assert tw <= best + 1e-3 * max(1.0, abs(best)), \
        f"{names}: ours {tw} vs scipy {best}"
