"""Objective evaluation for prox-affine problems (diagnostics/benchmarks).

The reference never evaluates objectives inside the solver (tests compare
against SCS objectives externally); here we expose it as a first-class
traceable function for benchmarking and convergence monitoring.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ir import ProxKind, ProxProblem, ProxTerm, arg_key
from ..ops import linop
from ..ops.block import BlockVector
from ..ops.prox.registry import get_kernel


def term_objective(term: ProxTerm, x: BlockVector):
    """alpha * f(H(x)) for one prox term; indicators contribute 0."""
    spec = term.spec
    u = term.H.A.apply(x) + term.H.b.to_device()
    kind = spec.kind
    if kind == ProxKind.CONSTANT:
        # constant objective addend = alpha * offset (add_constant_prox
        # terms carry no offset and contribute 0)
        total = jnp.asarray(0.0)
        for key, vec in term.H.b.items():
            total = total + jnp.sum(jnp.asarray(vec))
        return spec.alpha * total
    if kind in (ProxKind.ZERO, ProxKind.NON_NEGATIVE,
                ProxKind.SEMIDEFINITE, ProxKind.SECOND_ORDER_CONE):
        return jnp.asarray(0.0)
    if spec.epigraph:
        # indicator I(f(x) <= t): 0 on the feasible set
        return jnp.asarray(0.0)
    if kind == ProxKind.AFFINE:
        total = jnp.asarray(0.0)
        for key in u.keys():
            total = total + jnp.sum(u[key])
        return spec.alpha * total
    if kind == ProxKind.SUM_SQUARE:
        total = jnp.asarray(0.0)
        for key in u.keys():
            total = total + jnp.sum(u[key] ** 2)
        return spec.alpha * total

    entry = get_kernel(kind)
    p = dict(spec.scaled_zone_params or {})
    if spec.k is not None:
        p["k"] = spec.k
    val = u.get(arg_key(0))
    if entry.matrix:
        m, n = spec.arg_sizes[0]
        return spec.alpha * entry.feval(linop.jmat(val, (m, n)), **p)
    if entry.nargs == 2:
        return spec.alpha * entry.feval((val, u.get(arg_key(1))), **p)
    if spec.axis is not None:
        import jax
        m, n = spec.arg_sizes[0]
        V = linop.jmat(val, (m, n))
        kern = lambda row: entry.feval(row, **p)
        if spec.axis == 0:
            vals = jax.vmap(kern, in_axes=1)(V)
        else:
            vals = jax.vmap(kern, in_axes=0)(V)
        return spec.alpha * jnp.sum(vals)
    return spec.alpha * entry.feval(val, **p)


def problem_objective(problem: ProxProblem, x: BlockVector):
    total = jnp.asarray(0.0)
    for term in problem.terms:
        total = total + term_objective(term, x)
    return total
