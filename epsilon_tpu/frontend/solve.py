"""Top-level solve / eval_prox entry points.

Mirrors ``python/epopt/cvxpy_solver.py:64-104`` (compile -> solve ->
write-back, with a compiled-problem cache for warm starts and a single-prox
fast path) and ``python/epopt/prox.py`` (``eval_prox`` as the kernel test
hook, ``solvemodule.cc:189-242``).
"""

from __future__ import annotations

import logging
import time
import weakref
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from .. import config
from ..compiler import compiler, text_format
from ..ir import ProxProblem, arg_key
from ..ops import linop
from ..ops.block import BlockMatrix, BlockVector
from ..solvers import SolverParams, SolverState, create_solver, problem_objective
from ..solvers.status import SolverStatus
from . import api
from . import expression as ex

logger = logging.getLogger("epsilon_tpu")

# Compiled-problem cache for warm starts (cvxpy_solver.py:20,70-76).  The
# reference keys by id(problem), which can silently alias a new Problem onto
# a dead one's compiled solver after GC reuses the id; a WeakKeyDictionary
# keys by the live object itself and drops the entry with it.
_PROBLEM_CACHE: "weakref.WeakKeyDictionary[api.Problem, tuple]" = \
    weakref.WeakKeyDictionary()


def _has_parameters(problem: api.Problem) -> bool:
    found = [False]

    def visit(e):
        if e.attr.get("is_parameter"):
            found[0] = True
        for a in e.args:
            visit(a)

    visit(problem.objective.expr)
    for c in problem.constraints:
        visit(c)
    return found[0]


def _set_solution(problem: api.Problem, values: BlockVector,
                  prox_problem: ProxProblem):
    var_objs: Dict[str, api.Variable] = {}
    api.expr_var_objects(problem.objective.expr, var_objs)
    for c in problem.constraints:
        api.expr_var_objects(c, var_objs)
    for vid, var in var_objs.items():
        if vid in values:
            val = np.asarray(values[vid])
            var.value = linop.mat(val, var.size)
        else:
            # variable eliminated (e.g. only in separated copies) — gather
            # from any copy
            for key in values.keys():
                if key.startswith(f"separate:{vid}:"):
                    var.value = linop.mat(np.asarray(values[key]), var.size)
                    break


def solve(problem: api.Problem, verbose: bool = False, **kwargs) -> float:
    """Compile + solve; writes variable values; returns objective value."""
    params = SolverParams(**{**kwargs, "verbose": verbose})

    t0 = time.time()
    key = problem
    cached = _PROBLEM_CACHE.get(key) if params.warm_start else None
    if cached is not None:
        prox_problem, solver = cached
        solver.params = params
        if _has_parameters(problem):
            # Parameter values may have changed: re-fold the (identically
            # structured) problem and swap the lifted constants — no
            # recompilation (solver.update_problem).
            prox_problem = compiler.compile_problem(
                problem.expression_problem(),
                use_epigraph=params.use_epigraph)
            solver.update_problem(prox_problem)
            _PROBLEM_CACHE[key] = (prox_problem, solver)
    else:
        prox_problem = compiler.compile_problem(
            problem.expression_problem(), use_epigraph=params.use_epigraph)
        if len(prox_problem.terms) == 1 and not prox_problem.constraints:
            # single-prox fast path (cvxpy_solver.py:79-88): one prox term
            # and nothing to split on — one prox evaluation at huge lambda
            # IS the minimizer, no ADMM loop needed
            if verbose:
                logger.info("Epsilon compile time: %.4fs", time.time() - t0)
                logger.info("%s", text_format.format_problem(prox_problem))
            return _solve_single_prox(problem, prox_problem)
        solver = create_solver(prox_problem, params)
        if params.warm_start:
            _PROBLEM_CACHE[key] = (prox_problem, solver)
    compile_time = time.time() - t0
    if verbose:
        logger.info("Epsilon compile time: %.4fs", compile_time)
        logger.info("%s", text_format.format_problem(prox_problem))

    t0 = time.time()
    values = solver.solve()
    solve_time = time.time() - t0
    if verbose:
        logger.info("Epsilon solve time: %.4fs", solve_time)

    _set_solution(problem, values, prox_problem)
    problem.solver_status = solver.status
    problem.status = ("optimal" if solver.status.state == SolverState.OPTIMAL
                      else "max_iterations")
    obj = float(problem_objective(prox_problem, values))
    return obj


def _solve_single_prox(problem: api.Problem,
                       prox_problem: ProxProblem) -> float:
    """Minimize a lone prox term by one prox evaluation at huge lambda
    (``cvxpy_solver.py:79-88`` uses lam=1e12): prox_{lam*f}(0) -> argmin f
    with bias O(||x*||^2 / lam).  Lambda is dtype-aware — 1e12 is fine in
    f64, but in f32 1/sqrt(lam) underflows precision, so use 1e6."""
    from ..ops.prox.operator import create_prox_operator
    from ..ir import AffineOperator

    config.set_prox_inner_tol(None)
    term = prox_problem.terms[0]
    dtype = config.default_dtype()
    lam = 1e12 if dtype == jnp.float64 else 1e6
    inv_sqrt_lam = 1.0 / np.sqrt(lam)
    t0 = time.time()
    A = BlockMatrix()
    v = BlockVector()
    tvars = sorted({c for (_, c) in term.H.A.blocks})
    for i, vid in enumerate(tvars):
        n = prox_problem.var_dims[vid]
        A.insert(f"c{i}", vid, linop.scalar(inv_sqrt_lam, n))
        v[f"c{i}"] = jnp.zeros(n, dtype=dtype)
    op = create_prox_operator(term.spec, term.H,
                              AffineOperator(A, BlockVector()))
    x = op.apply(v)

    _set_solution(problem, x, prox_problem)
    status = SolverStatus()
    status.state = SolverState.OPTIMAL
    status.num_iterations = 0
    status.timing.solve_usec = int((time.time() - t0) * 1e6)
    status.timing.total_usec = status.timing.solve_usec
    problem.solver_status = status
    problem.status = "optimal"
    return float(problem_objective(prox_problem, x))


def eval_prox(f, v_map: Dict[api.Variable, np.ndarray], lam: float = 1.0,
              expected_kind=None, epigraph: Optional[bool] = None):
    """Evaluate a single proximal operator: for each variable x with value
    v, compute argmin lam*f(x) + 1/2 sum ||x - v||^2 and write it back
    (``prox.py:16-51``, ``solvemodule.cc:189-242``)."""
    from ..ops.prox.operator import create_prox_operator
    from ..ir import AffineOperator
    from .. import config

    # standalone prox evaluations certify at full (dtype sqrt-precision)
    # accuracy, not whatever inner tol a previous solve left behind
    config.set_prox_inner_tol(None)

    problem = ex.Problem(objective=api._wrap(f), constraints=[])
    prox_problem = compiler.compile_problem(problem)
    if len(prox_problem.terms) != 1:
        raise ValueError(
            f"prox does not have a single term:\n"
            f"{text_format.format_problem(prox_problem)}")
    if prox_problem.constraints:
        raise ValueError("prox has constraints")
    term = prox_problem.terms[0]
    if expected_kind is not None and (
            term.spec.kind != expected_kind or
            (epigraph is not None and term.spec.epigraph != bool(epigraph))):
        raise ValueError(
            f"prox compiled to {term.spec.kind} (epigraph="
            f"{term.spec.epigraph}), expected {expected_kind}")

    inv_sqrt_lam = 1.0 / np.sqrt(lam)
    A = BlockMatrix()
    v = BlockVector()
    tvars = sorted({c for (_, c) in term.H.A.blocks})
    var_objs: Dict[str, api.Variable] = {}
    api.expr_var_objects(problem.objective, var_objs)
    for i, vid in enumerate(tvars):
        n = prox_problem.var_dims[vid]
        A.insert(f"c{i}", vid, linop.scalar(inv_sqrt_lam, n))
    op = create_prox_operator(term.spec, term.H,
                              AffineOperator(A, BlockVector()))
    for i, vid in enumerate(tvars):
        var = var_objs.get(vid)
        n = prox_problem.var_dims[vid]
        if var is not None and var in v_map:
            val = linop.vec(np.asarray(v_map[var], dtype=float))
        else:
            val = np.zeros(n)
        v[f"c{i}"] = jnp.asarray(inv_sqrt_lam * val)

    x = op.apply(v)
    for vid, var in var_objs.items():
        if vid in x:
            var.value = linop.mat(np.asarray(x[vid]), var.size)
    return {vid: np.asarray(val) for vid, val in x.items()}
