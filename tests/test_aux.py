"""Auxiliary subsystem tests: serialization round-trip, tree formatting,
errors, timing."""

import numpy as np
import pytest

import epsilon_tpu as ep
from epsilon_tpu.compiler import compile_problem
from epsilon_tpu.error import ExpressionError, ProblemError, SolveError
from epsilon_tpu.frontend import tree_format
from epsilon_tpu.solvers import ProxADMMTwoBlockSolver, SolverParams
from epsilon_tpu.utils import cpu_time, wall_time_usec
from epsilon_tpu.utils.serialization import read_problem, write_problem


def _compiled_lasso(rng):
    m, n = 12, 6
    A = rng.randn(m, n)
    b = rng.randn(m)
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        0.5 * ep.sum_squares(A @ x - b) + 0.3 * ep.norm1(x)))
    return compile_problem(prob.expression_problem())


def test_serialization_roundtrip(rng, tmp_path):
    p = _compiled_lasso(rng)
    path = str(tmp_path / "lasso")
    write_problem(p, path)
    p2 = read_problem(path)
    assert [t.spec.kind for t in p2.terms] == [t.spec.kind for t in p.terms]
    assert p2.var_dims == p.var_dims

    # the restored problem solves to the same solution
    s1 = ProxADMMTwoBlockSolver(p, SolverParams(rel_tol=1e-6, abs_tol=1e-9))
    s2 = ProxADMMTwoBlockSolver(p2, SolverParams(rel_tol=1e-6, abs_tol=1e-9))
    x1 = s1.solve()
    x2 = s2.solve()
    for k in x1.keys():
        np.testing.assert_allclose(np.asarray(x1[k]), np.asarray(x2[k]),
                                   atol=1e-8)


def test_serialization_quantile_params(rng, tmp_path):
    n = 5
    x = ep.Variable(n)
    z = x - rng.randn(n)
    tau = 0.3
    prob = ep.Problem(ep.Minimize(
        ep.sum_entries(ep.max_elemwise(
            ep.mul_elemwise(np.full((n, 1), -tau), z),
            ep.mul_elemwise(np.full((n, 1), 1 - tau), z)))
        + ep.sum_squares(x)))
    p = compile_problem(prob.expression_problem())
    path = str(tmp_path / "quantile")
    write_problem(p, path)
    p2 = read_problem(path)
    qt = [t for t in p2.terms if t.spec.kind == ep.ProxKind.SUM_QUANTILE][0]
    assert qt.spec.scaled_zone_params is not None
    np.testing.assert_allclose(qt.spec.scaled_zone_params["alpha"],
                               np.full(n, 1 - tau))


def test_tree_format(rng):
    x = ep.Variable(4)
    e = ep.sum_squares(rng.randn(3, 4) @ x - rng.randn(3)) + ep.norm1(x)
    txt = tree_format.format_expr(e)
    assert "add" in txt and "norm_p" in txt and "variable" in txt
    flat = tree_format.list_format(e)
    assert flat[0][0] == 0 and len(flat) > 5


def test_errors_pretty_print():
    x = ep.Variable(3)
    err = ExpressionError("bad expr", ep.norm1(x))
    assert "bad expr" in str(err) and "norm_p" in str(err)
    assert issubclass(SolveError, Exception)
    assert "oops" in str(ProblemError("oops"))


def test_timing_helpers():
    t0 = wall_time_usec()
    assert t0 > 0
    assert cpu_time() >= 0.0


def test_solver_status_series(rng):
    p = _compiled_lasso(rng)
    solver = ProxADMMTwoBlockSolver(
        p, SolverParams(rel_tol=1e-5, abs_tol=1e-8, drive="host"))
    solver.solve()
    assert solver.status.series is not None
    assert len(solver.status.series) >= 1
    assert solver.status.timing.solve_usec > 0
    assert "iter=" in solver.status.log_line()


def test_expression_vis_dot(rng, tmp_path):
    from epsilon_tpu.frontend import expression_vis
    x = ep.Variable(3)
    e = ep.norm1(x) + ep.sum_squares(x - rng.randn(3))
    dot = expression_vis.to_dot(e)
    assert dot.startswith("digraph") and "norm_p" in dot
    p = tmp_path / "e.dot"
    expression_vis.write_dot(e, str(p))
    assert p.exists()


def test_benchmark_graphs(tmp_path):
    from epsilon_tpu.problems import benchmark_graph
    results = [dict(name="lasso", time=1.0, objective=2.0),
               dict(name="qp", time=0.5, objective=1.0)]
    p1 = benchmark_graph.plot_results(results, str(tmp_path / "bars.png"))
    p2 = benchmark_graph.plot_scaling([10, 100], [0.1, 0.5],
                                      str(tmp_path / "scale.png"))
    import os
    assert os.path.exists(p1) and os.path.exists(p2)


def test_profile_trace_smoke(tmp_path):
    import jax.numpy as jnp
    from epsilon_tpu.utils import profile_trace
    with profile_trace(str(tmp_path / "trace")):
        (jnp.ones(4) * 2).block_until_ready()
