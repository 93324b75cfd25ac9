"""Term-sharded two-block ADMM over a device mesh.

The two-block x-update is embarrassingly parallel over prox TERMS
(``prox_admm_two_block.cc:102-107``).  The consensus solver in parallel/
shards homogeneous scenario blocks; this mode shards *heterogeneous* terms:
each device executes its bucket of term proxes (lax.switch on the device
index inside shard_map) and a psum over the mesh axis combines the
contributions.  Tests run on the virtual 8-device CPU mesh (conftest).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from epsilon_tpu.ir import (AffineOperator, Cone, ConeConstraint,
                            ProxFunctionSpec, ProxKind, ProxProblem, ProxTerm,
                            arg_key)
from epsilon_tpu.ops import linop
from epsilon_tpu.ops.block import BlockMatrix, BlockVector
from epsilon_tpu.solvers import ProxADMMTwoBlockSolver, SolverParams

from test_solvers import lasso_oracle, make_lasso_problem, _lasso_objective


def term_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("terms",))


def make_multi_term_problem(rng, n=12, n_groups=4):
    """min sum_square(A x - b) + sum_g lam_g ||x_g||_2 over groups +
    norm1(y)  s.t. x = y — a heterogeneous mix of KKT, vector, and
    elementwise terms sharing consensus variables."""
    m = 3 * n
    A = rng.randn(m, n)
    x_true = rng.randn(n) * (rng.rand(n) < 0.5)
    b = A @ x_true + 0.05 * rng.randn(m)
    gs = n // n_groups

    terms = [
        ProxTerm(
            spec=ProxFunctionSpec(kind=ProxKind.SUM_SQUARE, alpha=0.5),
            H=AffineOperator(
                BlockMatrix({(arg_key(0), "x"): linop.dense(A)}),
                BlockVector({arg_key(0): jnp.asarray(-b)}))),
        ProxTerm(
            spec=ProxFunctionSpec(kind=ProxKind.NORM_1, alpha=0.2),
            H=AffineOperator(
                BlockMatrix({(arg_key(0), "y"): linop.identity(n)}),
                BlockVector())),
    ]
    for g in range(n_groups):
        terms.append(ProxTerm(
            spec=ProxFunctionSpec(kind=ProxKind.NORM_2, alpha=0.1),
            H=AffineOperator(
                BlockMatrix({(arg_key(0), f"w{g}"): linop.identity(gs)}),
                BlockVector())))
    cons = [ConeConstraint(
        cone=Cone.ZERO,
        op=AffineOperator(
            BlockMatrix({("c", "x"): linop.identity(n),
                         ("c", "y"): linop.scalar(-1.0, n)}),
            BlockVector()))]
    for g in range(n_groups):
        sel = np.zeros((gs, n))
        sel[np.arange(gs), g * gs + np.arange(gs)] = 1.0
        cons.append(ConeConstraint(
            cone=Cone.ZERO,
            op=AffineOperator(
                BlockMatrix({(f"cw{g}", "x"): linop.dense(sel),
                             (f"cw{g}", f"w{g}"): linop.scalar(-1.0, gs)}),
                BlockVector())))
    var_dims = {"x": n, "y": n}
    var_shapes = {"x": (n, 1), "y": (n, 1)}
    for g in range(n_groups):
        var_dims[f"w{g}"] = gs
        var_shapes[f"w{g}"] = (gs, 1)
    return ProxProblem(terms=terms, constraints=cons,
                       var_dims=var_dims, var_shapes=var_shapes)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_matches_sequential(rng, n_dev):
    prob = make_multi_term_problem(rng)
    params = dict(rel_tol=1e-6, abs_tol=1e-8, max_iterations=4000)

    seq = ProxADMMTwoBlockSolver(
        make_multi_term_problem(np.random.RandomState(0)),
        SolverParams(**params))
    x_seq = seq.solve()

    shd = ProxADMMTwoBlockSolver(
        prob, SolverParams(mesh=term_mesh(n_dev), **params))
    x_shd = shd.solve()

    assert shd.buckets is not None and len(shd.buckets) == n_dev
    assert sorted(i for b in shd.buckets for i in b) == list(
        range(len(prob.terms)))
    np.testing.assert_allclose(np.asarray(x_shd["x"]),
                               np.asarray(x_seq["x"]), rtol=1e-5, atol=1e-7)
    assert shd.status.num_iterations == seq.status.num_iterations


@pytest.mark.parametrize("drive", ["device", "host"])
def test_sharded_lasso_oracle(rng, drive):
    m, n = 30, 15
    A = rng.randn(m, n)
    b = A @ (rng.randn(n) * (rng.rand(n) < 0.3)) + 0.1 * rng.randn(m)
    lam = 0.5
    prob = make_lasso_problem(A, b, lam)
    solver = ProxADMMTwoBlockSolver(
        prob, SolverParams(rel_tol=1e-5, abs_tol=1e-7, max_iterations=5000,
                           mesh=term_mesh(2), drive=drive))
    sol = solver.solve()
    x = np.asarray(sol["x"])
    x_o = lasso_oracle(A, b, lam)
    obj_ours = _lasso_objective(A, b, lam, x)
    obj_oracle = _lasso_objective(A, b, lam, x_o)
    assert obj_ours <= obj_oracle + 1e-3 * abs(obj_oracle) + 1e-5


def test_sharded_more_devices_than_terms(rng):
    # 8 devices, 2 terms: empty buckets must contribute zeros
    m, n = 20, 10
    A = rng.randn(m, n)
    b = rng.randn(m)
    prob = make_lasso_problem(A, b, 0.3)
    solver = ProxADMMTwoBlockSolver(
        prob, SolverParams(rel_tol=1e-5, abs_tol=1e-7, max_iterations=5000,
                           mesh=term_mesh(8)))
    sol = solver.solve()
    x_o = lasso_oracle(A, b, 0.3)
    obj = _lasso_objective(A, b, 0.3, np.asarray(sol["x"]))
    obj_o = _lasso_objective(A, b, 0.3, x_o)
    assert obj <= obj_o + 1e-3 * abs(obj_o) + 1e-5


def test_sharded_adaptive_rho(rng):
    # term sharding composes with adaptive rho (rho replicated in state)
    m, n = 30, 15
    A = 20.0 * rng.randn(m, n)
    b = A @ (rng.randn(n) * (rng.rand(n) < 0.4)) + 0.1 * rng.randn(m)
    lam = 4.0
    prob = make_lasso_problem(A, b, lam)
    solver = ProxADMMTwoBlockSolver(
        prob, SolverParams(rel_tol=1e-4, abs_tol=1e-7, max_iterations=20000,
                           mesh=term_mesh(2), adaptive_rho=True))
    sol = solver.solve()
    x_o = lasso_oracle(A, b, lam)
    obj = _lasso_objective(A, b, lam, np.asarray(sol["x"]))
    obj_o = _lasso_objective(A, b, lam, x_o)
    assert obj <= obj_o + 1e-2 * abs(obj_o) + 1e-4


def test_nblock_rejects_mesh(rng):
    from epsilon_tpu.solvers import ProxADMMSolver
    prob = make_lasso_problem(rng.randn(10, 5), rng.randn(10), 0.1)
    with pytest.raises(ValueError, match="mesh"):
        ProxADMMSolver(prob, SolverParams(mesh=term_mesh(2)))


def test_bucket_balancing(rng):
    # LPT partition: every bucket non-trivially loaded when terms >> devices
    prob = make_multi_term_problem(rng, n=16, n_groups=8)
    solver = ProxADMMTwoBlockSolver(
        prob, SolverParams(mesh=term_mesh(4), max_iterations=10))
    sizes = [len(b) for b in solver.buckets]
    assert sum(sizes) == len(prob.terms)
    assert all(s >= 1 for s in sizes)


def test_nblock_mesh_rewrites_to_sharded_two_block(rng):
    """The N-block Gauss-Seidel sweep cannot shard over terms (each prox
    consumes the previous term's update, prox_admm.cc:141-148), so
    solver="prox_admm" + mesh must rewrite to the equivalent two-block
    consensus splitting with term sharding — and land on the same solution
    the sequential N-block solver finds (VERDICT r2 item 6)."""
    from epsilon_tpu.solvers import create_solver
    from epsilon_tpu.solvers.admm import ProxADMMSolver

    problem = make_multi_term_problem(rng)
    common = dict(rel_tol=1e-8, abs_tol=1e-10, max_iterations=6000,
                  epoch_iterations=25)

    seq = create_solver(problem, SolverParams(solver="prox_admm", **common))
    assert isinstance(seq, ProxADMMSolver)
    x_seq = seq.solve()

    sharded = create_solver(problem, SolverParams(
        solver="prox_admm", mesh=term_mesh(4), **common))
    assert isinstance(sharded, ProxADMMTwoBlockSolver)
    assert sharded.buckets is not None
    x_sh = sharded.solve()

    for k in x_seq.data:
        np.testing.assert_allclose(np.asarray(x_sh[k]), np.asarray(x_seq[k]),
                                   atol=1e-5)


def make_hetero_16term_problem(rng, n=16):
    """16 mixed-kernel terms with per-term dense data, in the separated
    form the compiler guarantees (every variable in exactly ONE term;
    copies tied to the consensus variable by identity ZERO constraints).
    The SUM_SQUARE blocks all have DIFFERENT heights, so the scenario-
    stacking isomorphism template cannot match — this is the genuinely
    heterogeneous bucket path."""
    terms = [ProxTerm(
        spec=ProxFunctionSpec(kind=ProxKind.NORM_1, alpha=0.02),
        H=AffineOperator(
            BlockMatrix({(arg_key(0), "x"): linop.identity(n)}),
            BlockVector()))]
    cons = []
    var_dims = {"x": n}
    var_shapes = {"x": (n, 1)}
    for i in range(14):
        mi = 20 + 2 * i
        A = rng.randn(mi, n) / np.sqrt(mi)
        b = A @ (rng.randn(n) * (rng.rand(n) < 0.5)) + 0.05 * rng.randn(mi)
        v = f"x{i}"
        var_dims[v] = n
        var_shapes[v] = (n, 1)
        terms.append(ProxTerm(
            spec=ProxFunctionSpec(kind=ProxKind.SUM_SQUARE, alpha=0.5),
            H=AffineOperator(
                BlockMatrix({(arg_key(0), v): linop.dense(A)}),
                # numpy, NOT jnp: offsets must flow through _to_device so
                # they lift as arguments (update_problem refresh) instead
                # of baking into the jit as constants
                BlockVector({arg_key(0): -b}))))
        cons.append(ConeConstraint(
            cone=Cone.ZERO,
            op=AffineOperator(
                BlockMatrix({(f"c{i}", v): linop.identity(n),
                             (f"c{i}", "x"): linop.scalar(-1.0, n)}),
                BlockVector())))
    var_dims["y"] = n
    var_shapes["y"] = (n, 1)
    terms.append(ProxTerm(
        spec=ProxFunctionSpec(kind=ProxKind.NORM_2, alpha=0.02),
        H=AffineOperator(
            BlockMatrix({(arg_key(0), "y"): linop.identity(n)}),
            BlockVector())))
    cons.append(ConeConstraint(
        cone=Cone.ZERO,
        op=AffineOperator(
            BlockMatrix({("cy", "y"): linop.identity(n),
                         ("cy", "x"): linop.scalar(-1.0, n)}),
            BlockVector())))
    return ProxProblem(terms=terms, constraints=cons,
                       var_dims=var_dims, var_shapes=var_shapes)


def test_bucket_heaps_shard_memory(rng):
    """Bucket heaps realize MEMORY sharding for heterogeneous terms: each
    device's heap row holds ~1/n_dev of the term data, and the replicated
    outer constants no longer carry any term's payload (SURVEY 2.4,
    solver_params.proto:42-56 realized for mixed kernels)."""
    prob = make_hetero_16term_problem(rng)
    params = dict(rel_tol=1e-6, abs_tol=1e-8, max_iterations=4000)

    seq = ProxADMMTwoBlockSolver(
        make_hetero_16term_problem(np.random.RandomState(0)),
        SolverParams(**params))
    x_seq = seq.solve()

    shd = ProxADMMTwoBlockSolver(
        prob, SolverParams(mesh=term_mesh(8), **params))
    x_shd = shd.solve()
    from epsilon_tpu.solvers.status import SolverState
    assert seq.status.state == SolverState.OPTIMAL
    assert shd.status.state == SolverState.OPTIMAL
    np.testing.assert_allclose(np.asarray(x_shd["x"]),
                               np.asarray(x_seq["x"]), rtol=1e-5, atol=1e-7)

    # heaps exist and are sharded along the mesh axis
    assert shd._bucket_lifters is not None and shd._heap_args
    term_bytes = sum(np.asarray(a).nbytes
                     for lf in shd._bucket_lifters for a in lf.arrays)
    for H in shd._heap_args.values():
        shards = H.addressable_shards
        assert len(shards) == 8
        per_dev = [s.data.nbytes for s in shards]
        assert max(per_dev) <= H.nbytes / 8 + 1  # evenly split rows
    heap_bytes = sum(H.nbytes for H in shd._heap_args.values())
    # padded heap total stays near the true data total (balanced buckets)
    assert heap_bytes <= 2.0 * term_bytes

    # the outer (replicated) lifted constants no longer carry term data:
    # they must be much smaller than the per-term payload sum
    _run, const_args = shd._compiled
    outer_bytes = sum(np.asarray(a).nbytes for a in const_args)
    assert outer_bytes < 0.35 * term_bytes, (outer_bytes, term_bytes)


def test_bucket_heaps_update_problem(rng):
    """update_problem refreshes heap data without recompiling."""
    prob = make_hetero_16term_problem(rng)
    params = SolverParams(rel_tol=1e-6, abs_tol=1e-8, max_iterations=4000)
    solver = ProxADMMTwoBlockSolver(prob, SolverParams(
        rel_tol=1e-6, abs_tol=1e-8, max_iterations=4000, mesh=term_mesh(8)))
    x1 = solver.solve()
    run1 = solver._compiled[0]

    prob2 = make_hetero_16term_problem(np.random.RandomState(7))
    solver.update_problem(prob2)
    x2 = solver.solve()
    assert solver._compiled[0] is run1  # no recompile

    ref = ProxADMMTwoBlockSolver(
        make_hetero_16term_problem(np.random.RandomState(7)),
        SolverParams(rel_tol=1e-6, abs_tol=1e-8, max_iterations=4000))
    x_ref = ref.solve()
    from epsilon_tpu.solvers.status import SolverState
    assert solver.status.state == SolverState.OPTIMAL
    assert ref.status.state == SolverState.OPTIMAL
    np.testing.assert_allclose(np.asarray(x2["x"]), np.asarray(x_ref["x"]),
                               rtol=1e-5, atol=1e-7)
