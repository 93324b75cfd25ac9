"""Benchmark driver.

Default (driver contract): the flagship lasso workload, median-of-5 with
min/max spread, printed as ONE JSON line
``{"metric", "value", "unit", "vs_baseline", "spread"}``.

``python bench.py --suite``: the full on-TPU benchmark table — flagship
lasso, 1M-point certified TV, sparse logistic regression, MNIST-RFF at
reference scale, consensus lasso, Newton-vs-bisection epigraph microbench —
written to BENCH_SUITE.json (one dict per row, each with dispersion), with
the flagship line still printed last.

Baselines: the reference's own published numbers where they exist
(``docs/notebooks/mnist.rst:130-140,238-243``; BASELINE.md) and a
numpy/BLAS reimplementation of the reference's CPU iteration otherwise
(``prox_admm_two_block.cc:99-123``); ``vs_baseline`` > 1 means the TPU
path is faster.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def _median_spread(times):
    ts = sorted(times)
    return ts[len(ts) // 2], ts[0], ts[-1]


# ---------------------------------------------------------------------------
# flagship lasso (BASELINE config[0])
# ---------------------------------------------------------------------------

def _workload(m=2000, n=1000, seed=0):
    rng = np.random.RandomState(seed)
    A = rng.randn(m, n) / np.sqrt(m)
    x0 = rng.randn(n) * (rng.rand(n) < 0.1)
    b = A @ x0 + 0.01 * rng.randn(m)
    lam = 0.1 * np.abs(A.T @ b).max()
    return A, b, lam


def bench_lasso_tpu(A, b, lam, iters=2000, reps=5):
    import epsilon_tpu as ep

    n = A.shape[1]
    x = ep.Variable(n)
    prob = ep.Problem(ep.Minimize(
        0.5 * ep.sum_squares(ep._wrap(A) * x - b) + lam * ep.norm1(x)))

    common = dict(rel_tol=0.0, abs_tol=0.0, epoch_iterations=100,
                  max_iterations=iters, warm_start=True)
    prob.solve(**common)  # compile + warm up
    ips = []
    for _ in range(reps):
        t0 = time.time()
        prob.solve(**common)
        ips.append(prob.solver_status.num_iterations / (time.time() - t0))
    med, lo, hi = _median_spread(ips)
    return med, lo, hi


def bench_lasso_cpu_reference(A, b, lam, iters=200):
    """Reference-equivalent CPU iteration (numpy/BLAS, float64): the exact
    two-block sweep the reference runs (``prox_admm_two_block.cc:99-123``)."""
    import scipy.linalg
    m, n = A.shape
    AtA = A.T @ A
    Atb = A.T @ b
    F = scipy.linalg.cho_factor(AtA + np.eye(n))
    x1 = x2 = z = u1 = u2 = np.zeros(n)
    t0 = time.time()
    for _ in range(iters):
        x1 = scipy.linalg.cho_solve(F, Atb + z - u1)
        v = z - u2
        x2 = np.sign(v) * np.maximum(np.abs(v) - lam, 0)
        z = 0.5 * (x1 + u1 + x2 + u2)
        u1 = u1 + x1 - z
        u2 = u2 + x2 - z
        np.linalg.norm(x1 - z)  # residual check cost
    return iters / (time.time() - t0)


def row_lasso(reps=5):
    A, b, lam = _workload()
    cpu_ips = bench_lasso_cpu_reference(A, b, lam)
    med, lo, hi = bench_lasso_tpu(A, b, lam, reps=reps)
    return {
        "metric": "admm_iterations_per_sec_lasso_2000x1000",
        "value": round(med, 2),
        "unit": "iter/s",
        "vs_baseline": round(med / cpu_ips, 3),
        "spread": {"min": round(lo, 2), "max": round(hi, 2), "reps": reps},
    }


# ---------------------------------------------------------------------------
# 1M-point certified TV (BASELINE config[2];
# reference kernel: glmgen tf_dp, total_variation_1d.cc:6-25)
# ---------------------------------------------------------------------------

def row_tv_1m(reps=5):
    import jax
    import jax.numpy as jnp
    from epsilon_tpu.ops.prox import tv1d

    n = 1_000_000
    rng = np.random.RandomState(0)
    v = (np.cumsum((rng.rand(n) < 0.002) * rng.randn(n) * 3)
         + 0.3 * rng.randn(n))
    lam = 1.0
    vj = jnp.asarray(v, jnp.float32)
    pd = jax.jit(lambda v, lam: tv1d.prox_tv1d_pdas(v, lam))
    x, gap, iters = pd(vj, lam)
    x0 = np.asarray(x)  # force
    ts = []
    for _ in range(reps):
        t0 = time.time()
        x, gap, iters = pd(vj, lam)
        np.asarray(x)
        ts.append(time.time() - t0)
    med, lo, hi = _median_spread(ts)
    # baseline: the exact sequential host algorithm (tf_dp-equivalent)
    t0 = time.time()
    x_exact = tv1d.tv1d_exact_numpy(v, lam)
    t_host = time.time() - t0
    err = float(np.max(np.abs(x0.astype(np.float64) - x_exact)))
    return {
        "metric": "tv1d_certified_solve_1M",
        "value": round(med, 4),
        "unit": "s",
        "vs_baseline": round(t_host / med, 2),
        "spread": {"min": round(lo, 4), "max": round(hi, 4), "reps": reps},
        "pdas_rounds": int(iters),
        "gap": float(gap),
        "max_err_vs_exact": err,
        "host_taut_string_s": round(t_host, 3),
    }


# ---------------------------------------------------------------------------
# sparse logistic regression (reference suite size, benchmark.py:26-54)
# ---------------------------------------------------------------------------

def row_sparse_logreg(reps=3):
    from epsilon_tpu.problems import logreg_l1
    np.random.seed(0)
    prob = logreg_l1.create(m=1500, n=10000)
    common = dict(rel_tol=1e-3, abs_tol=1e-6, max_iterations=10000,
                  warm_start=True)
    t0 = time.time()
    obj = prob.solve(**common)
    t_first = time.time() - t0  # includes compile
    fixed = dict(rel_tol=0.0, abs_tol=0.0, max_iterations=1000,
                 epoch_iterations=100, warm_start=True)
    prob.solve(**fixed)  # compile the fixed-iteration trace before timing
    ts = []
    for _ in range(reps):
        prob.solve(**fixed)
        st = prob.solver_status
        ts.append(st.num_iterations /
                  max(st.timing.solve_usec / 1e6, 1e-9))
    med, lo, hi = _median_spread(ts)
    t_ref = 62.83  # reference 20-news sparse multiclass solve on CPU
    #               (docs/notebooks/newsgroups.rst:162-166) — closest
    #               published sparse-text-scale anchor (hinge vs logistic
    #               loss; same m/n scale and sparsity regime)
    return {
        "metric": "admm_iterations_per_sec_logreg_l1_1500x10000",
        "value": round(med, 2),
        "unit": "iter/s",
        "vs_baseline": round(t_ref / t_first, 2),
        "vs_baseline_note": "reference CPU 62.83 s sparse-text solve vs "
                            "our time-to-1e-3 incl. compile",
        "spread": {"min": round(lo, 2), "max": round(hi, 2), "reps": reps},
        "time_to_1e-3_incl_compile_s": round(t_first, 2),
        "objective": float(obj),
    }


# ---------------------------------------------------------------------------
# MNIST-RFF at reference scale (mnist.rst:238-243: 60000x4000, 40k vars,
# 196.57 s CPU solve at 30 iters)
# ---------------------------------------------------------------------------

_MNIST_CHILD = r'''
import json, os, sys, time
sys.path.insert(0, %(repo)r)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import numpy as np
from epsilon_tpu.problems import mnist
np.random.seed(0)
t0 = time.time()
prob = mnist.create(m=60000, n=4000, k=10, lam=0.1)
t_build = time.time() - t0
t0 = time.time()
obj = prob.solve(rel_tol=1e-3, abs_tol=1e-6, max_iterations=1000,
                 epoch_iterations=10, drive="host")
t_solve = time.time() - t0
st = prob.solver_status
print("MNIST_ROW " + json.dumps(dict(
    build_s=round(t_build, 2), solve_s=round(t_solve, 2),
    iterations=st.num_iterations, status=prob.status,
    objective=float(obj))), flush=True)
'''


def row_mnist_rff(attempts=3, timeout_s=840):
    """MNIST-RFF at reference scale, run in a CHILD process under a hard
    timeout: the axon remote-compile/transfer transport intermittently
    hangs (not errors) mid-solve, so an in-process retry loop can never
    fire — the watchdog kills and retries instead.  Features are generated
    on-device (``mnist.create device_features``), so only ~13 MB crosses
    the host link."""
    import subprocess
    script = _MNIST_CHILD % {"repo": os.path.dirname(os.path.abspath(__file__))}
    last_err = "unknown"
    for attempt in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, "-c", script], capture_output=True,
                text=True, timeout=timeout_s)
        except subprocess.TimeoutExpired:
            last_err = f"timeout after {timeout_s}s (attempt {attempt})"
            continue
        for line in out.stdout.splitlines():
            if line.startswith("MNIST_ROW "):
                d = json.loads(line[len("MNIST_ROW "):])
                return {
                    "metric": "mnist_rff_60000x4000_solve",
                    "value": d["solve_s"],
                    "unit": "s",
                    # reference CPU solve: 196.57 s
                    # (docs/notebooks/mnist.rst:238-243)
                    "vs_baseline": round(196.57 / d["solve_s"], 2),
                    "iterations": d["iterations"],
                    "status": d["status"],
                    "objective": d["objective"],
                    "build_s": d["build_s"],
                    "attempt": attempt,
                }
        last_err = (out.stderr or out.stdout or "no output")[-400:]
    return {"metric": "mnist_rff_60000x4000_solve", "error": last_err}


# ---------------------------------------------------------------------------
# warm-started TV inside the ADMM loop (stateful PDAS dual threading)
# ---------------------------------------------------------------------------

def row_tv_warm_admm(n=100_000, iters=300, reps=3):
    """tv_1d through the full two-block ADMM, warm (PDAS dual threaded
    through the loop state) vs cold (stateless kernel re-solves from z=0
    every sweep).  Reference analogue: glmgen workspace reuse,
    ``total_variation_1d.cc:6-25``."""
    from epsilon_tpu.ir import ProxKind
    from epsilon_tpu.ops.prox import registry
    from epsilon_tpu.problems import tv_1d

    ent = registry.KERNELS[ProxKind.TOTAL_VARIATION_1D]
    saved = ent.stateful_prox
    out = {}
    common = dict(rel_tol=0.0, abs_tol=0.0, max_iterations=iters,
                  epoch_iterations=50, warm_start=True)
    try:
        for mode, sp_fn in (("cold", None), ("warm", saved)):
            ent.stateful_prox = sp_fn
            np.random.seed(0)
            prob = tv_1d.create(n)
            prob.solve(**common)      # compile + warm up
            ts = []
            for _ in range(reps):
                t0 = time.time()
                prob.solve(**common)
                ts.append(prob.solver_status.num_iterations
                          / (time.time() - t0))
            out[mode] = _median_spread(ts)[0]
    finally:
        ent.stateful_prox = saved
    return {
        "metric": "tv1d_admm_warm_vs_cold_iter_rate",
        "value": round(out["warm"] / out["cold"], 2),
        "unit": "x",
        "vs_baseline": None,
        "warm_iters_per_sec": round(out["warm"], 1),
        "cold_iters_per_sec": round(out["cold"], 1),
    }


# ---------------------------------------------------------------------------
# consensus lasso, 1e8 nonzeros (BASELINE config[4]) on one chip
# ---------------------------------------------------------------------------

def row_consensus(reps=3, iters=500):
    from epsilon_tpu.parallel import consensus_lasso_solver
    from epsilon_tpu.problems.scaling_bench import make_blocks

    # 1e8 nonzeros in A; wide-short blocks (m >> n) keep the per-block
    # cached factors (S, n, n) small — tall-thin blocks at the same nnz
    # need (S, n^2) factor memory that OOMs a single chip
    S, m, n = 200, 2500, 200
    A, b = make_blocks(S, m, n)
    solver = consensus_lasso_solver(
        A, b, 0.1, rel_tol=0.0, abs_tol=0.0, max_iterations=iters,
        epoch_iterations=50)
    solver.solve()
    ips = []
    for _ in range(reps):
        t0 = time.time()
        res = solver.solve()
        ips.append(res.iterations / (time.time() - t0))
    med, lo, hi = _median_spread(ips)
    cpu_ips = 9.1  # reference-equivalent CPU consensus iteration,
    #                extrapolated from the numpy/BLAS reimplementation
    #                (BENCH_NOTES.md, round-1 measurement)
    return {
        "metric": "consensus_lasso_1e8nnz_iterations_per_sec",
        "value": round(med, 2),
        "unit": "iter/s",
        "vs_baseline": round(med / cpu_ips, 1),
        "spread": {"min": round(lo, 2), "max": round(hi, 2), "reps": reps},
    }


# ---------------------------------------------------------------------------
# Newton vs bisection epigraph microbench (r2 claim: 2-9x on chip)
# ---------------------------------------------------------------------------

def row_epigraph_micro(reps=5, n=4096, chain=100):
    """Newton-KKT vs outer-bisection epigraph projections, measured as a
    CHAIN of `chain` applies inside one jitted program (a single apply is
    below the remote-dispatch latency floor and times the tunnel, not the
    kernel)."""
    import jax
    import jax.numpy as jnp
    from epsilon_tpu.ops.prox import vector as vec
    from epsilon_tpu.ops.prox.util import implicit_epigraph

    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(n), jnp.float32)
    s = jnp.asarray(-1.0, jnp.float32)

    def chain_of(epi):
        def run(v, s):
            def body(_, carry):
                vv, ss = carry
                x, t = epi(vv, ss)
                # feed the projection back in, slightly perturbed off the set
                return x * 1.01, t - 0.1
            return jax.lax.fori_loop(0, chain, body, (v, s))
        return jax.jit(run)

    newton = chain_of(vec.epi_log_sum_exp)
    bisect = chain_of(lambda vv, ss: implicit_epigraph(
        lambda w, lam: vec.prox_log_sum_exp(w, lam),
        lambda xx: vec.eval_log_sum_exp(xx), vv, ss))

    out = {}
    for name, fn in [("newton", newton), ("bisection", bisect)]:
        x, t = fn(v, s)
        np.asarray(x)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            x, t = fn(v, s)
            np.asarray(x)
            ts.append(time.time() - t0)
        out[name] = _median_spread(ts)[0] / chain
    return {
        "metric": "epigraph_lse_newton_vs_bisection_speedup",
        "value": round(out["bisection"] / out["newton"], 2),
        "unit": "x",
        "vs_baseline": None,
        "newton_s_per_apply": round(out["newton"], 6),
        "bisection_s_per_apply": round(out["bisection"], 6),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", action="store_true",
                    help="run the full table, write BENCH_SUITE.json")
    ap.add_argument("--out", default="BENCH_SUITE.json")
    args = ap.parse_args()

    flagship = None
    if args.suite:
        rows = []
        for name, fn in [("lasso", row_lasso), ("tv_1m", row_tv_1m),
                         ("sparse_logreg", row_sparse_logreg),
                         ("consensus", row_consensus),
                         ("epigraph_micro", row_epigraph_micro),
                         ("tv_warm_admm", row_tv_warm_admm),
                         ("mnist_rff", row_mnist_rff)]:
            try:
                t0 = time.time()
                r = fn()
                r["wall_s"] = round(time.time() - t0, 1)
            except Exception as e:  # keep the table going
                r = {"metric": name, "error": f"{type(e).__name__}: {e}"}
            rows.append(r)
            print(f"# {name}: {json.dumps(r)}", file=sys.stderr, flush=True)
            if name == "lasso":
                flagship = r
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
    else:
        flagship = row_lasso()
    print(json.dumps(flagship))


if __name__ == "__main__":
    main()
