"""Benchmark harness (``python/epopt/problems/benchmark.py:26-255``).

Runs the problem suite, reporting solve time / iterations / objective::

    python -m epsilon_tpu.problems.benchmark --problem=lasso
    python -m epsilon_tpu.problems.benchmark --scale   # log-spaced sweeps
"""

from __future__ import annotations

import argparse
import time
from typing import Callable, Dict, List, NamedTuple, Optional

import numpy as np

import epsilon_tpu as ep


class ProblemInstance(NamedTuple):
    name: str
    create: Callable
    kwargs: Dict

    def create_problem(self):
        np.random.seed(0)
        out = self.create(**self.kwargs)
        if isinstance(out, tuple):
            return out[0]
        return out


def _p(mod):
    from . import (basis_pursuit, chebyshev, covsel, fused_lasso, group_lasso,
                   hinge_l1, hinge_l2, huber, infinite_push, lasso,
                   least_abs_dev, logreg_l1, lp, max_gaussian, max_softmax,
                   mnist, mv_lasso, oneclass_svm, portfolio, qp, quantile,
                   robust_pca, robust_svm, tv_1d, tv_denoise)
    return locals()[mod]


# Default suite sizes follow benchmark.py:26-54 (scaled down ~4x so the
# default run completes quickly on one chip; --large restores them).
PROBLEMS: List[ProblemInstance] = [
    ProblemInstance("basis_pursuit", _p("basis_pursuit").create, dict(m=300, n=1000)),
    ProblemInstance("covsel", _p("covsel").create, dict(m=30, n=60, lam=0.1)),
    ProblemInstance("fused_lasso", _p("fused_lasso").create, dict(m=250, ni=2, k=500)),
    ProblemInstance("group_lasso", _p("group_lasso").create, dict(m=375, ni=5, K=50)),
    ProblemInstance("hinge_l1", _p("hinge_l1").create, dict(m=375, n=2500)),
    ProblemInstance("hinge_l2", _p("hinge_l2").create, dict(m=1250, n=500)),
    ProblemInstance("huber", _p("huber").create, dict(m=1250, n=500)),
    ProblemInstance("lasso", _p("lasso").create, dict(m=375, n=2500)),
    ProblemInstance("least_abs_dev", _p("least_abs_dev").create, dict(m=1250, n=250)),
    ProblemInstance("logreg_l1", _p("logreg_l1").create, dict(m=375, n=2500)),
    ProblemInstance("lp", _p("lp").create, dict(m=200, n=400)),
    ProblemInstance("mnist", _p("mnist").create, dict(m=250, n=250, k=10)),
    ProblemInstance("mv_lasso", _p("mv_lasso").create, dict(m=375, n=625, k=4)),
    ProblemInstance("qp", _p("qp").create, dict(n=300)),
    ProblemInstance("quantile", _p("quantile").create, dict(m=100, n=10, k=5)),
    ProblemInstance("robust_pca", _p("robust_pca").create, dict(n=50)),
    ProblemInstance("tv_1d", _p("tv_1d").create, dict(n=25000)),
    ProblemInstance("tv_denoise", _p("tv_denoise").create, dict(n=50, lam=1.0)),
]

PROBLEMS_SMALL: List[ProblemInstance] = [
    ProblemInstance(p.name, p.create,
                    {k: (max(int(v // 10), 4) if isinstance(v, int) else v)
                     for k, v in p.kwargs.items()})
    for p in PROBLEMS
]


def _scale_problems() -> List[ProblemInstance]:
    """Log-spaced size sweeps (``benchmark.py:66-91``): the scaling curves
    behind the reference's benchmark graphs, built lazily so importing this
    module stays cheap."""
    out: List[ProblemInstance] = []
    out += [ProblemInstance(f"lasso_{int(m)}", _p("lasso").create,
                            dict(m=int(m), n=10 * int(m),
                                 rho=1 if m < 50 else 0.01))
            for m in np.logspace(1, np.log10(5000), 20)]
    out += [ProblemInstance(f"mv_lasso_{int(m)}", _p("mv_lasso").create,
                            dict(m=int(m), n=10 * int(m), k=10,
                                 rho=1 if m < 50 else 0.01))
            for m in np.logspace(1, np.log10(5000), 20)]
    out += [ProblemInstance(f"fused_lasso_{int(m)}", _p("fused_lasso").create,
                            dict(m=int(m), ni=10, k=int(m)))
            for m in np.logspace(1, 3, 20)]
    out += [ProblemInstance(f"hinge_l2_{int(n)}", _p("hinge_l2").create,
                            dict(m=10 * int(n), n=int(n)))
            for n in np.logspace(1, np.log10(5000), 20)]
    return out


def PROBLEMS_SCALE() -> List[ProblemInstance]:
    return _scale_problems()


def benchmark_epsilon(instance: ProblemInstance,
                      rel_tol: float = 1e-3,
                      max_iterations: int = 50000,
                      **params) -> Dict:
    prob = instance.create_problem()
    t0 = time.time()
    obj = prob.solve(rel_tol=rel_tol, max_iterations=max_iterations, **params)
    t_total = time.time() - t0
    st = prob.solver_status
    return dict(
        name=instance.name,
        time=t_total,
        solve_time=st.timing.solve_usec / 1e6,
        iterations=st.num_iterations,
        objective=obj,
        status=prob.status,
    )


def run_benchmarks(problems: List[ProblemInstance], **kwargs) -> List[Dict]:
    results = []
    for inst in problems:
        try:
            r = benchmark_epsilon(inst, **kwargs)
        except Exception as e:  # pragma: no cover - reporting path
            r = dict(name=inst.name, error=f"{type(e).__name__}: {e}")
        results.append(r)
        print(format_result(r))
    return results


def format_result(r: Dict) -> str:
    if "error" in r:
        return f"{r['name']:16s} ERROR {r['error']}"
    return (f"{r['name']:16s} {r['time']:8.2f}s  iters={r['iterations']:6d}  "
            f"obj={r['objective']:.6e}  {r['status']}")


def format_table(results: List[Dict], fmt: str = "text") -> str:
    if fmt == "html":
        rows = "".join(
            f"<tr><td>{r['name']}</td><td>{r.get('time', float('nan')):.2f}</td>"
            f"<td>{r.get('objective', float('nan')):.4e}</td></tr>"
            for r in results)
        return f"<table><tr><th>problem</th><th>time</th><th>objective</th></tr>{rows}</table>"
    if fmt == "latex":
        rows = "\\\\\n".join(
            f"{r['name']} & {r.get('time', float('nan')):.2f} & "
            f"{r.get('objective', float('nan')):.4e}"
            for r in results)
        return ("\\begin{tabular}{lrr}\nproblem & time & objective\\\\\n"
                + rows + "\\\\\n\\end{tabular}")
    return "\n".join(format_result(r) for r in results)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--problem", default=None)
    parser.add_argument("--small", action="store_true")
    parser.add_argument("--scale", action="store_true",
                        help="run the log-spaced size sweeps")
    parser.add_argument("--rel-tol", type=float, default=1e-3)
    parser.add_argument("--max-iterations", type=int, default=50000)
    parser.add_argument("--format", default="text",
                        choices=["text", "html", "latex"])
    args = parser.parse_args()

    suite = PROBLEMS_SMALL if args.small else PROBLEMS
    if args.scale:
        suite = _scale_problems()
    if args.problem:
        suite = [p for p in suite if p.name == args.problem
                 or p.name.startswith(args.problem + "_")]
        if not suite:
            raise SystemExit(f"unknown problem {args.problem}")
    results = run_benchmarks(suite, rel_tol=args.rel_tol,
                             max_iterations=args.max_iterations)
    if args.format != "text":
        print(format_table(results, args.format))


if __name__ == "__main__":
    main()
