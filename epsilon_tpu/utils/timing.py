"""Timing & profiling utilities.

Replaces the reference's wall-clock helpers (``util/time.h:5-7`` WallTime_Usec,
``python/epopt/util.py:7-23`` cpu_time) and its unused Stat/StatImpl
monitoring (``solver.h:22-27``) with the JAX-native story: xprof traces via
``jax.profiler`` plus simple host timers.
"""

from __future__ import annotations

import contextlib
import os
import time


def wall_time_usec() -> int:
    return int(time.time() * 1e6)


def cpu_time() -> float:
    return time.process_time()


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/epsilon_tpu_trace"):
    """Capture an xprof/TensorBoard trace of everything inside the block:

        with profile_trace("/tmp/trace"):
            solver.solve()
    """
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
