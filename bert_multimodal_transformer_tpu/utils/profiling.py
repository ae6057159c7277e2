"""Profiling / timing harness.

The reference has no profiling at all (SURVEY §5 — only tqdm bars). This
module provides the examples/sec/chip measurement used by bench.py plus an
optional jax.profiler trace capture.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


def time_step(step_fn: Callable, *args, n_steps: int = 20, warmup: int = 5,
              **kwargs) -> Dict[str, float]:
    """Time a compiled step function. Returns seconds/step stats.

    The step is called repeatedly with the same args; the caller is
    responsible for donation-safety (pass donate-free args or re-feed
    outputs). Blocks on the last output only — steps pipeline on device.
    """
    out = None
    for _ in range(warmup):
        out = step_fn(*args, **kwargs)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = step_fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return {
        "seconds_per_step": dt / n_steps,
        "steps_per_second": n_steps / dt,
        "total_seconds": dt,
        "n_steps": float(n_steps),
    }


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
