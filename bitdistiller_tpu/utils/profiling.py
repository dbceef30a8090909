"""Profiling / tracing utilities.

The reference's observability is per-token wall-clock with cuda.synchronize
(stream_gen.py:66-125, "Generation Stage: X ms/token") plus Triton autotune
timings. TPU-native: jax.profiler traces viewable in XProf/TensorBoard, a
step timer that forces device completion, and a tiny autotuner for kernel
block-size sweeps (tune.py:31-61 parity).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace: `with trace('/tmp/prof'): step(...)`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing with device sync; tracks mean/p50 ms per step."""

    def __init__(self):
        self.times: list[float] = []

    @contextlib.contextmanager
    def step(self, result_holder: list | None = None):
        t0 = time.time()
        yield
        if result_holder:
            jax.block_until_ready(result_holder[-1])
        self.times.append(time.time() - t0)

    def time_fn(self, fn, *args, warmup: int = 2, iters: int = 10) -> float:
        """Mean seconds per call (device-synced)."""
        out = None
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / iters

    @property
    def mean_ms(self) -> float:
        return 1e3 * sum(self.times) / max(len(self.times), 1)


def autotune(fn_builder: Callable, configs: Iterable, *args, **timer_kw):
    """Pick the fastest config: fn_builder(config) -> callable(*args).

    Parity with inference/utils/tune.py:31-61 (split_k_iters sweep), but
    generic over any kernel parameter.
    """
    timer = StepTimer()
    best, best_t = None, float("inf")
    results = {}
    for config in configs:
        try:
            fn = fn_builder(config)
            t = timer.time_fn(fn, *args, **timer_kw)
        except Exception:
            continue
        results[repr(config)] = t
        if t < best_t:
            best, best_t = config, t
    return best, results
