"""Profiling and performance measurement.

Reference scaffolds: the ``durations_in_seconds`` dicts threaded through the
prediction API (docs sahi/predict.py:100-139,322-341), FLOPs/params via thop +
warmup-then-measure latency (scripts/inference_time.py:27-62), and peak CUDA
memory (scripts/inference_yolo.py:27-28). TPU equivalents: the same duration
dicts (engine/predict.py), XLA cost analysis for FLOPs, jax device memory
stats, and jax.profiler trace capture.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np

__all__ = [
    "Stopwatch",
    "flops_and_params",
    "measure_latency",
    "device_memory_stats",
    "trace",
]


class Stopwatch:
    """Accumulating phase timer producing a durations_in_seconds dict."""

    def __init__(self):
        self.durations: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.durations[name] = self.durations.get(name, 0.0) + (
                time.perf_counter() - t0
            )


def flops_and_params(fn: Callable, *example_args, params=None) -> dict:
    """FLOPs via XLA cost analysis + parameter count — the thop.profile
    equivalent (scripts/inference_time.py:27-37)."""
    lowered = jax.jit(fn).lower(*example_args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    n_params = (
        sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        if params is not None
        else None
    )
    return {"flops": flops, "gflops": flops / 1e9, "params": n_params}


def measure_latency(
    fn: Callable, *args, warmup: int = 3, iters: int = 10
) -> dict:
    """Warmup-then-measure latency/FPS (scripts/inference_time.py:43-62)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "mean_ms": 1000 * float(np.mean(times)),
        "p50_ms": 1000 * times[len(times) // 2],
        "min_ms": 1000 * times[0],
        "fps": 1.0 / float(np.mean(times)),
    }


def device_memory_stats(device=None) -> dict:
    """Per-device memory stats — the peak-CUDA-memory equivalent
    (scripts/inference_yolo.py:27-28). Returns {} when the backend does not
    expose stats (e.g. CPU)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace capture for tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
