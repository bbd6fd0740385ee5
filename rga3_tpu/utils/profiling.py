"""Tracing / profiling subsystem.

The reference has none (SURVEY.md §5.1 — only coarse batch_time/data_time
meters); here jax.profiler traces are first-class: wrap any region with
`trace()` or run step-ranges with `profile_steps`.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(profile_dir: Optional[str], name: str = "trace") -> Iterator[None]:
    """Capture a jax.profiler trace into profile_dir (no-op when None)."""
    if not profile_dir:
        yield
        return
    import jax

    os.makedirs(profile_dir, exist_ok=True)
    jax.profiler.start_trace(profile_dir)
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def device_timeit(
    fn,
    *args,
    iters: int = 50,
    repeats: int = 5,
    perturb=None,
):
    """Time `fn(*args)` with the iteration loop ON DEVICE (lax.fori_loop),
    so per-call dispatch latency cannot pollute the measurement. On this
    environment's relayed TPU backend each host->device dispatch costs
    ~1-4 ms — any op cheaper than ~10 ms measured with a host loop is
    mostly dispatch noise.

    The loop carries a scalar data dependency through every iteration
    (sum of fn's first output leaf), so XLA cannot elide or reorder
    iterations; `perturb(args, i)` (default: add i to the first arg)
    varies the input per iteration so no caching is possible.

    Returns best-of-`repeats` milliseconds per iteration.
    """
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    if perturb is None:
        def perturb(a, i):
            return (a[0] + i.astype(a[0].dtype),) + tuple(a[1:])

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(args, n):
        def body(i, acc):
            out = fn(*perturb(args, i))
            leaf = jax.tree.leaves(out)[0]
            return acc + jnp.sum(leaf).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(np.asarray(loop(args, n=iters)))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(loop(args, n=iters)))  # host fetch = completion
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


class StepTimer:
    """Rolling step timing (batch_time/data_time equivalent,
    ref train_joint.py:474-509) with simple percentile summaries."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    def summary(self) -> dict:
        import numpy as np

        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps_per_sec": float(1.0 / max(arr.mean(), 1e-9)),
        }


# --------------------------------------------------------------- MFU
# Peak dense bf16 matmul throughput per chip (public TPU specs). The
# axon relay reports its own device_kind, so unknown kinds fall back to
# v5e (this environment's chip).
_PEAK_BF16_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5 lite": 197e12,
    "v5litepod": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
    "v6 lite": 918e12,  # Trillium reports device_kind "TPU v6 lite"
    "v6": 918e12,
}


def peak_flops_per_chip(default: float = 197e12) -> float:
    import jax

    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return default
    for name, val in _PEAK_BF16_FLOPS.items():
        if name in kind:
            return val
    return default


def compiled_flops(fn, *args, **kwargs) -> float:
    """Model FLOPs of one call as XLA counts them (compiled cost
    analysis). Returns 0.0 when the backend exposes no cost model."""
    import jax

    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def mfu(flops_per_call: float, seconds_per_call: float) -> float:
    """Model FLOPs utilization vs the chip's peak bf16 matmul rate."""
    if flops_per_call <= 0 or seconds_per_call <= 0:
        return 0.0
    return flops_per_call / seconds_per_call / peak_flops_per_chip()
