"""Profiling utility tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from zigma_tpu.utils.profiling import (
    cost_analysis,
    device_memory_stats,
    differential_time,
)


def test_cost_analysis_matmul():
    a = jnp.ones((256, 256))
    b = jnp.ones((256, 256))
    ca = cost_analysis(lambda a, b: a @ b, a, b)
    # 2*n^3 flops for a matmul
    assert ca["flops"] >= 2 * 256**3 * 0.5
    assert ca["bytes_accessed"] > 0
    assert "roofline_seconds" in ca


def test_differential_time_positive():
    op = lambda x: jnp.sin(x) @ x
    dt = differential_time(op, jnp.ones((128, 128)), k_small=2, k_big=8)
    assert dt >= 0.0
    assert np.isfinite(dt)


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    # CPU backends may not expose memory_stats; just require a dict
    assert isinstance(stats, dict)
