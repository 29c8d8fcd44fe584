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


def test_pos_embed_similarity_grid():
    """Sincos PE similarity must peak at the anchor itself (self-sim = 1)."""
    import numpy as np

    from zigma_tpu.models.embedders import get_2d_sincos_pos_embed
    from zigma_tpu.utils.logging_utils import pos_embed_similarity_grid

    pe = get_2d_sincos_pos_embed(64, 8)  # (64, 64) for an 8x8 grid
    img = pos_embed_similarity_grid(pe, img_dim=8, anchors=4)
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[-1] == 3
    # anchor (0,0): its own map's top-left pixel is the max (cos sim 1)
    first = img[:8, :8, 0].astype(int)
    assert first[0, 0] == first.max()

    import pytest

    with pytest.raises(ValueError):
        pos_embed_similarity_grid(pe, img_dim=5)
