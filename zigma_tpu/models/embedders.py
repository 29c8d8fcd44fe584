"""Patch / timestep / label / caption embedders and sin-cos position tables.

TPU-native rebuild of the reference embedding layers
(reference: model_zigma.py:66-310, 1019-1068).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "PatchEmbed",
    "TimestepEmbedder",
    "LabelEmbedder",
    "CaptionEmbedder",
    "get_2d_sincos_pos_embed",
]


def _xavier_uniform_flat():
    """Xavier-uniform over the conv kernel viewed as a (out, in*k*k) matrix —
    the reference inits patch-embed 'like nn.Linear' (model_zigma.py:852-854)."""

    def init(key, shape, dtype=jnp.float32):
        # flax conv kernel: (kh, kw, in, out)
        fan_out = shape[-1]
        fan_in = int(np.prod(shape[:-1]))
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class PatchEmbed(nn.Module):
    """Image-to-patch embedding: conv patchify -> (B, L, D).

    Handles both images (B, C, H, W) and video (B, T, C, H, W), folding T
    into the batch like the reference's PatchEmbed_Video
    (model_zigma.py:66-78).  Channel-first input is kept for API parity with
    the reference; internally NHWC (the TPU-native conv layout).
    """

    patch_size: int
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        video = x.ndim == 5
        if video:
            B, T = x.shape[:2]
            x = x.reshape(B * T, *x.shape[2:])
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, kernel_init=_xavier_uniform_flat(),
            bias_init=nn.initializers.zeros, name="proj",
        )(x)
        n, h, w, d = x.shape
        x = x.reshape(n, h * w, d)
        if video:
            x = x.reshape(B, T * h * w, d)
        return x


class TimestepEmbedder(nn.Module):
    """Sinusoidal timestep embedding + 2-layer MLP (model_zigma.py:232-275).

    The caller is responsible for the reference's ``t * 1000`` scaling
    (model_zigma.py:928).
    """

    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: Any = jnp.float32

    @staticmethod
    def timestep_embedding(t, dim, max_period=10000):
        half = dim // 2
        freqs = jnp.exp(
            -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = t[:, None].astype(jnp.float32) * freqs[None]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        if dim % 2:
            emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
        return emb

    @nn.compact
    def __call__(self, t):
        emb = self.timestep_embedding(t, self.frequency_embedding_size)
        emb = emb.astype(self.dtype)
        normal02 = nn.initializers.normal(stddev=0.02)
        emb = nn.Dense(self.hidden_size, dtype=self.dtype,
                       kernel_init=normal02, name="mlp_0")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.hidden_size, dtype=self.dtype,
                       kernel_init=normal02, name="mlp_2")(emb)
        return emb


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG token drop (model_zigma.py:278-310).

    The drop decision uses flax's 'label_drop' RNG stream when training with
    dropout_prob > 0; pass ``force_drop_ids`` for deterministic CFG batching.
    """

    num_classes: int
    hidden_size: int
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(self, labels, train: bool = False, force_drop_ids=None):
        use_cfg = self.dropout_prob > 0
        table = nn.Embed(
            self.num_classes + int(use_cfg), self.hidden_size,
            embedding_init=nn.initializers.normal(stddev=0.02), name="embedding",
        )
        if (train and use_cfg) or force_drop_ids is not None:
            if not use_cfg:
                # the null row only exists when dropout_prob > 0; without it
                # jnp.take would silently clamp the num_classes index onto
                # the last real class (the reference shares this trap)
                raise ValueError(
                    "force_drop_ids requires dropout_prob > 0: the embedding "
                    "table has no null-class row at dropout_prob == 0")
            if force_drop_ids is None:
                rng = self.make_rng("label_drop")
                drop = jax.random.uniform(rng, labels.shape) < self.dropout_prob
            else:
                drop = force_drop_ids == 1
            labels = jnp.where(drop, self.num_classes, labels)
        return table(labels)


class CaptionEmbedder(nn.Module):
    """Caption-feature MLP with learned null embedding for CFG drop
    (model_zigma.py:177-224).  Unused by the shipped ZigMa configs (which use
    a plain Linear y_embedder) but part of the reference capability surface.
    """

    in_channels: int
    hidden_size: int
    uncond_prob: float = 0.0
    token_num: int = 120
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, caption, train: bool = False, force_drop_ids=None):
        y_embedding = self.param(
            "y_embedding",
            lambda k, s: jax.random.normal(k, s) / s[-1] ** 0.5,
            (self.token_num, self.in_channels))
        if (train and self.uncond_prob > 0) or force_drop_ids is not None:
            if force_drop_ids is None:
                rng = self.make_rng("label_drop")
                drop = jax.random.uniform(rng, (caption.shape[0],)) < self.uncond_prob
            else:
                drop = force_drop_ids == 1
            caption = jnp.where(drop[:, None, None], y_embedding, caption)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(caption)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(h)


# ---------------------------------------------------------------------------
# Frozen sin-cos 2-D position table (model_zigma.py:1019-1068, from MAE)
# ---------------------------------------------------------------------------


def _get_1d_sincos(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """(grid_size^2, embed_dim) fixed table; matches model_zigma.py:1019-1045."""
    assert embed_dim % 2 == 0
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w first, like the reference
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    emb_h = _get_1d_sincos(embed_dim // 2, grid[0])
    emb_w = _get_1d_sincos(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)
