"""Mamba language model + autoregressive generation (vendored capability).

TPU-native rebuild of the reference's LM-side Mamba stack
(reference: dis_mamba/mamba_ssm/models/mixer_seq_simple.py:83-253 and the
generation utilities dis_mamba/mamba_ssm/utils/generation.py:93-377).
Unused by the ZigMa diffusion pipeline but part of the capability surface
(SURVEY.md §2.3 "LM-side Mamba extras").

TPU-first differences:
- generation is a ``lax.scan`` over decode steps with the per-layer
  (conv_state, ssm_state) caches as the scan carry — the whole decode loop
  is one compiled program, which is the TPU analogue of the reference's
  CUDA-graph capture (generation.py:243-377);
- the prefill runs the parallel scan with ``return_last_state`` to seed the
  caches (the reference replays tokens one-by-one or uses the fused path).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from zigma_tpu.models.inits import rescaled_linear_init
from zigma_tpu.models.mamba import Mamba, MambaCache
from zigma_tpu.models.mamba2 import Mamba2, Mamba2Cache
from zigma_tpu.ops.norms import add_norm

__all__ = ["MixerModel", "MambaLMHeadModel", "generate"]




class _LMBlock(nn.Module):
    """Add -> Norm -> Mamba prenorm block (mixer_seq_simple.py:21-48)."""

    d_model: int
    n_layer: int
    layer_idx: int
    ssm_cfg: Optional[dict] = None
    rms_norm: bool = False
    norm_epsilon: float = 1e-5
    residual_in_fp32: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.norm_weight = self.param("norm_weight", nn.initializers.ones,
                                      (self.d_model,), jnp.float32)
        self.norm_bias = (None if self.rms_norm else self.param(
            "norm_bias", nn.initializers.zeros, (self.d_model,), jnp.float32))
        # ssm_version 2 selects the Mamba-2 SSD mixer (models/mamba2.py,
        # beyond reference parity — same step/prefill interface)
        cfg = dict(self.ssm_cfg or {})
        mixer_cls = {1: Mamba, 2: Mamba2}[int(cfg.pop("ssm_version", 1))]
        self.mixer = mixer_cls(
            d_model=self.d_model, scan_type="v1", layer_idx=self.layer_idx,
            dtype=self.dtype,
            out_proj_kernel_init=rescaled_linear_init(self.n_layer),
            **cfg, name="mixer")

    def _prenorm(self, x, residual):
        return add_norm(
            x, self.norm_weight, self.norm_bias, residual,
            kind="rms" if self.rms_norm else "layer",
            eps=self.norm_epsilon, prenorm=True,
            residual_in_fp32=self.residual_in_fp32)

    def __call__(self, x, residual):
        x, residual = self._prenorm(x, residual)
        return self.mixer(x), residual

    def step(self, x, residual, cache):
        x, residual = self._prenorm(x, residual)
        out, cache = self.mixer.step(x, cache)
        return out, residual, cache

    def prefill(self, x, residual):
        x, residual = self._prenorm(x, residual)
        out, cache = self.mixer.prefill(x)
        return out, residual, cache


class MixerModel(nn.Module):
    """Embedding + Mamba blocks + final norm (mixer_seq_simple.py:83-170)."""

    d_model: int
    n_layer: int
    vocab_size: int
    ssm_cfg: Optional[dict] = None
    norm_epsilon: float = 1e-5
    rms_norm: bool = False
    residual_in_fp32: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(
            self.vocab_size, self.d_model,
            embedding_init=nn.initializers.normal(stddev=0.02),
            name="embedding")
        self.layers = [
            _LMBlock(d_model=self.d_model, n_layer=self.n_layer, layer_idx=i,
                     ssm_cfg=self.ssm_cfg, rms_norm=self.rms_norm,
                     norm_epsilon=self.norm_epsilon,
                     residual_in_fp32=self.residual_in_fp32, dtype=self.dtype,
                     name=f"layers_{i}")
            for i in range(self.n_layer)
        ]
        self.normf_weight = self.param("norm_f_weight", nn.initializers.ones,
                                       (self.d_model,), jnp.float32)
        self.normf_bias = (None if self.rms_norm else self.param(
            "norm_f_bias", nn.initializers.zeros, (self.d_model,), jnp.float32))

    def _final_norm(self, h, residual):
        return add_norm(h, self.normf_weight, self.normf_bias, residual,
                        kind="rms" if self.rms_norm else "layer",
                        eps=self.norm_epsilon, prenorm=False,
                        residual_in_fp32=self.residual_in_fp32)

    def __call__(self, input_ids):
        h = self.embedding(input_ids).astype(self.dtype)
        residual = None
        for layer in self.layers:
            h, residual = layer(h, residual)
        return self._final_norm(h, residual)

    def step(self, token_ids, caches):
        """One decode step: token_ids (B, 1) + per-layer caches."""
        h = self.embedding(token_ids).astype(self.dtype)
        residual = None
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            h, residual, cache = layer.step(h, residual, cache)
            new_caches.append(cache)
        return self._final_norm(h, residual), tuple(new_caches)

    def prefill(self, input_ids):
        """Parallel prompt pass returning (hidden (B, L, D), caches)."""
        h = self.embedding(input_ids).astype(self.dtype)
        residual = None
        caches = []
        for layer in self.layers:
            h, residual, cache = layer.prefill(h, residual)
            caches.append(cache)
        return self._final_norm(h, residual), tuple(caches)


class MambaLMHeadModel(nn.Module):
    """MixerModel + tied LM head (mixer_seq_simple.py:173-227)."""

    d_model: int
    n_layer: int
    vocab_size: int
    ssm_cfg: Optional[dict] = None
    rms_norm: bool = False
    residual_in_fp32: bool = False
    pad_vocab_size_multiple: int = 1
    dtype: Any = jnp.float32

    @property
    def padded_vocab(self) -> int:
        m = self.pad_vocab_size_multiple
        return -(-self.vocab_size // m) * m

    def setup(self):
        self.backbone = MixerModel(
            d_model=self.d_model, n_layer=self.n_layer,
            vocab_size=self.padded_vocab, ssm_cfg=self.ssm_cfg,
            rms_norm=self.rms_norm, residual_in_fp32=self.residual_in_fp32,
            dtype=self.dtype, name="backbone")

    def _logits(self, h):
        # tied weights: lm_head = embedding^T (mixer_seq_simple.py:210-211)
        emb = self.backbone.embedding.embedding
        return h @ emb.T.astype(h.dtype)

    def __call__(self, input_ids, num_last_tokens: int = 0):
        h = self.backbone(input_ids)
        if num_last_tokens > 0:
            h = h[:, -num_last_tokens:]
        return self._logits(h)

    def step(self, token_ids, caches):
        h, caches = self.backbone.step(token_ids, caches)
        return self._logits(h), caches

    def prefill(self, input_ids):
        """(last-position logits (B, V), caches) via the parallel scan."""
        h, caches = self.backbone.prefill(input_ids)
        return self._logits(h[:, -1]), caches

    def init_caches(self, batch: int):
        cfg = self.ssm_cfg or {}
        d_inner = int(cfg.get("expand", 2) * self.d_model)
        if int(cfg.get("ssm_version", 1)) == 2:
            d_state = cfg.get("d_state", 64)
            headdim = cfg.get("headdim", 64)
            conv_dim = d_inner + 2 * cfg.get("ngroups", 1) * d_state
            return tuple(
                Mamba2Cache.init(batch, conv_dim, cfg.get("d_conv", 4),
                                 d_inner // headdim, headdim, d_state)
                for _ in range(self.n_layer))
        return tuple(
            MambaCache.init(batch, d_inner, cfg.get("d_conv", 4),
                            cfg.get("d_state", 16))
            for _ in range(self.n_layer))


def generate(model: MambaLMHeadModel, params, prompt_ids, max_new_tokens: int,
             rng=None, temperature: float = 1.0, top_k: int = 0):
    """Autoregressive decode: parallel-scan prefill seeds the caches, then a
    ``lax.scan`` decode loop (the compiled analogue of the reference's
    CUDA-graph decode, generation.py:93-377).

    prompt_ids: (B, L0) int32.  Returns (B, L0 + max_new_tokens).
    Greedy when rng is None, else temperature/top-k sampling.
    """
    B, L0 = prompt_ids.shape
    last_logits, caches = model.apply(params, prompt_ids,
                                      method=MambaLMHeadModel.prefill)

    def select(logits, key):
        logits = logits / jnp.maximum(temperature, 1e-6)
        if top_k > 0:
            kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        if key is None:
            return jnp.argmax(logits, axis=-1)
        return jax.random.categorical(key, logits, axis=-1)

    def decode_body(carry, key):
        caches, logits = carry
        tok = select(logits, key if rng is not None else None)
        logits, caches = model.apply(params, tok[:, None].astype(jnp.int32),
                                     caches, method=MambaLMHeadModel.step)
        return (caches, logits[:, 0]), tok

    keys = (jax.random.split(rng, max_new_tokens) if rng is not None
            else jnp.zeros((max_new_tokens, 2), jnp.uint32))
    (_, _), new_tokens = jax.lax.scan(decode_body, (caches, last_logits), keys)
    return jnp.concatenate([prompt_ids, jnp.moveaxis(new_tokens, 0, 1)],
                           axis=1)
