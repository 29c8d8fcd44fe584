"""Mamba LM checkpoint converter tests (synthetic reference-shaped dicts)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from zigma_tpu.convert import convert_mamba_lm_state_dict
from zigma_tpu.models.lm import MambaLMHeadModel


def _torch_lm_state_dict(vocab=32, d=32, n_layer=2, seed=0):
    g = torch.Generator().manual_seed(seed)
    d_inner, dt_rank, N, W = 2 * d, math.ceil(d / 16), 16, 4

    def rnd(*s):
        return torch.randn(*s, generator=g) * 0.05

    sd = {"backbone.embedding.weight": rnd(vocab, d),
          "backbone.norm_f.weight": torch.ones(d),
          "lm_head.weight": rnd(vocab, d)}
    for i in range(n_layer):
        pre = f"backbone.layers.{i}"
        sd[f"{pre}.norm.weight"] = torch.ones(d)
        sd[f"{pre}.mixer.in_proj.weight"] = rnd(2 * d_inner, d)
        sd[f"{pre}.mixer.out_proj.weight"] = rnd(d, d_inner)
        sd[f"{pre}.mixer.A_log"] = torch.log(
            torch.arange(1, N + 1, dtype=torch.float32).expand(d_inner, N))
        sd[f"{pre}.mixer.D"] = torch.ones(d_inner)
        sd[f"{pre}.mixer.conv1d.weight"] = rnd(d_inner, 1, W)
        sd[f"{pre}.mixer.conv1d.bias"] = rnd(d_inner)
        sd[f"{pre}.mixer.x_proj.weight"] = rnd(dt_rank + 2 * N, d_inner)
        sd[f"{pre}.mixer.dt_proj.weight"] = rnd(d_inner, dt_rank)
        sd[f"{pre}.mixer.dt_proj.bias"] = rnd(d_inner)
    return sd


class TestLMConverter:
    def test_structure_matches_model(self):
        params = convert_mamba_lm_state_dict(_torch_lm_state_dict())
        m = MambaLMHeadModel(d_model=32, n_layer=2, vocab_size=32,
                             rms_norm=True)
        ids = jnp.array([[1, 2, 3]])
        ref = m.init(jax.random.PRNGKey(0), ids)
        ref_paths = {jax.tree_util.keystr(p) for p, _ in
                     jax.tree_util.tree_flatten_with_path(ref)[0]}
        got_paths = {jax.tree_util.keystr(p) for p, _ in
                     jax.tree_util.tree_flatten_with_path(params)[0]}
        assert got_paths == ref_paths, (
            sorted(ref_paths - got_paths)[:5], sorted(got_paths - ref_paths)[:5])

        logits = m.apply(jax.tree.map(jnp.asarray, params), ids)
        assert logits.shape == (1, 3, 32)
        assert jnp.isfinite(logits).all()

    def test_leftover_raises(self):
        sd = _torch_lm_state_dict()
        sd["backbone.mystery.weight"] = torch.zeros(2)
        with pytest.raises(ValueError, match="unconverted"):
            convert_mamba_lm_state_dict(sd)
