"""Checkpoint-converter tests.

Builds a synthetic torch ZigMa state dict (exact reference key names /
shapes, reference: model_zigma.py:544-909, mamba_simple.py:96-264), converts
it, and (a) checks the tree loads into our flax model, (b) verifies each
risky layout transform numerically against torch CPU ops.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from zigma_tpu.convert import convert_state_dict
from zigma_tpu.models import ZigMa
from zigma_tpu.ops.causal_conv1d import causal_conv1d


def _torch_zigma_state_dict(depth=2, embed_dim=64, in_ch=4, patch=2,
                            n_patches=16, d_context=0, num_classes=-1,
                            v2=False, seed=0):
    """Reference-shaped random state dict (keys from model_zigma/mamba_simple)."""
    g = torch.Generator().manual_seed(seed)
    d_inner = 2 * embed_dim
    dt_rank = math.ceil(embed_dim / 16)
    N, W = 16, 4

    def rnd(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "x_embedder.proj.weight": rnd(embed_dim, in_ch, patch, patch),
        "x_embedder.proj.bias": rnd(embed_dim),
        "t_embedder.mlp.0.weight": rnd(embed_dim, 256),
        "t_embedder.mlp.0.bias": rnd(embed_dim),
        "t_embedder.mlp.2.weight": rnd(embed_dim, embed_dim),
        "t_embedder.mlp.2.bias": rnd(embed_dim),
        "pos_embed": rnd(1, n_patches, embed_dim),
        "norm_f.weight": torch.ones(embed_dim),
        "final_layer.linear.weight": rnd(patch * patch * in_ch, embed_dim),
        "final_layer.linear.bias": rnd(patch * patch * in_ch),
    }
    if d_context > 0:
        sd["y_embedder.weight"] = rnd(embed_dim, d_context)
        sd["y_embedder.bias"] = rnd(embed_dim)
    elif num_classes > 0:
        sd["y_embedder.embedding_table.weight"] = rnd(num_classes, embed_dim)

    n_mod = 6 if d_context > 0 else 3
    for i in range(depth):
        pre = f"blocks.{i}"
        sd[f"{pre}.norm.weight"] = torch.ones(embed_dim)
        sd[f"{pre}.adaLN_modulation.1.weight"] = rnd(n_mod * embed_dim, embed_dim)
        sd[f"{pre}.adaLN_modulation.1.bias"] = rnd(n_mod * embed_dim)
        sd[f"{pre}.mixer.in_proj.weight"] = rnd(2 * d_inner, embed_dim)
        sd[f"{pre}.mixer.out_proj.weight"] = rnd(embed_dim, d_inner)
        branches = [""] + (["_b"] if v2 else [])
        for s in branches:
            sd[f"{pre}.mixer.A{s}_log"] = torch.log(
                torch.arange(1, N + 1, dtype=torch.float32).expand(d_inner, N))
            sd[f"{pre}.mixer.D{s}"] = torch.ones(d_inner)
            sd[f"{pre}.mixer.conv1d{s}.weight"] = rnd(d_inner, 1, W)
            sd[f"{pre}.mixer.conv1d{s}.bias"] = rnd(d_inner)
            sd[f"{pre}.mixer.x_proj{s}.weight"] = rnd(dt_rank + 2 * N, d_inner)
            sd[f"{pre}.mixer.dt_proj{s}.weight"] = rnd(d_inner, dt_rank)
            sd[f"{pre}.mixer.dt_proj{s}.bias"] = rnd(d_inner)
        if d_context > 0:
            for nm in ("to_q", "to_k", "to_v"):
                sd[f"{pre}.msa.{nm}.weight"] = rnd(512, embed_dim)
            sd[f"{pre}.msa.to_out.0.weight"] = rnd(embed_dim, 512)
            sd[f"{pre}.msa.to_out.0.bias"] = rnd(embed_dim)
    return sd


class TestLayoutRules:
    """Each risky transpose verified against the torch op it mimics."""

    def test_linear(self):
        w = torch.randn(6, 4)
        b = torch.randn(6)
        x = torch.randn(3, 4)
        ref = F.linear(x, w, b).numpy()
        from zigma_tpu.convert.torch_zigma import _t

        ours = np.asarray(x) @ _t(w.numpy()) + b.numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_patchify_conv(self):
        p, C, D = 2, 4, 8
        w = torch.randn(D, C, p, p)
        b = torch.randn(D)
        x = torch.randn(2, C, 8, 8)
        ref = F.conv2d(x, w, b, stride=p)  # (2, D, 4, 4)
        ref = ref.flatten(2).transpose(1, 2).numpy()  # (2, 16, D)

        from zigma_tpu.models import PatchEmbed

        m = PatchEmbed(patch_size=p, embed_dim=D)
        params = {"params": {"proj": {
            "kernel": jnp.asarray(np.transpose(w.numpy(), (2, 3, 1, 0))),
            "bias": jnp.asarray(b.numpy())}}}
        ours = np.asarray(m.apply(params, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_causal_conv1d(self):
        d, W, L = 8, 4, 16
        w = torch.randn(d, 1, W)
        b = torch.randn(d)
        x = torch.randn(2, d, L)
        ref = F.conv1d(x, w, b, padding=W - 1, groups=d)[..., :L]
        ref = F.silu(ref).transpose(1, 2).numpy()  # (2, L, d)

        ours = np.asarray(causal_conv1d(
            jnp.asarray(x.transpose(1, 2).numpy()),
            jnp.asarray(w.numpy().squeeze(1)), jnp.asarray(b.numpy()),
            activation="silu"))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_embedding(self):
        w = torch.randn(10, 6)
        labels = torch.tensor([1, 7])
        ref = F.embedding(labels, w).numpy()
        ours = np.asarray(w.numpy())[np.asarray(labels)]
        np.testing.assert_allclose(ours, ref)


class TestConvertedTreeLoads:
    @pytest.mark.parametrize("cfg", [
        dict(scan_type="zigzagN2", use_pe=2),
        dict(scan_type="v2", use_pe=2, v2=True),
        dict(scan_type="zigzagN2", use_pe=2, has_text=True, d_context=32),
        dict(scan_type="zigzagN2", use_pe=2, num_classes=10),
    ])
    def test_roundtrip_forward(self, cfg):
        v2 = cfg.pop("v2", False)
        has_text = cfg.pop("has_text", False)
        num_classes = cfg.pop("num_classes", -1)
        d_context = cfg.pop("d_context", 0)
        sd = _torch_zigma_state_dict(
            v2=v2, d_context=d_context if has_text else 0,
            num_classes=num_classes)
        params = convert_state_dict(sd)

        model = ZigMa(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                      patch_size=2, has_text=has_text, d_context=d_context,
                      num_classes=num_classes, scan_backend="ref", **cfg)
        x = jnp.zeros((2, 4, 8, 8))
        t = jnp.zeros((2,))
        y = (jnp.zeros((2, 7, d_context)) if has_text
             else (jnp.array([1, 2]) if num_classes > 0 else None))

        # structural check: converted tree must match the init tree exactly
        ref_params = model.init(jax.random.PRNGKey(0), x, t, y)
        ref_paths = {jax.tree_util.keystr(p)
                     for p, _ in jax.tree_util.tree_flatten_with_path(ref_params)[0]}
        got_paths = {jax.tree_util.keystr(p)
                     for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
        assert got_paths == ref_paths, (
            f"missing={sorted(ref_paths - got_paths)[:5]} "
            f"extra={sorted(got_paths - ref_paths)[:5]}")

        out = model.apply(
            jax.tree.map(jnp.asarray, params), x + 0.1, t + 0.3, y)
        assert out.shape == (2, 4, 8, 8)
        assert jnp.isfinite(out).all()

    def test_leftover_keys_raise(self):
        sd = _torch_zigma_state_dict()
        sd["some.unknown.weight"] = torch.zeros(3)
        with pytest.raises(ValueError, match="unconverted"):
            convert_state_dict(sd)

    def test_module_prefix_stripped(self):
        sd = _torch_zigma_state_dict()
        sd = {f"module.{k}": v for k, v in sd.items()}
        params = convert_state_dict(sd)
        assert "x_embedder" in params["params"]
