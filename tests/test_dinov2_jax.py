"""Native JAX DINOv2 ViT: numerics vs torch golden, pos-embed interp,
converter (reference FDD encoder: utils/torchmetric_fdd.py:82-105)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from zigma_tpu.metrics import dinov2_jax as dv


def _rand(*shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32) * scale


class TestPrimitives:
    @pytest.mark.parametrize("hw_in,hw_out", [
        ((37, 37), (16, 16)),   # the FDD 224px pos-embed path
        ((7, 9), (13, 5)),      # mixed up/downscale
    ])
    def test_bicubic_matches_torch(self, hw_in, hw_out):
        x = _rand(2, *hw_in, 3, seed=1)
        got = np.asarray(dv.torch_bicubic_resize(jnp.asarray(x), *hw_out))
        t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        want = F.interpolate(t, size=hw_out, mode="bicubic",
                             align_corners=False, antialias=False)
        np.testing.assert_allclose(
            got, np.transpose(want.numpy(), (0, 2, 3, 1)),
            rtol=1e-4, atol=1e-5)

    def test_layer_norm_matches_torch(self):
        x = _rand(2, 5, 16, seed=2)
        p = {"scale": jnp.asarray(_rand(16, seed=3)),
             "bias": jnp.asarray(_rand(16, seed=4))}
        got = np.asarray(dv._layer_norm(jnp.asarray(x), p))
        want = F.layer_norm(torch.from_numpy(x), (16,),
                            torch.from_numpy(np.asarray(p["scale"])),
                            torch.from_numpy(np.asarray(p["bias"])),
                            eps=1e-6).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_attention_matches_torch(self):
        dim, heads, N = 32, 4, 11
        p = {"qkv_w": jnp.asarray(_rand(3 * dim, dim, seed=5, scale=0.2)),
             "qkv_b": jnp.asarray(_rand(3 * dim, seed=6, scale=0.1)),
             "proj_w": jnp.asarray(_rand(dim, dim, seed=7, scale=0.2)),
             "proj_b": jnp.asarray(_rand(dim, seed=8, scale=0.1))}
        x = _rand(2, N, dim, seed=9)
        got = np.asarray(dv._attention(jnp.asarray(x), p, heads))

        tx = torch.from_numpy(x)
        qkv = tx @ torch.from_numpy(np.asarray(p["qkv_w"])).T + \
            torch.from_numpy(np.asarray(p["qkv_b"]))
        qkv = qkv.reshape(2, N, 3, heads, dim // heads).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = torch.softmax(q @ k.transpose(-2, -1)
                            / np.sqrt(dim // heads), dim=-1)
        out = (att @ v).permute(0, 2, 1, 3).reshape(2, N, dim)
        want = (out @ torch.from_numpy(np.asarray(p["proj_w"])).T
                + torch.from_numpy(np.asarray(p["proj_b"]))).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestPosEmbed:
    def test_offset_scale_matches_torch_scale_factor(self):
        """dinov2 passes scale_factor=(grid+0.1)/M to F.interpolate; the
        coordinate scale must match torch's 1/scale_factor path."""
        M, grid = 37, 16
        pe = _rand(1, 1 + M * M, 4, seed=20)
        _, got = dv._interp_pos_embed(jnp.asarray(pe), grid, grid,
                                      offset=0.1)
        g = torch.from_numpy(
            pe[:, 1:].reshape(1, M, M, 4).transpose(0, 3, 1, 2).copy())
        sf = float(grid + 0.1) / M
        want = F.interpolate(g, scale_factor=(sf, sf), mode="bicubic",
                             align_corners=False, antialias=False)
        want = want.permute(0, 2, 3, 1).reshape(1, grid * grid, 4).numpy()
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-5)

    def test_identity_at_train_grid(self):
        pe = jnp.asarray(_rand(1, 1 + 37 * 37, 8, seed=10))
        cls_pe, grid_pe = dv._interp_pos_embed(pe, 37, 37)
        np.testing.assert_allclose(np.asarray(grid_pe),
                                   np.asarray(pe[:, 1:]))
        np.testing.assert_allclose(np.asarray(cls_pe),
                                   np.asarray(pe[:, :1]))

    def test_resized_for_224(self):
        pe = jnp.asarray(_rand(1, 1 + 37 * 37, 8, seed=11))
        _, grid_pe = dv._interp_pos_embed(pe, 16, 16)
        assert grid_pe.shape == (1, 256, 8)


class TestFullGraph:
    def test_cls_shape_vits14(self):
        params = dv.random_params(seed=0, arch="vits14")
        x = jnp.asarray(_rand(2, 3, 56, 56, seed=12))  # 4x4 patch grid
        f = np.asarray(dv.dinov2_cls(params, x, arch="vits14"))
        assert f.shape == (2, 384)
        assert np.isfinite(f).all()
        # input-dependent (not collapsed)
        assert np.abs(f[0] - f[1]).max() > 1e-4

    def test_extractor_resolution_and_norm(self):
        params = dv.random_params(seed=0, arch="vits14")
        ex = dv.dinov2_extractor(params, arch="vits14", batch=2,
                                 resolution=56)
        imgs = np.random.default_rng(13).integers(
            0, 256, (3, 3, 40, 40), np.uint8)
        f = ex(imgs)
        assert f.shape == (3, 384)


class TestConverter:
    def _sd(self, arch="vits14"):
        dim, depth, _ = dv.ARCHS[arch]
        rng = np.random.default_rng(14)
        sd = {
            "patch_embed.proj.weight": rng.standard_normal(
                (dim, 3, 14, 14)).astype(np.float32) * 0.02,
            "patch_embed.proj.bias": np.zeros(dim, np.float32),
            "cls_token": np.zeros((1, 1, dim), np.float32),
            "pos_embed": rng.standard_normal(
                (1, 1 + 37 * 37, dim)).astype(np.float32) * 0.02,
            "norm.weight": np.ones(dim, np.float32),
            "norm.bias": np.zeros(dim, np.float32),
        }
        for i in range(depth):
            b = f"blocks.{i}"
            sd[f"{b}.norm1.weight"] = np.ones(dim, np.float32)
            sd[f"{b}.norm1.bias"] = np.zeros(dim, np.float32)
            sd[f"{b}.attn.qkv.weight"] = rng.standard_normal(
                (3 * dim, dim)).astype(np.float32) * 0.02
            sd[f"{b}.attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
            sd[f"{b}.attn.proj.weight"] = rng.standard_normal(
                (dim, dim)).astype(np.float32) * 0.02
            sd[f"{b}.attn.proj.bias"] = np.zeros(dim, np.float32)
            sd[f"{b}.ls1.gamma"] = np.ones(dim, np.float32)
            sd[f"{b}.norm2.weight"] = np.ones(dim, np.float32)
            sd[f"{b}.norm2.bias"] = np.zeros(dim, np.float32)
            sd[f"{b}.mlp.fc1.weight"] = rng.standard_normal(
                (4 * dim, dim)).astype(np.float32) * 0.02
            sd[f"{b}.mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
            sd[f"{b}.mlp.fc2.weight"] = rng.standard_normal(
                (dim, 4 * dim)).astype(np.float32) * 0.02
            sd[f"{b}.mlp.fc2.bias"] = np.zeros(dim, np.float32)
            sd[f"{b}.ls2.gamma"] = np.ones(dim, np.float32)
        return sd

    def test_roundtrip_forward(self):
        params = dv.load_torch_state_dict(self._sd(), arch="vits14")
        x = jnp.asarray(_rand(1, 3, 28, 28, seed=15))
        f = np.asarray(dv.dinov2_cls(params, x, arch="vits14"))
        assert f.shape == (1, 384) and np.isfinite(f).all()
        w = np.asarray(params["patch_embed"]["w"])
        assert w.shape == (14, 14, 3, 384)

    def test_missing_keys_raise(self):
        with pytest.raises(KeyError, match="missing"):
            dv.load_torch_state_dict({"cls_token":
                                      np.zeros((1, 1, 384), np.float32)},
                                     arch="vits14")
