"""Native JAX SD-VAE: block numerics vs torch goldens, structure, converter
(reference codec: train_acc.py:229-241, sample_acc.py:365)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from zigma_tpu.data import vae_jax as vj


def _rand(*shape, seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32) * scale


def _t(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def _n(t_nchw):
    return np.transpose(t_nchw.numpy(), (0, 2, 3, 1))


def _torch_gn(x, p, groups, eps=1e-6):
    return F.group_norm(x, groups,
                        torch.from_numpy(np.asarray(p["scale"])),
                        torch.from_numpy(np.asarray(p["bias"])), eps)


def _torch_conv(x, p, stride=1, pad=1):
    w = torch.from_numpy(np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)).copy())
    b = torch.from_numpy(np.asarray(p["b"]))
    if isinstance(pad, (list, tuple)):
        x = F.pad(x, (pad[1][0], pad[1][1], pad[0][0], pad[0][1]))
        return F.conv2d(x, w, b, stride=stride)
    return F.conv2d(x, w, b, stride=stride, padding=pad)


class TestBlocks:
    def test_group_norm(self):
        x = _rand(2, 6, 6, 8, seed=1)
        p = {"scale": jnp.asarray(_rand(8, seed=2, scale=1.0)),
             "bias": jnp.asarray(_rand(8, seed=3))}
        got = np.asarray(vj._group_norm(jnp.asarray(x), p, groups=4))
        want = _n(_torch_gn(_t(x), p, 4))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_resnet_block_with_shortcut(self):
        params = vj.random_params(seed=0, scale=4)
        p = params["decoder"]["up2_res0"]  # channel-changing resnet
        cin = p["conv1"]["w"].shape[2]
        x = _rand(1, 5, 5, cin, seed=4)
        got = np.asarray(vj._resnet(jnp.asarray(x), p))

        tx = _t(x)
        h = _torch_conv(F.silu(_torch_gn(tx, p["norm1"], 32)), p["conv1"])
        h2 = _torch_conv(F.silu(_torch_gn(h, p["norm2"], 32)), p["conv2"])
        want = _n(_torch_conv(tx, p["shortcut"], pad=0) + h2)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_attn_block(self):
        params = vj.random_params(seed=0, scale=4)
        p = params["decoder"]["mid"]["attn"]
        C = p["q"]["w"].shape[0]
        x = _rand(1, 4, 4, C, seed=5)
        got = np.asarray(vj._attn(jnp.asarray(x), p))

        tx = _t(x)
        h = _torch_gn(tx, p["norm"], 32)
        B, Ct, H, W = h.shape
        hf = h.permute(0, 2, 3, 1).reshape(B, H * W, Ct)

        def lin(name, v):
            return v @ torch.from_numpy(np.asarray(p[name]["w"])) + \
                torch.from_numpy(np.asarray(p[name]["b"]))

        q, k, v = lin("q", hf), lin("k", hf), lin("v", hf)
        att = torch.softmax(q @ k.transpose(1, 2) / np.sqrt(Ct), dim=-1)
        out = lin("proj", att @ v).reshape(B, H, W, Ct).permute(0, 3, 1, 2)
        want = _n(tx + out)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_downsample_asymmetric_pad(self):
        """diffusers Downsample2D pads (0,1)x(0,1) then stride-2 convs."""
        params = vj.random_params(seed=0, scale=4)
        p = params["encoder"]["down0_conv"]
        cin = p["w"].shape[2]
        x = _rand(1, 8, 8, cin, seed=6)
        got = np.asarray(vj._conv(jnp.asarray(x), p, stride=2,
                                  pad=[(0, 1), (0, 1)]))
        want = _n(_torch_conv(_t(x), p, stride=2, pad=[(0, 1), (0, 1)]))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        assert got.shape[1] == 4  # 8 -> 4


class TestRoundtrip:
    @pytest.fixture(scope="class")
    def params(self):
        return vj.random_params(seed=0, scale=4)

    def test_encode_decode_shapes(self, params):
        imgs = jnp.asarray(_rand(2, 3, 32, 32, seed=7))
        z = vj.vae_encode(params, imgs)
        assert z.shape == (2, 4, 4, 4)
        out = vj.vae_decode(params, z)
        assert out.shape == (2, 3, 32, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_encode_sampling(self, params):
        import jax

        imgs = jnp.asarray(_rand(1, 3, 32, 32, seed=8))
        z_mean = vj.vae_encode(params, imgs)
        z_samp = vj.vae_encode(params, imgs, rng=jax.random.PRNGKey(0))
        assert np.abs(np.asarray(z_mean) - np.asarray(z_samp)).max() > 0


class TestConverter:
    def _sd(self, newer_attn=True):
        """Synthetic diffusers-layout AutoencoderKL state dict (full size
        names, tiny channels are impossible — shapes must be real SD)."""
        rng = np.random.default_rng(9)
        sd = {}

        def conv(prefix, cin, cout, k=3):
            sd[f"{prefix}.weight"] = rng.standard_normal(
                (cout, cin, k, k)).astype(np.float32) * 0.02
            sd[f"{prefix}.bias"] = np.zeros(cout, np.float32)

        def norm(prefix, c):
            sd[f"{prefix}.weight"] = np.ones(c, np.float32)
            sd[f"{prefix}.bias"] = np.zeros(c, np.float32)

        def res(prefix, cin, cout):
            norm(f"{prefix}.norm1", cin)
            conv(f"{prefix}.conv1", cin, cout)
            norm(f"{prefix}.norm2", cout)
            conv(f"{prefix}.conv2", cout, cout)
            if cin != cout:
                conv(f"{prefix}.conv_shortcut", cin, cout, k=1)

        def attn(prefix, c):
            norm(f"{prefix}.group_norm", c)
            names = (("to_q", "to_k", "to_v", "to_out.0") if newer_attn
                     else ("query", "key", "value", "proj_attn"))
            for nm in names:
                sd[f"{prefix}.{nm}.weight"] = rng.standard_normal(
                    (c, c)).astype(np.float32) * 0.02
                sd[f"{prefix}.{nm}.bias"] = np.zeros(c, np.float32)

        chs = list(vj.CHANNELS)
        conv("encoder.conv_in", 3, chs[0])
        cin = chs[0]
        for i, c in enumerate(chs):
            for j in range(2):
                res(f"encoder.down_blocks.{i}.resnets.{j}",
                    cin if j == 0 else c, c)
            if i < len(chs) - 1:
                conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c)
            cin = c
        res("encoder.mid_block.resnets.0", chs[-1], chs[-1])
        attn("encoder.mid_block.attentions.0", chs[-1])
        res("encoder.mid_block.resnets.1", chs[-1], chs[-1])
        norm("encoder.conv_norm_out", chs[-1])
        conv("encoder.conv_out", chs[-1], 8)
        conv("quant_conv", 8, 8, k=1)
        conv("post_quant_conv", 4, 4, k=1)
        dchs = chs[::-1]
        conv("decoder.conv_in", 4, dchs[0])
        res("decoder.mid_block.resnets.0", dchs[0], dchs[0])
        attn("decoder.mid_block.attentions.0", dchs[0])
        res("decoder.mid_block.resnets.1", dchs[0], dchs[0])
        cin = dchs[0]
        for i, c in enumerate(dchs):
            for j in range(3):
                res(f"decoder.up_blocks.{i}.resnets.{j}",
                    cin if j == 0 else c, c)
            if i < len(dchs) - 1:
                conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c)
            cin = c
        norm("decoder.conv_norm_out", dchs[-1])
        conv("decoder.conv_out", dchs[-1], 3)
        return sd

    @pytest.mark.parametrize("newer_attn", [True, False])
    def test_roundtrip_structure(self, newer_attn):
        params = vj.load_torch_state_dict(self._sd(newer_attn))
        assert set(params) == {"encoder", "decoder", "quant_conv",
                               "post_quant_conv"}
        # conv layout transposed to HWIO
        assert params["encoder"]["conv_in"]["w"].shape == (3, 3, 3, 128)
        # attention weights normalized to (in, out)
        assert params["decoder"]["mid"]["attn"]["q"]["w"].shape == (512, 512)

    def test_missing_keys_raise(self):
        with pytest.raises(KeyError, match="missing"):
            vj.load_torch_state_dict({"encoder.conv_in.weight":
                                      np.zeros((128, 3, 3, 3), np.float32)})
