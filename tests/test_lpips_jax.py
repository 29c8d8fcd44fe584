"""Native JAX LPIPS vs a torch golden composition with shared weights
(mirrors the lpips package's alex pipeline used by the reference,
video_metrics/calculate_lpips.py:12,58)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from zigma_tpu.metrics import lpips_jax as lp


def _torch_lpips(params, img0, img1):
    """Golden: the lpips-package pipeline from torch.nn.functional ops."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = (x - shift) / scale
        taps = []
        for i, (_, _, k, s, p) in enumerate(lp._ALEX):
            if i in (1, 2):
                x = F.max_pool2d(x, 3, 2)
            w = torch.from_numpy(np.transpose(
                np.asarray(params[f"conv{i}"]["w"]), (3, 2, 0, 1)).copy())
            b = torch.from_numpy(np.asarray(params[f"conv{i}"]["b"]))
            x = F.relu(F.conv2d(x, w, b, stride=s, padding=p))
            taps.append(x)
        return taps

    t0, t1 = feats(img0), feats(img1)
    total = torch.zeros(img0.shape[0])
    for i, (f0, f1) in enumerate(zip(t0, t1)):
        n0 = f0 / torch.sqrt((f0 ** 2).sum(1, keepdim=True) + 1e-10)
        n1 = f1 / torch.sqrt((f1 ** 2).sum(1, keepdim=True) + 1e-10)
        d = (n0 - n1) ** 2
        w = torch.from_numpy(np.asarray(params[f"lin{i}"]["w"])).view(
            1, -1, 1, 1)
        total = total + (d * w).sum(1).mean(dim=(1, 2))
    return total


class TestLpips:
    @pytest.fixture(scope="class")
    def params(self):
        return lp.random_params(seed=0)

    def test_matches_torch_golden(self, params):
        rng = np.random.default_rng(0)
        a = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
        b = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
        ours = np.asarray(lp.lpips(params, jnp.asarray(a), jnp.asarray(b)))
        theirs = _torch_lpips(params, torch.from_numpy(a),
                              torch.from_numpy(b)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_identity_is_zero(self, params):
        a = np.random.default_rng(1).uniform(
            -1, 1, (2, 3, 32, 32)).astype(np.float32)
        d = np.asarray(lp.lpips(params, jnp.asarray(a), jnp.asarray(a)))
        np.testing.assert_allclose(d, 0.0, atol=1e-6)

    def test_video_contract(self, params):
        rng = np.random.default_rng(2)
        v0 = rng.uniform(0, 1, (2, 3, 3, 32, 32)).astype(np.float32)
        v1 = rng.uniform(0, 1, (2, 3, 3, 32, 32)).astype(np.float32)
        d = np.asarray(lp.lpips_video(params, jnp.asarray(v0),
                                      jnp.asarray(v1)))
        assert d.shape == (2,)
        assert (d > 0).all() and np.isfinite(d).all()
        # frame-mean definition (calculate_lpips.py:46-58)
        per_frame = np.asarray(lp.lpips(
            params,
            jnp.asarray(v0.reshape(6, 3, 32, 32) * 2 - 1),
            jnp.asarray(v1.reshape(6, 3, 32, 32) * 2 - 1)))
        np.testing.assert_allclose(d, per_frame.reshape(2, 3).mean(1),
                                   rtol=1e-5, atol=1e-6)


class TestConverter:
    def test_roundtrip_and_layouts(self):
        rng = np.random.default_rng(3)
        alex_sd, lpips_sd = {}, {}
        feature_idx = [0, 3, 6, 8, 10]
        for i, fi in enumerate(feature_idx):
            kh, kw, cin, cout = lp.param_shapes()[f"conv{i}"]["w"]
            alex_sd[f"features.{fi}.weight"] = rng.standard_normal(
                (cout, cin, kh, kw)).astype(np.float32) * 0.05
            alex_sd[f"features.{fi}.bias"] = np.zeros(cout, np.float32)
        for i, c in enumerate(lp._CHANNELS):
            lpips_sd[f"lin{i}.model.1.weight"] = np.abs(
                rng.standard_normal((1, c, 1, 1))).astype(np.float32)
        params = lp.load_torch_state_dicts(alex_sd, lpips_sd)
        assert set(params) == set(lp.param_shapes())
        w = np.asarray(params["conv0"]["w"])
        np.testing.assert_allclose(
            w, np.transpose(alex_sd["features.0.weight"], (2, 3, 1, 0)))

    def test_missing_keys_raise(self):
        with pytest.raises(KeyError):
            lp.load_torch_state_dicts({}, {})


class TestPerTimestep:
    def test_reference_dict_layout(self):
        params = lp.random_params(seed=0)
        rng = np.random.default_rng(4)
        v0 = rng.uniform(0, 1, (2, 3, 3, 32, 32)).astype(np.float32)
        v1 = rng.uniform(0, 1, (2, 3, 3, 32, 32)).astype(np.float32)
        out = lp.lpips_per_timestep(params, v0, v1)
        assert set(out) == {"value", "value_std", "mean", "std"}
        assert set(out["value"]) == {0, 1, 2}
        # global mean equals the mean of per-timestep means
        np.testing.assert_allclose(
            out["mean"], np.mean(list(out["value"].values())), rtol=1e-6)
        # consistent with lpips_video's frame mean
        per_video = np.asarray(lp.lpips_video(
            params, jnp.asarray(v0), jnp.asarray(v1)))
        np.testing.assert_allclose(out["mean"], per_video.mean(), rtol=1e-5)
