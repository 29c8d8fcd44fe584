"""Native JAX InceptionI3d: numerics vs torch CPU, preprocessing, converter.

Golden models are torch.nn.functional compositions with shared weights,
mirroring the reference pytorch_i3d definitions
(reference: video_metrics/fvd/videogpt/pytorch_i3d.py, fvd.py:21-60).
"""

import zlib

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from zigma_tpu.metrics import i3d_jax as i3d


def _rand(*shape, seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32) * scale


def _params_for(spec, seed=0):
    cin, cout, (kt, kh, kw), _ = spec
    return {
        "w": jnp.asarray(_rand(kt, kh, kw, cin, cout, seed=seed,
                               scale=1.0 / np.sqrt(kt * kh * kw * cin))),
        "bn_scale": jnp.asarray(1.0 + _rand(cout, seed=seed + 1, scale=0.2)),
        "bn_bias": jnp.asarray(_rand(cout, seed=seed + 2, scale=0.2)),
        "bn_mean": jnp.asarray(_rand(cout, seed=seed + 3, scale=0.2)),
        "bn_var": jnp.asarray(np.abs(_rand(cout, seed=seed + 4)) + 0.5),
    }


def _tf_same_pad(size, k, s):
    """The reference compute_pad (pytorch_i3d.py:9-13)."""
    pad = max(k - s, 0) if size % s == 0 else max(k - (size % s), 0)
    return pad // 2, pad - pad // 2


def _torch_unit3d(x, p, spec, eps=1e-5):
    """torch golden Unit3D: TF-same pad + conv3d(bias=False) + BN + relu.
    x: (B, C, T, H, W)."""
    _, _, kernel, stride = spec
    pads = [_tf_same_pad(x.shape[2 + i], kernel[i], stride[i])
            for i in range(3)]
    # F.pad order: (w_f, w_b, h_f, h_b, t_f, t_b)
    x = F.pad(x, (pads[2][0], pads[2][1], pads[1][0], pads[1][1],
                  pads[0][0], pads[0][1]))
    w = torch.from_numpy(
        np.transpose(np.asarray(p["w"]), (4, 3, 0, 1, 2)).copy())
    y = F.conv3d(x, w, stride=stride)
    y = F.batch_norm(
        y, torch.from_numpy(np.asarray(p["bn_mean"])),
        torch.from_numpy(np.asarray(p["bn_var"])),
        torch.from_numpy(np.asarray(p["bn_scale"])),
        torch.from_numpy(np.asarray(p["bn_bias"])),
        training=False, eps=eps)
    return F.relu(y)


def _torch_maxpool_same(x, kernel, stride):
    pads = [_tf_same_pad(x.shape[2 + i], kernel[i], stride[i])
            for i in range(3)]
    x = F.pad(x, (pads[2][0], pads[2][1], pads[1][0], pads[1][1],
                  pads[0][0], pads[0][1]))
    return F.max_pool3d(x, kernel, stride)


def _to_torch(x_ndhwc):
    return torch.from_numpy(np.transpose(x_ndhwc, (0, 4, 1, 2, 3)).copy())


def _to_np(t_ncthw):
    return np.transpose(t_ncthw.numpy(), (0, 2, 3, 4, 1))


class TestUnit3D:
    @pytest.mark.parametrize("spec", [
        (3, 8, (7, 7, 7), (2, 2, 2)),    # stem: stride-2 7x7x7 same-pad
        (4, 6, (3, 3, 3), (1, 1, 1)),    # 3x3x3 stride 1
        (5, 7, (1, 1, 1), (1, 1, 1)),    # pointwise
    ])
    def test_matches_torch(self, spec):
        x = _rand(2, 9, 11, 11, spec[0], seed=3)   # odd sizes stress SAME
        p = _params_for(spec, seed=11)
        ours = np.asarray(i3d._unit3d(jnp.asarray(x), p, spec))
        theirs = _torch_unit3d(_to_torch(x), p, spec)
        np.testing.assert_allclose(ours, _to_np(theirs),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("kernel,stride", [
        ((1, 3, 3), (1, 2, 2)), ((3, 3, 3), (2, 2, 2)),
        ((2, 2, 2), (2, 2, 2)), ((3, 3, 3), (1, 1, 1)),
    ])
    def test_maxpool_same(self, kernel, stride):
        # post-ReLU inputs (the real regime: zero-pad == -inf-pad)
        x = np.abs(_rand(2, 8, 10, 10, 4, seed=4))
        ours = np.asarray(i3d._max_pool_same(jnp.asarray(x), kernel, stride))
        theirs = _torch_maxpool_same(_to_torch(x), kernel, stride)
        np.testing.assert_allclose(ours, _to_np(theirs),
                                   rtol=1e-6, atol=1e-6)


class TestMixedBlock:
    def test_inception_module_matches_torch(self):
        prefix = "Mixed_3b"
        specs = {k: v for k, v in i3d.UNIT_SPECS.items()
                 if k.startswith(prefix)}
        params = {k: _params_for(v, seed=zlib.crc32(k.encode()) % 1000)
                  for k, v in specs.items()}
        cin = specs[f"{prefix}.b0"][0]
        x = _rand(1, 6, 7, 7, cin, seed=5, scale=0.3)
        ours = np.asarray(i3d._mixed(params, prefix, jnp.asarray(x)))

        tx = _to_torch(x)
        b0 = _torch_unit3d(tx, params[f"{prefix}.b0"], specs[f"{prefix}.b0"])
        b1 = _torch_unit3d(tx, params[f"{prefix}.b1a"],
                           specs[f"{prefix}.b1a"])
        b1 = _torch_unit3d(b1, params[f"{prefix}.b1b"],
                           specs[f"{prefix}.b1b"])
        b2 = _torch_unit3d(tx, params[f"{prefix}.b2a"],
                           specs[f"{prefix}.b2a"])
        b2 = _torch_unit3d(b2, params[f"{prefix}.b2b"],
                           specs[f"{prefix}.b2b"])
        b3 = _torch_maxpool_same(tx, (3, 3, 3), (1, 1, 1))
        b3 = _torch_unit3d(b3, params[f"{prefix}.b3b"],
                           specs[f"{prefix}.b3b"])
        theirs = torch.cat([b0, b1, b2, b3], dim=1)
        np.testing.assert_allclose(ours, _to_np(theirs),
                                   rtol=1e-3, atol=1e-3)
        assert ours.shape[-1] == 256


class TestPreprocess:
    def test_resize_matches_torch_interpolate(self):
        """half-pixel bilinear (no antialias) == torch align_corners=False."""
        rng = np.random.default_rng(6)
        x = rng.standard_normal((2, 3, 17, 23, 2)).astype(np.float32)
        got = np.asarray(i3d.torch_bilinear_resize(jnp.asarray(x), 11, 29))
        # torch path: (B*T, C, H, W)
        t = torch.from_numpy(
            np.transpose(x.reshape(-1, 17, 23, 2), (0, 3, 1, 2)).copy())
        want = F.interpolate(t, size=(11, 29), mode="bilinear",
                             align_corners=False)
        want = np.transpose(want.numpy(), (0, 2, 3, 1)).reshape(2, 3, 11, 29, 2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_fvd_preprocess_contract(self):
        """Mirrors fvd.py preprocess_single: shorter-side resize to res,
        center crop, [-1,1], CTHW layout."""
        vids = np.random.default_rng(7).integers(
            0, 256, (2, 4, 36, 48, 3), np.uint8)
        out = np.asarray(i3d.fvd_preprocess(vids, resolution=32))
        assert out.shape == (2, 3, 4, 32, 32)
        assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
        # torch golden for one video
        v = torch.from_numpy(vids[0]).permute(0, 3, 1, 2).float() / 255.0
        scale = 32 / 36
        v = F.interpolate(v, size=(32, int(np.ceil(48 * scale))),
                          mode="bilinear", align_corners=False)
        w0 = (v.shape[-1] - 32) // 2
        v = v[:, :, :, w0:w0 + 32]
        v = (v.permute(1, 0, 2, 3) - 0.5) * 2
        np.testing.assert_allclose(out[0], v.numpy(), rtol=1e-4, atol=1e-4)


class TestFullGraph:
    @pytest.fixture(scope="class")
    def params(self):
        return i3d.random_params(seed=0)

    def test_logit_shape_and_variance(self, params):
        vids = np.random.default_rng(8).integers(
            0, 256, (2, 16, 64, 64, 3), np.uint8)
        x = i3d.fvd_preprocess(vids, resolution=64)
        logits = np.asarray(i3d.i3d_logits(params, x))
        assert logits.shape == (2, i3d.NUM_CLASSES)
        assert np.isfinite(logits).all()
        # random-params net must not collapse to constant features
        assert logits.std(axis=0).max() > 1e-4

    def test_extractor_and_video_metric(self, params):
        from zigma_tpu.metrics import VideoMetric

        ex = i3d.i3d_extractor(params, batch=2, resolution=64)
        m = VideoMetric(extractor=ex)
        rng = np.random.default_rng(9)
        m.update_real(rng.integers(0, 256, (4, 16, 64, 64, 3), np.uint8))
        m.update_fake(rng.integers(0, 256, (4, 16, 64, 64, 3), np.uint8))
        out = m.compute(sync=False)
        assert np.isfinite(out["fvd"])


class TestConverter:
    def _state_dict(self, prefix=""):
        rng = np.random.default_rng(10)
        sd = {}
        for name, sh in i3d.param_shapes().items():
            if name == "logits":
                kt, kh, kw, cin, cout = sh["w"]
                sd[f"{prefix}logits.conv3d.weight"] = rng.standard_normal(
                    (cout, cin, kt, kh, kw)).astype(np.float32) * 0.02
                sd[f"{prefix}logits.conv3d.bias"] = np.zeros(
                    cout, np.float32)
                continue
            kt, kh, kw, cin, cout = sh["w"]
            sd[f"{prefix}{name}.conv3d.weight"] = rng.standard_normal(
                (cout, cin, kt, kh, kw)).astype(np.float32) * 0.02
            sd[f"{prefix}{name}.bn.weight"] = np.ones(cout, np.float32)
            sd[f"{prefix}{name}.bn.bias"] = np.zeros(cout, np.float32)
            sd[f"{prefix}{name}.bn.running_mean"] = np.zeros(
                cout, np.float32)
            sd[f"{prefix}{name}.bn.running_var"] = np.ones(cout, np.float32)
            sd[f"{prefix}{name}.bn.num_batches_tracked"] = np.int64(0)
        return sd

    def test_roundtrip(self):
        params = i3d.load_torch_state_dict(self._state_dict())
        assert set(params) == set(i3d.param_shapes())
        w = np.asarray(params["Conv3d_1a_7x7"]["w"])
        assert w.shape == (7, 7, 7, 3, 64)

    def test_dataparallel_prefix(self):
        params = i3d.load_torch_state_dict(self._state_dict("module."))
        assert set(params) == set(i3d.param_shapes())

    def test_missing_keys_raise(self):
        with pytest.raises(KeyError, match="missing"):
            i3d.load_torch_state_dict(
                {"Conv3d_1a_7x7.conv3d.weight":
                 np.zeros((64, 3, 7, 7, 7), np.float32)})
