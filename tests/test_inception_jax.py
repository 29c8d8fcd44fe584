"""Native JAX FID-InceptionV3: numerics vs torch CPU, graph shapes, converter.

The golden models here are built from ``torch.nn.functional`` primitives with
the SAME random weights, mirroring the torch-fidelity block definitions the
reference metrics depend on (reference: utils/torchmetric_sfid.py:63-170).
"""

import zlib

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from zigma_tpu.metrics import inception_jax as inc


def _rand(*shape, seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32) * scale


def _torch_conv_bn(x, p, stride, pad, eps=1e-3):
    """torch golden: conv(bias=False) + inference BN + relu, NCHW."""
    w = torch.from_numpy(np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)))
    y = F.conv2d(x, w, stride=stride, padding=pad)
    y = F.batch_norm(
        y, torch.from_numpy(np.asarray(p["bn_mean"])),
        torch.from_numpy(np.asarray(p["bn_var"])),
        torch.from_numpy(np.asarray(p["bn_scale"])),
        torch.from_numpy(np.asarray(p["bn_bias"])),
        training=False, eps=eps)
    return F.relu(y)


def _params_for(spec, seed=0):
    cin, cout, (kh, kw), _, _ = spec
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(_rand(kh, kw, cin, cout, seed=seed)),
        "bn_scale": jnp.asarray(_rand(cout, seed=seed + 1, scale=1.0)),
        "bn_bias": jnp.asarray(_rand(cout, seed=seed + 2)),
        "bn_mean": jnp.asarray(_rand(cout, seed=seed + 3)),
        "bn_var": jnp.asarray(
            np.abs(rng.standard_normal(cout)).astype(np.float32) + 0.5),
    }


class TestPrimitives:
    @pytest.mark.parametrize("spec", [
        (3, 8, (3, 3), (2, 2), (0, 0)),       # stride-2 stem conv
        (5, 7, (1, 7), (1, 1), (0, 3)),       # asymmetric 1x7
        (5, 7, (7, 1), (1, 1), (3, 0)),       # asymmetric 7x1
        (4, 6, (5, 5), (1, 1), (2, 2)),       # 5x5 pad 2
    ])
    def test_conv_bn_matches_torch(self, spec):
        cin = spec[0]
        x = _rand(2, 13, 13, cin, seed=42)
        p = _params_for(spec, seed=7)
        ours = np.asarray(inc._conv_bn(jnp.asarray(x), p, spec))
        theirs = _torch_conv_bn(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), p,
            stride=spec[3], pad=spec[4]).numpy()
        np.testing.assert_allclose(
            ours, np.transpose(theirs, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4)

    def test_avg_pool_count_include_pad_false(self):
        x = _rand(2, 9, 9, 5, seed=1)
        ours = np.asarray(inc._avg_pool_nopad(jnp.asarray(x)))
        theirs = F.avg_pool2d(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), 3, stride=1,
            padding=1, count_include_pad=False).numpy()
        np.testing.assert_allclose(
            ours, np.transpose(theirs, (0, 2, 3, 1)), rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("k,s,pad", [(3, 2, 0), (3, 1, 1)])
    def test_max_pool(self, k, s, pad):
        x = _rand(2, 11, 11, 4, seed=2)
        ours = np.asarray(inc._max_pool(jnp.asarray(x), k=k, s=s, pad=pad))
        theirs = F.max_pool2d(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), k, stride=s,
            padding=pad).numpy()
        np.testing.assert_allclose(
            ours, np.transpose(theirs, (0, 2, 3, 1)), rtol=1e-6, atol=1e-6)

    def test_tf1_resize_matches_reference_formula(self):
        """Independent numpy reference of TF1 align_corners=False bilinear
        (the torch-fidelity interpolate_bilinear_2d_like_tensorflow1x
        contract): src = dst * (in/out), floor corner, fractional lerp."""
        rng = np.random.default_rng(3)
        x = rng.standard_normal((1, 17, 23, 2)).astype(np.float32)
        out = 29
        H, W = x.shape[1:3]

        def ref_1d(arr, in_size, axis):
            scale = in_size / out
            res_shape = list(arr.shape)
            res_shape[axis] = out
            res = np.zeros(res_shape, np.float64)
            for d in range(out):
                src = d * scale
                lo = min(int(np.floor(src)), in_size - 1)
                hi = min(lo + 1, in_size - 1)
                f = src - lo
                a = np.take(arr, lo, axis=axis)
                b = np.take(arr, hi, axis=axis)
                idx = [slice(None)] * res.ndim
                idx[axis] = d
                res[tuple(idx)] = a + (b - a) * f
            return res

        expected = ref_1d(ref_1d(x.astype(np.float64), H, 1), W, 2)
        got = np.asarray(inc.tf1_bilinear_resize(jnp.asarray(x), out))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_tf1_resize_identity_at_same_size(self):
        x = _rand(1, 299, 299, 3, seed=4)
        got = np.asarray(inc.tf1_bilinear_resize(jnp.asarray(x), 299))
        np.testing.assert_allclose(got, x, rtol=1e-6, atol=1e-6)


class TestBlocks:
    """Whole inception blocks vs torch compositions with shared weights."""

    def _np(self, t):
        return np.transpose(t.numpy(), (0, 2, 3, 1))

    def _tx(self, x):
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    def test_inception_a(self):
        prefix, cin, pool = "Mixed_5b", 192, 32
        specs = {k: v for k, v in inc.CONV_SPECS.items()
                 if k.startswith(prefix)}
        params = {k: _params_for(v, seed=zlib.crc32(k.encode()) % 1000)
                  for k, v in specs.items()}
        x = _rand(1, 9, 9, cin, seed=5)
        ours = np.asarray(inc._block_a(params, prefix, jnp.asarray(x)))

        tx = self._tx(x)

        def cb(name, t):
            s = specs[name]
            return _torch_conv_bn(t, params[name], stride=s[3], pad=s[4])

        b1 = cb(f"{prefix}.branch1x1", tx)
        b5 = cb(f"{prefix}.branch5x5_2", cb(f"{prefix}.branch5x5_1", tx))
        bd = cb(f"{prefix}.branch3x3dbl_3",
                cb(f"{prefix}.branch3x3dbl_2",
                   cb(f"{prefix}.branch3x3dbl_1", tx)))
        bp = cb(f"{prefix}.branch_pool",
                F.avg_pool2d(tx, 3, 1, 1, count_include_pad=False))
        theirs = torch.cat([b1, b5, bd, bp], dim=1)
        np.testing.assert_allclose(ours, self._np(theirs),
                                   rtol=1e-4, atol=1e-4)
        assert ours.shape[-1] == 224 + pool

    def test_inception_e2_maxpool_branch(self):
        """Mixed_7c is the FID E_2 variant: MAX pool in the pool branch."""
        prefix, cin = "Mixed_7c", 2048
        specs = {k: v for k, v in inc.CONV_SPECS.items()
                 if k.startswith(prefix)}
        params = {k: _params_for(v, seed=zlib.crc32(k.encode()) % 1000)
                  for k, v in specs.items()}
        x = _rand(1, 5, 5, cin, seed=6, scale=0.2)
        ours = np.asarray(inc._block_e(params, prefix, jnp.asarray(x),
                                       pool="max"))
        tx = self._tx(x)

        def cb(name, t):
            s = specs[name]
            return _torch_conv_bn(t, params[name], stride=s[3], pad=s[4])

        b1 = cb(f"{prefix}.branch1x1", tx)
        b3 = cb(f"{prefix}.branch3x3_1", tx)
        b3 = torch.cat([cb(f"{prefix}.branch3x3_2a", b3),
                        cb(f"{prefix}.branch3x3_2b", b3)], dim=1)
        bd = cb(f"{prefix}.branch3x3dbl_2", cb(f"{prefix}.branch3x3dbl_1", tx))
        bd = torch.cat([cb(f"{prefix}.branch3x3dbl_3a", bd),
                        cb(f"{prefix}.branch3x3dbl_3b", bd)], dim=1)
        bp = cb(f"{prefix}.branch_pool", F.max_pool2d(tx, 3, 1, 1))
        theirs = torch.cat([b1, b3, bd, bp], dim=1)
        # random BN stats amplify fp32 accumulation error through the
        # two-deep 448->384 conv chain; real (trained) stats are tame
        np.testing.assert_allclose(ours, self._np(theirs),
                                   rtol=5e-3, atol=5e-3)
        assert ours.shape[-1] == 2048


class TestFullGraph:
    @pytest.fixture(scope="class")
    def params(self):
        return inc.random_params(seed=0)

    def test_feature_shapes(self, params):
        x = jnp.asarray(np.random.default_rng(0).integers(
            0, 256, (2, 3, 64, 64), np.uint8))
        feats = inc.inception_forward(params, x,
                                      features=inc.FEATURE_NAMES)
        assert feats["64"].shape == (2, 64)
        assert feats["192"].shape == (2, 192)
        assert feats["768"].shape == (2, 7 * 17 * 17)
        assert feats["2048"].shape == (2, 2048)
        assert feats["logits_unbiased"].shape == (2, inc.NUM_CLASSES)
        for v in feats.values():
            assert np.isfinite(np.asarray(v)).all()

    def test_extractor_callable(self, params):
        ex = inc.inception_extractor(params, feature="2048", batch=2)
        imgs = np.random.default_rng(1).integers(
            0, 256, (3, 3, 32, 32), np.uint8)
        f = ex(imgs)
        assert f.shape == (3, 2048)
        # batching must not change values
        f1 = inc.inception_extractor(params, feature="2048", batch=8)(imgs)
        np.testing.assert_allclose(f, f1, rtol=1e-5, atol=1e-5)

    def test_facade_integration(self, params):
        from zigma_tpu.metrics import MyMetric

        m = MyMetric(choices=["fid", "is"],
                     extractor=inc.inception_extractor(params, batch=4),
                     logits_extractor=inc.inception_extractor(
                         params, feature="logits_unbiased", batch=4))
        rng = np.random.default_rng(2)
        m.update_real(rng.integers(0, 256, (8, 3, 32, 32), np.uint8))
        m.update_fake(rng.integers(0, 256, (8, 3, 32, 32), np.uint8))
        out = m.compute(sync=False)
        assert np.isfinite(out["fid"]) and np.isfinite(out["is"])


class TestConverter:
    def test_roundtrip_equivalence(self):
        """torch-layout state dict -> JAX tree -> same forward as a tree
        built directly with those weights."""
        rng = np.random.default_rng(9)
        sd = {}
        for name, sh in inc.param_shapes().items():
            if name == "fc":
                sd["fc.weight"] = rng.standard_normal(sh["w"]).astype(
                    np.float32) * 0.05
                sd["fc.bias"] = np.zeros(sh["b"], np.float32)
                continue
            kh, kw, cin, cout = sh["w"]
            sd[f"{name}.conv.weight"] = rng.standard_normal(
                (cout, cin, kh, kw)).astype(np.float32) * 0.05
            sd[f"{name}.bn.weight"] = np.ones(cout, np.float32)
            sd[f"{name}.bn.bias"] = np.zeros(cout, np.float32)
            sd[f"{name}.bn.running_mean"] = np.zeros(cout, np.float32)
            sd[f"{name}.bn.running_var"] = np.ones(cout, np.float32)
            sd[f"{name}.bn.num_batches_tracked"] = np.int64(0)
        params = inc.load_torch_state_dict(sd)
        x = jnp.asarray(rng.integers(0, 256, (1, 3, 37, 41), np.uint8))
        f = inc.inception_forward(params, x, features=("2048",))["2048"]
        assert f.shape == (1, 2048)
        # conv layout: HWIO after transpose from OIHW
        w = np.asarray(params["Conv2d_1a_3x3"]["w"])
        np.testing.assert_allclose(
            w, np.transpose(sd["Conv2d_1a_3x3.conv.weight"], (2, 3, 1, 0)))

    def test_missing_keys_raise(self):
        with pytest.raises(KeyError, match="missing"):
            inc.load_torch_state_dict({"Conv2d_1a_3x3.conv.weight":
                                       np.zeros((32, 3, 3, 3), np.float32)})

    def test_base_prefix_stripped(self):
        rng = np.random.default_rng(10)
        sd = {}
        for name, sh in inc.param_shapes().items():
            if name == "fc":
                sd["base.fc.weight"] = np.zeros(sh["w"], np.float32)
                continue
            kh, kw, cin, cout = sh["w"]
            sd[f"base.{name}.conv.weight"] = np.zeros(
                (cout, cin, kh, kw), np.float32)
            for tail, s in (("weight", cout), ("bias", cout),
                            ("running_mean", cout), ("running_var", cout)):
                sd[f"base.{name}.bn.{tail}"] = np.ones(s, np.float32)
        params = inc.load_torch_state_dict(sd)
        assert set(params) == set(inc.param_shapes())
