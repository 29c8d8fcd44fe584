"""StyleGAN-V FVD detector: TorchScript converter + gating preprocessing.

Round-trips a TorchScript archive built from the reference's own
InceptionI3d (video_metrics/fvd/videogpt/pytorch_i3d.py — the same
Inception-v1 I3D graph inside the StyleGAN-V ``i3d_torchscript.pt``) with
random weights, and pins the gating preprocessing against a torch golden
of my_metrics.py:58-69.
"""

import importlib.util
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from zigma_tpu.convert.torchscript_i3d import convert_torchscript_i3d
from zigma_tpu.metrics import i3d_jax

REFERENCE = "/root/reference"


def _load_ref_i3d_module():
    src = os.path.join(REFERENCE, "video_metrics", "fvd", "videogpt",
                       "pytorch_i3d.py")
    if not os.path.exists(src):
        return None
    spec = importlib.util.spec_from_file_location("ref_pytorch_i3d", src)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception:
        return None
    return mod


refmod = _load_ref_i3d_module()


def _random_ref_model(seed=0):
    model = refmod.InceptionI3d(num_classes=i3d_jax.NUM_CLASSES,
                                in_channels=3).eval()
    rng = np.random.default_rng(seed)
    sd = model.state_dict()
    new = {}
    for k, v in sd.items():
        if k.endswith("running_var"):
            new[k] = torch.from_numpy(
                (np.abs(rng.standard_normal(tuple(v.shape))) + 0.5)
                .astype(np.float32))
        elif v.dtype.is_floating_point:
            scale = 0.3 / np.sqrt(max(1, int(np.prod(v.shape[1:]))))
            new[k] = torch.from_numpy(
                (rng.standard_normal(tuple(v.shape)) * scale)
                .astype(np.float32))
        else:
            new[k] = v
    model.load_state_dict(new)
    return model


@pytest.mark.skipif(refmod is None, reason="reference I3D not importable")
class TestTorchscriptConverter:
    def test_roundtrip_matches_torch_forward(self, tmp_path):
        """jit.trace -> save -> convert -> i3d_logits == torch forward."""
        model = _random_ref_model()
        x = torch.from_numpy(np.random.default_rng(1).standard_normal(
            (1, 3, 16, 224, 224)).astype(np.float32) * 0.5)
        with torch.no_grad():
            traced = torch.jit.trace(model, x)
            want = traced(x).numpy()
        path = str(tmp_path / "i3d_torchscript.pt")
        traced.save(path)

        params = convert_torchscript_i3d(path)
        got = np.asarray(i3d_jax.i3d_logits(params, jnp.asarray(x.numpy())))
        assert got.shape == want.shape == (1, i3d_jax.NUM_CLASSES)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_order_fallback_handles_renamed_keys(self):
        """Gibberish names, preserved order -> same converted tree."""
        model = _random_ref_model(seed=2)
        sd = {k: v for k, v in model.state_dict().items()}
        by_name = convert_torchscript_i3d(sd)
        renamed = {f"opaque.{i:03d}": v for i, (k, v) in enumerate(sd.items())}
        by_order = convert_torchscript_i3d(renamed)
        for unit in by_name:
            for field in by_name[unit]:
                np.testing.assert_array_equal(
                    np.asarray(by_name[unit][field]),
                    np.asarray(by_order[unit][field]),
                    err_msg=f"{unit}.{field}")

    def test_non_i3d_archive_raises(self):
        with pytest.raises((KeyError, ValueError)):
            convert_torchscript_i3d(
                {"a.weight": np.zeros((4, 4, 3, 3, 3), np.float32)})


class TestGatingPreprocess:
    def test_matches_reference_feed(self):
        """styleganv_gating_preprocess == my_metrics.py:58-69 + the
        torchmetric_fvd.py:373 permute, bit for bit in semantics."""
        rng = np.random.default_rng(3)
        B, T, H, W = 2, 4, 37, 61
        videos = rng.integers(0, 256, (B, T, H, W, 3), dtype=np.uint8)

        # torch golden: (b t) c h w float -> interpolate(224) -> b t h w c
        # -> permute(0, 4, 1, 2, 3); values stay in [0, 255]
        data = torch.from_numpy(
            videos.transpose(0, 1, 4, 2, 3).reshape(B * T, 3, H, W)).float()
        data = torch.nn.functional.interpolate(
            data, size=(224, 224), mode="bilinear", align_corners=False)
        data = data.reshape(B, T, 3, 224, 224).permute(0, 1, 3, 4, 2)
        want = data.permute(0, 4, 1, 2, 3).numpy()

        got = np.asarray(i3d_jax.styleganv_gating_preprocess(videos))
        assert got.shape == want.shape == (B, 3, T, 224, 224)
        assert got.max() > 200.0  # the quirk: values are NOT rescaled
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


class TestFlavorPinning:
    def test_custom_extractor_flavor_in_keys(self):
        from zigma_tpu.metrics import VideoMetric

        ex = lambda v: np.asarray(v, np.float32).reshape(v.shape[0], -1)[:, :7]
        m = VideoMetric(extractor=ex)
        assert m.flavor == "custom"
        rng = np.random.default_rng(0)
        m.update_real(rng.standard_normal((8, 2, 2, 4, 4)))
        m.update_fake(rng.standard_normal((8, 2, 2, 4, 4)))
        out = m.compute(sync=False)
        assert "fvd" in out and "fvd_custom" in out
        assert out["fvd"] == out["fvd_custom"]

    def test_unknown_flavor_raises(self):
        from zigma_tpu.metrics import VideoMetric

        with pytest.raises(ValueError, match="flavor"):
            VideoMetric(flavor="tfhub")

    def test_missing_weights_raise_with_guidance(self):
        from zigma_tpu.metrics import VideoMetric

        # no i3d weights are cached in this environment: an explicit
        # flavor request must fail loudly, not degrade silently
        with pytest.raises(RuntimeError, match="unavailable"):
            VideoMetric(flavor="videogpt")
