"""Numerical cross-checks against the EXECUTABLE reference transport.

The strongest parity evidence available without release checkpoints: run
the reference's torch `transport/path.py` (CPU) and our JAX port on the
SAME inputs and compare every path/plan/conversion quantity numerically.
Skipped automatically when /root/reference is not present (these tests are
environment-bound, like test_paths' reference comparisons).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"


def _load_reference_path_module():
    src = os.path.join(REFERENCE, "transport", "path.py")
    if not os.path.exists(src):
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    spec = importlib.util.spec_from_file_location("ref_transport_path", src)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception:
        return None
    return mod


refmod = _load_reference_path_module()
pytestmark = pytest.mark.skipif(refmod is None,
                                reason="reference transport not importable")


def _pairs():
    import zigma_tpu.transport.path as ours

    return [
        (refmod.ICPlan(), ours.ICPlan()),
        (refmod.VPCPlan(), ours.VPCPlan()),
        (refmod.GVPCPlan(), ours.GVPCPlan()),
    ]


def _t_values():
    # interior times; endpoints are singular for some plans by design
    return np.array([0.05, 0.2, 0.5, 0.8, 0.95], np.float64)


def _to_torch(x):
    import torch

    return torch.from_numpy(np.asarray(x, np.float32))


@pytest.mark.parametrize("idx", [0, 1, 2])
def test_alpha_sigma_and_ratio(idx):
    ref, mine = _pairs()[idx]
    import torch

    for tv in _t_values():
        t_r = torch.tensor([float(tv)])
        a_r, da_r = ref.compute_alpha_t(t_r)
        s_r, ds_r = ref.compute_sigma_t(t_r)
        ratio_r = ref.compute_d_alpha_alpha_ratio_t(t_r)
        t_m = np.array([tv], np.float32)
        a_m, da_m = mine.compute_alpha_t(t_m)
        s_m, ds_m = mine.compute_sigma_t(t_m)
        ratio_m = mine.compute_d_alpha_alpha_ratio_t(t_m)
        for r, m in ((a_r, a_m), (da_r, da_m), (s_r, s_m), (ds_r, ds_m),
                     (ratio_r, ratio_m)):
            np.testing.assert_allclose(np.asarray(r), np.asarray(m),
                                       rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("idx", [0, 1, 2])
def test_interpolant_and_target(idx):
    ref, mine = _pairs()[idx]
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    x1 = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    t = np.array([0.1, 0.4, 0.6, 0.9], np.float32)

    t_r, xt_r, ut_r = ref.plan(_to_torch(t), _to_torch(x0), _to_torch(x1))
    t_m, xt_m, ut_m = mine.plan(t, x0, x1)
    np.testing.assert_allclose(np.asarray(t_r), np.asarray(t_m), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(xt_r), np.asarray(xt_m),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ut_r), np.asarray(ut_m),
                               rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("idx", [0, 1, 2])
def test_drift_diffusion_and_conversions(idx):
    ref, mine = _pairs()[idx]
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    v = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    t = np.array([0.3, 0.7], np.float32)

    dm_r, dv_r = ref.compute_drift(_to_torch(x), _to_torch(t))
    dm_m, dv_m = mine.compute_drift(x, t)
    np.testing.assert_allclose(np.asarray(dm_r), np.asarray(dm_m),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv_r), np.asarray(dv_m),
                               rtol=2e-5, atol=1e-5)

    # "inccreasing-decreasing" [sic]: the reference's misspelled key, kept
    for form in ("constant", "SBDM", "sigma", "linear", "decreasing",
                 "inccreasing-decreasing"):
        g_r = ref.compute_diffusion(_to_torch(x), _to_torch(t), form=form,
                                    norm=1.5)
        g_m = mine.compute_diffusion(x, t, form=form, norm=1.5)
        np.testing.assert_allclose(
            np.asarray(g_r), np.asarray(g_m), rtol=2e-5, atol=1e-5,
            err_msg=f"diffusion form {form}")

    s_r = ref.get_score_from_velocity(_to_torch(v), _to_torch(x),
                                      _to_torch(t))
    s_m = mine.get_score_from_velocity(v, x, t)
    np.testing.assert_allclose(np.asarray(s_r), np.asarray(s_m),
                               rtol=2e-5, atol=1e-5)
    n_r = ref.get_noise_from_velocity(_to_torch(v), _to_torch(x),
                                      _to_torch(t))
    n_m = mine.get_noise_from_velocity(v, x, t)
    np.testing.assert_allclose(np.asarray(n_r), np.asarray(n_m),
                               rtol=2e-5, atol=1e-5)


def test_center_crop_arr_matches_reference():
    """ADM center crop: byte-identical output vs the reference's
    implementation (resampling kernel choices change FID inputs)."""
    import importlib.util

    from PIL import Image

    spec = importlib.util.spec_from_file_location(
        "ref_train_utils", os.path.join(REFERENCE, "utils", "train_utils.py"))
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception:
        pytest.skip("reference train_utils not importable")

    from zigma_tpu.data.video import center_crop_arr

    rng = np.random.default_rng(0)
    for w, h, size in ((300, 200, 64), (127, 255, 96), (64, 64, 64),
                       (500, 500, 256)):
        img = Image.fromarray(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        ref = np.asarray(mod.center_crop_arr(img, size))
        ours = np.asarray(center_crop_arr(img, size))
        np.testing.assert_array_equal(ours, ref, err_msg=f"{w}x{h}->{size}")
