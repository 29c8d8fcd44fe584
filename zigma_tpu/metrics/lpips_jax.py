"""Native JAX LPIPS (linearly-calibrated AlexNet) for video perceptual
similarity.

The reference scores videos with ``lpips.LPIPS(net='alex')``
(video_metrics/calculate_lpips.py:12,58): AlexNet features at the five
ReLU taps, channel-unit-normalized, squared-difference, per-layer 1x1
calibration weights, spatial mean, summed.  This re-implements that exact
pipeline in JAX so it runs on the accelerator, with converters from the
torchvision AlexNet weights and the lpips package's ``alex.pth`` linear
heads (both locally cached; zero-egress build bundles no weights).

Pipeline parity points (lpips package v0.1):

- ScalingLayer: inputs in [-1, 1], ``(x - shift) / scale`` with the
  published shift/scale constants.
- AlexNet ``.features`` taps after each ReLU: conv1(11x11 s4 p2),
  maxpool(3,2), conv2(5x5 p2), maxpool, conv3, conv4, conv5 (3x3 p1).
- ``normalize_tensor``: x / sqrt(sum_c x^2 + 1e-10).
- lins: non-negative 1x1 convs (no bias) -> spatial mean -> sum over the
  5 layers.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["lpips", "lpips_video", "load_torch_state_dicts",
           "random_params", "param_shapes"]

# (in_ch, out_ch, k, stride, pad), with a max-pool BEFORE convs 2 and 3
_ALEX = [
    (3, 64, 11, 4, 2),
    (64, 192, 5, 1, 2),
    (192, 384, 3, 1, 1),
    (384, 256, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
_CHANNELS = [64, 192, 384, 256, 256]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _features(params, x):
    """AlexNet relu taps; x NHWC in [-1, 1] (after the scaling layer)."""
    taps = []
    for i, (_, _, k, s, p) in enumerate(_ALEX):
        if i in (1, 2):  # maxpool before conv2 and conv3
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        layer = params[f"conv{i}"]
        x = jax.lax.conv_general_dilated(
            x, layer["w"], (s, s), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + layer["b"]
        x = jax.nn.relu(x)
        taps.append(x)
    return taps


@jax.jit
def lpips(params, img0, img1):
    """LPIPS distance for image batches (B, C, H, W) in [-1, 1] -> (B,)."""
    outs = []
    for x in (img0, img1):
        x = jnp.transpose(x.astype(jnp.float32), (0, 2, 3, 1))
        x = (x - _SHIFT) / _SCALE
        outs.append(_features(params, x))
    total = 0.0
    for i, (f0, f1) in enumerate(zip(*outs)):
        n0 = f0 * jax.lax.rsqrt(jnp.sum(f0 * f0, -1, keepdims=True) + 1e-10)
        n1 = f1 * jax.lax.rsqrt(jnp.sum(f1 * f1, -1, keepdims=True) + 1e-10)
        d = (n0 - n1) ** 2
        w = params[f"lin{i}"]["w"]                    # (C,) non-negative
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def lpips_video(params, vid0, vid1):
    """Per-video LPIPS, averaged over frames: (B, T, C, H, W) in [0, 1]
    (the reference's videos arrive in [0,1] and are shifted to [-1,1],
    calculate_lpips.py:30-58) -> (B,)."""
    B, T = vid0.shape[:2]
    flat = lpips(params,
                 vid0.reshape((B * T,) + vid0.shape[2:]) * 2.0 - 1.0,
                 vid1.reshape((B * T,) + vid1.shape[2:]) * 2.0 - 1.0)
    return flat.reshape(B, T).mean(axis=1)


def lpips_per_timestep(params, videos1, videos2) -> dict:
    """Reference ``calculate_lpips`` layout: per-timestep mean/std over the
    batch plus global mean/std (video_metrics/calculate_lpips.py:25-77).
    videos: (B, T, C, H, W) in [0, 1].  One vectorized batch instead of the
    reference's python double-loop."""
    import numpy as np  # noqa: F811 — local alias for clarity

    B, T = videos1.shape[:2]
    flat = lpips(params,
                 jnp.asarray(videos1).reshape((B * T,) + videos1.shape[2:])
                 * 2.0 - 1.0,
                 jnp.asarray(videos2).reshape((B * T,) + videos2.shape[2:])
                 * 2.0 - 1.0)
    per_t = np.asarray(flat).reshape(B, T)
    return {
        "value": {t: float(per_t[:, t].mean()) for t in range(T)},
        "value_std": {t: float(per_t[:, t].std()) for t in range(T)},
        "mean": float(per_t.mean()),
        "std": float(per_t.std()),
    }


def param_shapes() -> Dict[str, Dict[str, tuple]]:
    shapes = {}
    for i, (cin, cout, k, _, _) in enumerate(_ALEX):
        shapes[f"conv{i}"] = {"w": (k, k, cin, cout), "b": (cout,)}
    for i, c in enumerate(_CHANNELS):
        shapes[f"lin{i}"] = {"w": (c,)}
    return shapes


def random_params(seed: int = 0):
    rng = np.random.default_rng(seed)
    params = {}
    for name, sh in param_shapes().items():
        if name.startswith("lin"):
            params[name] = {"w": jnp.asarray(
                np.abs(rng.standard_normal(sh["w"])).astype(np.float32)
                / sh["w"][0])}
            continue
        kh, kw, cin, cout = sh["w"]
        he = np.sqrt(2.0 / (kh * kw * cin))
        params[name] = {
            "w": jnp.asarray(rng.standard_normal(sh["w"]) * he, jnp.float32),
            "b": jnp.asarray(0.1 * rng.standard_normal(cout), jnp.float32)}
    return params


def load_torch_state_dicts(alexnet_sd, lpips_sd) -> Dict:
    """alexnet_sd: torchvision AlexNet state dict (``features.N.*``);
    lpips_sd: lpips package ``alex.pth`` (``lin{i}.model.1.weight``)."""
    a = {k: np.asarray(getattr(v, "numpy", lambda: v)())
         for k, v in alexnet_sd.items()}
    l = {k: np.asarray(getattr(v, "numpy", lambda: v)())
         for k, v in lpips_sd.items()}
    feature_idx = [0, 3, 6, 8, 10]  # conv positions in alexnet.features
    params, missing = {}, []
    for i, fi in enumerate(feature_idx):
        wk, bk = f"features.{fi}.weight", f"features.{fi}.bias"
        if wk not in a or bk not in a:
            missing.append(wk)
            continue
        params[f"conv{i}"] = {
            "w": jnp.asarray(np.transpose(a[wk], (2, 3, 1, 0)), jnp.float32),
            "b": jnp.asarray(a[bk], jnp.float32)}
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in l:
            key = f"lins.{i}.model.1.weight"  # newer lpips layout
        if key not in l:
            missing.append(f"lin{i}.model.1.weight")
            continue
        params[f"lin{i}"] = {
            "w": jnp.asarray(l[key].reshape(-1), jnp.float32)}
    if missing:
        raise KeyError(f"missing keys: {missing[:4]} — wrong checkpoints?")
    want = param_shapes()
    for name, sh in want.items():
        for k, s in sh.items():
            got = tuple(params[name][k].shape)
            if got != tuple(s):
                raise ValueError(f"{name}.{k}: {got} != {s}")
    return params
