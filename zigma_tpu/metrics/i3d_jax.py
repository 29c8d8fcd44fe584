"""Native JAX InceptionI3d feature network for FVD.

The reference computes FVD with a pretrained Kinetics-400 I3D — either the
StyleGAN-V TorchScript archive (utils/torchmetric_fvd.py:169-186) or the
videogpt ``pytorch_i3d.InceptionI3d`` state dict
(video_metrics/fvd/videogpt/pytorch_i3d.py, fvd.py:8-19).  This module
re-implements that Inception-v1 I3D graph in pure JAX (NDHWC, TPU-friendly)
with a converter from the standard ``i3d_pretrained_400`` state dict, so FVD
feature extraction runs on the accelerator.

Faithfulness notes (each mirrors pytorch_i3d.py):

- Every conv/pool uses **TF-style dynamic SAME padding** computed from the
  input size (MaxPool3dSamePadding / Unit3D.compute_pad) — under ``jit``
  shapes are static, so the pads are baked per call site.
- Max pools pad with ZEROS (torch ``F.pad`` default) — equivalent to -inf
  padding here because inputs are post-ReLU, but implemented as zero-pad +
  valid window for bit-faithfulness.
- Unit3D = conv3d(bias=False) + BatchNorm3d(eps=1e-5) + ReLU; the final
  ``logits`` Unit3D has a bias and no BN/activation.
- Forward output = logits averaged over time after the [2,7,7] avg pool
  (the "FVD logits", 400-d — fvd.py:128-135 uses ``i3d(batch)``, the
  *logits*, not extract_features).
- Preprocessing (fvd.py:21-60): uint8 video, shorter side bilinear-resized
  (half-pixel centers, no antialias — torch ``align_corners=False``) to
  224, center crop, scaled to [-1, 1].
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["i3d_logits", "i3d_extractor", "load_torch_state_dict",
           "random_params", "param_shapes", "fvd_preprocess",
           "styleganv_gating_preprocess", "styleganv_extractor",
           "torch_bilinear_resize"]

NUM_CLASSES = 400

# InceptionModule output-channel sixtuples (pytorch_i3d.py:230-275)
_MIXED = {
    "Mixed_3b": (192, (64, 96, 128, 16, 32, 32)),
    "Mixed_3c": (256, (128, 128, 192, 32, 96, 64)),
    "Mixed_4b": (480, (192, 96, 208, 16, 48, 64)),
    "Mixed_4c": (512, (160, 112, 224, 24, 64, 64)),
    "Mixed_4d": (512, (128, 128, 256, 24, 64, 64)),
    "Mixed_4e": (512, (112, 144, 288, 32, 64, 64)),
    "Mixed_4f": (528, (256, 160, 320, 32, 128, 128)),
    "Mixed_5b": (832, (256, 160, 320, 32, 128, 128)),
    "Mixed_5c": (832, (384, 192, 384, 48, 128, 128)),
}


def _unit_specs() -> Dict[str, tuple]:
    """name -> (in_ch, out_ch, (kt, kh, kw), (st, sh, sw))."""
    specs = {
        "Conv3d_1a_7x7": (3, 64, (7, 7, 7), (2, 2, 2)),
        "Conv3d_2b_1x1": (64, 64, (1, 1, 1), (1, 1, 1)),
        "Conv3d_2c_3x3": (64, 192, (3, 3, 3), (1, 1, 1)),
    }
    for name, (cin, (b0, b1a, b1b, b2a, b2b, b3b)) in _MIXED.items():
        specs[f"{name}.b0"] = (cin, b0, (1, 1, 1), (1, 1, 1))
        specs[f"{name}.b1a"] = (cin, b1a, (1, 1, 1), (1, 1, 1))
        specs[f"{name}.b1b"] = (b1a, b1b, (3, 3, 3), (1, 1, 1))
        specs[f"{name}.b2a"] = (cin, b2a, (1, 1, 1), (1, 1, 1))
        specs[f"{name}.b2b"] = (b2a, b2b, (3, 3, 3), (1, 1, 1))
        specs[f"{name}.b3b"] = (cin, b3b, (1, 1, 1), (1, 1, 1))
    return specs


UNIT_SPECS = _unit_specs()


def _same_pads(size: int, k: int, s: int):
    """TF SAME pad split (pytorch_i3d.py compute_pad + front/back split)."""
    pad = max(k - s, 0) if size % s == 0 else max(k - (size % s), 0)
    return pad // 2, pad - pad // 2


def _pads_3d(x, kernel, stride):
    return [_same_pads(x.shape[1 + i], kernel[i], stride[i])
            for i in range(3)]


def _unit3d(x, p, spec, *, eps=1e-5):
    """Unit3D on NDHWC input: same-pad conv (no bias) + BN + ReLU."""
    _, _, kernel, stride = spec
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding=_pads_3d(x, kernel, stride),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    scale = p["bn_scale"] * jax.lax.rsqrt(p["bn_var"] + eps)
    y = y * scale + (p["bn_bias"] - p["bn_mean"] * scale)
    return jax.nn.relu(y)


def _max_pool_same(x, kernel, stride):
    """Zero-pad TF-SAME max pool (MaxPool3dSamePadding semantics)."""
    pads = _pads_3d(x, kernel, stride)
    x = jnp.pad(x, [(0, 0)] + pads + [(0, 0)])
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1,) + tuple(kernel) + (1,),
        (1,) + tuple(stride) + (1,), "VALID")


def _mixed(params, prefix, x):
    b0 = _unit3d(x, params[f"{prefix}.b0"], UNIT_SPECS[f"{prefix}.b0"])
    b1 = _unit3d(x, params[f"{prefix}.b1a"], UNIT_SPECS[f"{prefix}.b1a"])
    b1 = _unit3d(b1, params[f"{prefix}.b1b"], UNIT_SPECS[f"{prefix}.b1b"])
    b2 = _unit3d(x, params[f"{prefix}.b2a"], UNIT_SPECS[f"{prefix}.b2a"])
    b2 = _unit3d(b2, params[f"{prefix}.b2b"], UNIT_SPECS[f"{prefix}.b2b"])
    b3 = _max_pool_same(x, (3, 3, 3), (1, 1, 1))
    b3 = _unit3d(b3, params[f"{prefix}.b3b"], UNIT_SPECS[f"{prefix}.b3b"])
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


@jax.jit
def i3d_logits(params, videos):
    """FVD logits for videos (B, C, T, H, W) float in [-1, 1].

    Returns (B, 400): logits conv applied after the [2,7,7] average pool,
    spatially squeezed and time-averaged (pytorch_i3d.py:305-315).
    """
    x = jnp.transpose(videos.astype(jnp.float32), (0, 2, 3, 4, 1))  # NDHWC
    x = _unit3d(x, params["Conv3d_1a_7x7"], UNIT_SPECS["Conv3d_1a_7x7"])
    x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
    x = _unit3d(x, params["Conv3d_2b_1x1"], UNIT_SPECS["Conv3d_2b_1x1"])
    x = _unit3d(x, params["Conv3d_2c_3x3"], UNIT_SPECS["Conv3d_2c_3x3"])
    x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
    x = _mixed(params, "Mixed_3b", x)
    x = _mixed(params, "Mixed_3c", x)
    x = _max_pool_same(x, (3, 3, 3), (2, 2, 2))
    for m in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        x = _mixed(params, m, x)
    x = _max_pool_same(x, (2, 2, 2), (2, 2, 2))
    x = _mixed(params, "Mixed_5b", x)
    x = _mixed(params, "Mixed_5c", x)

    # AvgPool3d([2,7,7], stride 1, VALID); kernel clamped for small inputs
    T, H, W = x.shape[1:4]
    k = (min(2, T), min(7, H), min(7, W))
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1,) + k + (1,), (1, 1, 1, 1, 1),
        "VALID") / float(np.prod(k))
    # logits Unit3D: 1x1x1 conv WITH bias, no BN, no activation
    x = jax.lax.conv_general_dilated(
        x, params["logits"]["w"], (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + params["logits"]["b"]
    # squeeze spatial, mean over time -> (B, 400)
    return jnp.mean(x, axis=(1, 2, 3))


def torch_bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int):
    """torch ``F.interpolate(mode='bilinear', align_corners=False)`` on
    (..., H, W, C): half-pixel centers, no antialiasing (fvd.py:37)."""
    H, W = x.shape[-3:-1]

    def axis_weights(in_size, out_size):
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * (
            in_size / out_size) - 0.5
        src = np.clip(src, 0.0, in_size - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, in_size - 1)
        return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(
            src - lo, jnp.float32)

    ylo, yhi, yf = axis_weights(H, out_h)
    xlo, xhi, xf = axis_weights(W, out_w)
    x = x.astype(jnp.float32)
    top = jnp.take(x, ylo, axis=-3)
    bot = jnp.take(x, yhi, axis=-3)
    rows = top + (bot - top) * yf[:, None, None]
    left = jnp.take(rows, xlo, axis=-2)
    right = jnp.take(rows, xhi, axis=-2)
    return left + (right - left) * xf[:, None]


def fvd_preprocess(videos: np.ndarray, resolution: int = 224) -> jnp.ndarray:
    """uint8 (B, T, H, W, C) [0,255] -> (B, C, T, res, res) in [-1, 1],
    mirroring fvd.py:21-60: /255, shorter-side bilinear resize, center
    crop, -0.5, x2."""
    v = jnp.asarray(np.asarray(videos), jnp.float32) / 255.0
    B, T, H, W, C = v.shape
    scale = resolution / min(H, W)
    th = int(np.ceil(H * scale)) if W < H else resolution
    tw = int(np.ceil(W * scale)) if H <= W else resolution
    v = torch_bilinear_resize(v, th, tw)
    h0, w0 = (th - resolution) // 2, (tw - resolution) // 2
    v = v[:, :, h0:h0 + resolution, w0:w0 + resolution]
    v = (v - 0.5) * 2.0
    return jnp.transpose(v, (0, 4, 1, 2, 3))  # B C T H W


def styleganv_gating_preprocess(videos: np.ndarray,
                                resolution: int = 224) -> jnp.ndarray:
    """uint8 (B, T, H, W, C) -> (B, C, T, res, res) float32 **in [0, 255]**.

    EXACTLY the reference's gating-FVD feed (my_metrics.py:58-69): each
    frame is bilinear-resized straight to 224x224 (aspect-distorting, NO
    shorter-side scaling, NO center crop; align_corners=False), and the
    values are NEVER rescaled — FrechetVideoDistance then invokes the
    StyleGAN-V detector with ``rescale=False``
    (utils/torchmetric_fvd.py:173), so it sees raw [0, 255] floats.  A
    reference quirk (the detector nominally expects [-1, 1]), reproduced
    bit-for-bit because FVD-number parity depends on it.  Contrast
    ``fvd_preprocess`` (the videogpt flavor: shorter-side resize + center
    crop + [-1, 1]).
    """
    v = jnp.asarray(np.asarray(videos), jnp.float32)
    v = torch_bilinear_resize(v, resolution, resolution)
    return jnp.transpose(v, (0, 4, 1, 2, 3))  # B C T H W


def _make_extractor(params, preprocess, batch: int, resolution: int):
    """(B, T, H, W, C) uint8 videos -> (B, 400) logits, batched through
    ``preprocess`` (the only difference between the FVD flavors)."""

    def extract(videos: np.ndarray) -> np.ndarray:
        videos = np.asarray(videos)
        outs = []
        for i in range(0, videos.shape[0], batch):
            chunk = preprocess(videos[i:i + batch], resolution)
            outs.append(np.asarray(i3d_logits(params, chunk)))
        return np.concatenate(outs, axis=0)

    return extract


def styleganv_extractor(params, batch: int = 8, resolution: int = 224):
    """(B, T, H, W, C) uint8 videos -> (B, 400) features through the
    StyleGAN-V gating pipeline (see styleganv_gating_preprocess); plug
    into ``VideoMetric(flavor="styleganv")``."""
    return _make_extractor(params, styleganv_gating_preprocess, batch,
                           resolution)


def i3d_extractor(params, batch: int = 8, resolution: int = 224):
    """(B, T, H, W, C) uint8 videos -> (B, 400) FVD logits (videogpt
    flavor preprocessing); plug into ``VideoMetric``."""
    return _make_extractor(params, fvd_preprocess, batch, resolution)


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def param_shapes() -> Dict[str, Dict[str, tuple]]:
    shapes = {}
    for name, (cin, cout, (kt, kh, kw), _) in UNIT_SPECS.items():
        shapes[name] = {"w": (kt, kh, kw, cin, cout),
                        "bn_scale": (cout,), "bn_bias": (cout,),
                        "bn_mean": (cout,), "bn_var": (cout,)}
    shapes["logits"] = {"w": (1, 1, 1, 1024, NUM_CLASSES),
                        "b": (NUM_CLASSES,)}
    return shapes


def random_params(seed: int = 0):
    """He-scaled random tree (tests/smoke; keeps features input-dependent)."""
    rng = np.random.default_rng(seed)
    params = {}
    for name, sh in param_shapes().items():
        if name == "logits":
            params[name] = {
                "w": jnp.asarray(rng.standard_normal(sh["w"])
                                 / np.sqrt(sh["w"][3]), jnp.float32),
                "b": jnp.zeros(sh["b"], jnp.float32)}
            continue
        kt, kh, kw, cin, _ = sh["w"]
        he = np.sqrt(2.0 / (kt * kh * kw * cin))
        params[name] = {
            "w": jnp.asarray(rng.standard_normal(sh["w"]) * he, jnp.float32),
            "bn_scale": jnp.asarray(
                1.0 + 0.1 * rng.standard_normal(sh["bn_scale"]), jnp.float32),
            "bn_bias": jnp.asarray(
                0.1 * rng.standard_normal(sh["bn_bias"]), jnp.float32),
            "bn_mean": jnp.zeros(sh["bn_mean"], jnp.float32),
            "bn_var": jnp.ones(sh["bn_var"], jnp.float32),
        }
    return params


def load_torch_state_dict(state_dict) -> Dict:
    """Map the ``i3d_pretrained_400`` / pytorch_i3d state dict onto the JAX
    tree.  Conv3d weights (O, I, T, H, W) -> (T, H, W, I, O).  Strips a
    DataParallel ``module.`` prefix; ignores ``num_batches_tracked``."""
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = np.asarray(getattr(v, "numpy", lambda: v)())

    params, missing = {}, []
    for name in UNIT_SPECS:
        pairs = {"w": f"{name}.conv3d.weight",
                 "bn_scale": f"{name}.bn.weight",
                 "bn_bias": f"{name}.bn.bias",
                 "bn_mean": f"{name}.bn.running_mean",
                 "bn_var": f"{name}.bn.running_var"}
        entry = {}
        for ours, theirs in pairs.items():
            if theirs not in sd:
                missing.append(theirs)
                continue
            arr = sd[theirs]
            if ours == "w":
                arr = np.transpose(arr, (2, 3, 4, 1, 0))
            entry[ours] = jnp.asarray(arr, jnp.float32)
        params[name] = entry
    if "logits.conv3d.weight" in sd:
        params["logits"] = {
            "w": jnp.asarray(np.transpose(sd["logits.conv3d.weight"],
                                          (2, 3, 4, 1, 0)), jnp.float32),
            "b": jnp.asarray(sd.get("logits.conv3d.bias",
                                    np.zeros(NUM_CLASSES)), jnp.float32)}
    else:
        missing.append("logits.conv3d.weight")
    if missing:
        raise KeyError(f"state dict is missing {len(missing)} keys, e.g. "
                       f"{missing[:4]} — not an InceptionI3d checkpoint?")
    want = param_shapes()
    for name, sh in want.items():
        for k, s in sh.items():
            got = tuple(params[name][k].shape)
            if got != tuple(s):
                raise ValueError(f"{name}.{k}: shape {got} != expected {s}")
    return params
