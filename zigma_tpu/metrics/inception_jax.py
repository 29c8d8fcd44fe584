"""Native JAX FID-InceptionV3 feature network.

The reference computes FID/sFID/KID/IS with torch-fidelity's
``FeatureExtractorInceptionV3`` — the TensorFlow-ported InceptionV3 whose
exact graph (and its deviations from torchvision) the published FID numbers
depend on (reference: utils/torchmetric_sfid.py:63-160, my_metrics.py:13-115).

This module re-implements that graph in pure JAX (NHWC, TPU-friendly) so
feature extraction runs on the accelerator next to generation, with a
converter from the standard ``pt_inception-2015-12-05`` torch state dict.
Faithfulness points, each matching the torch-fidelity source:

- TF1-style bilinear resize to 299x299 (``align_corners=False``, *no*
  half-pixel centers — unlike both ``jax.image.resize`` and torch
  ``F.interpolate``), then ``(x - 128) / 128`` normalization.
- ``BasicConv2d`` = conv(bias=False) + BatchNorm(eps=1e-3) + ReLU.
- FID block variants: InceptionA/C and E_1 use average pooling with
  ``count_include_pad=False``; E_2 (Mixed_7c) uses **max** pooling in its
  pool branch.
- Feature taps: "64" (post-stem GAP), "192" (post-MaxPool_2 GAP),
  "768" = first 7 channels of Mixed_6e flattened (7*17*17 = 2023 dims,
  the sFID feature, utils/torchmetric_sfid.py:146), "2048" (final GAP),
  "logits_unbiased" = features @ fc.weight.T (no bias, 1008 classes).

Weights are NOT bundled (zero-egress build); ``load_torch_state_dict``
maps any locally cached FID-inception state dict onto the param tree.
``random_params`` builds a correctly-shaped random tree for tests.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "inception_forward", "inception_extractor", "load_torch_state_dict",
    "random_params", "param_shapes", "tf1_bilinear_resize",
    "FEATURE_NAMES",
]

FEATURE_NAMES = ("64", "192", "768", "2048", "logits_unbiased")

# ---------------------------------------------------------------------------
# architecture table: every BasicConv2d in the graph.
# name -> (in_ch, out_ch, (kh, kw), (sh, sw), (ph, pw))
# ---------------------------------------------------------------------------

def _a(prefix: str, in_ch: int, pool: int):
    """InceptionA (torchvision InceptionA w/ FID avg-pool): out 224+pool."""
    return {
        f"{prefix}.branch1x1": (in_ch, 64, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch5x5_1": (in_ch, 48, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch5x5_2": (48, 64, (5, 5), (1, 1), (2, 2)),
        f"{prefix}.branch3x3dbl_1": (in_ch, 64, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch3x3dbl_2": (64, 96, (3, 3), (1, 1), (1, 1)),
        f"{prefix}.branch3x3dbl_3": (96, 96, (3, 3), (1, 1), (1, 1)),
        f"{prefix}.branch_pool": (in_ch, pool, (1, 1), (1, 1), (0, 0)),
    }


def _b(prefix: str, in_ch: int):
    return {
        f"{prefix}.branch3x3": (in_ch, 384, (3, 3), (2, 2), (0, 0)),
        f"{prefix}.branch3x3dbl_1": (in_ch, 64, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch3x3dbl_2": (64, 96, (3, 3), (1, 1), (1, 1)),
        f"{prefix}.branch3x3dbl_3": (96, 96, (3, 3), (2, 2), (0, 0)),
    }


def _c(prefix: str, in_ch: int, c7: int):
    return {
        f"{prefix}.branch1x1": (in_ch, 192, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch7x7_1": (in_ch, c7, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch7x7_2": (c7, c7, (1, 7), (1, 1), (0, 3)),
        f"{prefix}.branch7x7_3": (c7, 192, (7, 1), (1, 1), (3, 0)),
        f"{prefix}.branch7x7dbl_1": (in_ch, c7, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch7x7dbl_2": (c7, c7, (7, 1), (1, 1), (3, 0)),
        f"{prefix}.branch7x7dbl_3": (c7, c7, (1, 7), (1, 1), (0, 3)),
        f"{prefix}.branch7x7dbl_4": (c7, c7, (7, 1), (1, 1), (3, 0)),
        f"{prefix}.branch7x7dbl_5": (c7, 192, (1, 7), (1, 1), (0, 3)),
        f"{prefix}.branch_pool": (in_ch, 192, (1, 1), (1, 1), (0, 0)),
    }


def _d(prefix: str, in_ch: int):
    return {
        f"{prefix}.branch3x3_1": (in_ch, 192, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch3x3_2": (192, 320, (3, 3), (2, 2), (0, 0)),
        f"{prefix}.branch7x7x3_1": (in_ch, 192, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch7x7x3_2": (192, 192, (1, 7), (1, 1), (0, 3)),
        f"{prefix}.branch7x7x3_3": (192, 192, (7, 1), (1, 1), (3, 0)),
        f"{prefix}.branch7x7x3_4": (192, 192, (3, 3), (2, 2), (0, 0)),
    }


def _e(prefix: str, in_ch: int):
    return {
        f"{prefix}.branch1x1": (in_ch, 320, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch3x3_1": (in_ch, 384, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch3x3_2a": (384, 384, (1, 3), (1, 1), (0, 1)),
        f"{prefix}.branch3x3_2b": (384, 384, (3, 1), (1, 1), (1, 0)),
        f"{prefix}.branch3x3dbl_1": (in_ch, 448, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch3x3dbl_2": (448, 384, (3, 3), (1, 1), (1, 1)),
        f"{prefix}.branch3x3dbl_3a": (384, 384, (1, 3), (1, 1), (0, 1)),
        f"{prefix}.branch3x3dbl_3b": (384, 384, (3, 1), (1, 1), (1, 0)),
        f"{prefix}.branch_pool": (in_ch, 192, (1, 1), (1, 1), (0, 0)),
    }


CONV_SPECS: Dict[str, tuple] = {
    "Conv2d_1a_3x3": (3, 32, (3, 3), (2, 2), (0, 0)),
    "Conv2d_2a_3x3": (32, 32, (3, 3), (1, 1), (0, 0)),
    "Conv2d_2b_3x3": (32, 64, (3, 3), (1, 1), (1, 1)),
    "Conv2d_3b_1x1": (64, 80, (1, 1), (1, 1), (0, 0)),
    "Conv2d_4a_3x3": (80, 192, (3, 3), (1, 1), (0, 0)),
    **_a("Mixed_5b", 192, 32), **_a("Mixed_5c", 256, 64),
    **_a("Mixed_5d", 288, 64),
    **_b("Mixed_6a", 288),
    **_c("Mixed_6b", 768, 128), **_c("Mixed_6c", 768, 160),
    **_c("Mixed_6d", 768, 160), **_c("Mixed_6e", 768, 192),
    **_d("Mixed_7a", 768),
    **_e("Mixed_7b", 1280), **_e("Mixed_7c", 2048),
}

NUM_CLASSES = 1008  # the TF-ported FID net keeps the original 1008 classes


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def tf1_bilinear_resize(x: jnp.ndarray, size: int = 299) -> jnp.ndarray:
    """TF1 ``tf.image.resize_bilinear(align_corners=False)`` on NHWC input.

    Source coordinate = dst * (in/out); corner sample = floor; linear blend
    with the fractional part; upper neighbour clamped to in-1.  This is what
    torch-fidelity's ``interpolate_bilinear_2d_like_tensorflow1x`` computes
    and it differs from half-pixel-centre bilinear (jax.image.resize).
    """
    B, H, W, C = x.shape

    def axis_weights(in_size):
        scale = in_size / size
        src = np.arange(size, dtype=np.float64) * scale
        lo = np.floor(src).astype(np.int64)
        lo = np.minimum(lo, in_size - 1)
        frac = src - lo
        hi = np.minimum(lo + 1, in_size - 1)
        return (jnp.asarray(lo), jnp.asarray(hi),
                jnp.asarray(frac, jnp.float32))

    ylo, yhi, yf = axis_weights(H)
    xlo, xhi, xf = axis_weights(W)
    x = x.astype(jnp.float32)
    top = x[:, ylo]
    bot = x[:, yhi]
    rows = top + (bot - top) * yf[None, :, None, None]
    left = rows[:, :, xlo]
    right = rows[:, :, xhi]
    return left + (right - left) * xf[None, None, :, None]


def _conv_bn(x, p, spec, *, eps=1e-3):
    """BasicConv2d: conv(bias=False) + BN(eps=1e-3, inference) + ReLU."""
    _, _, (kh, kw), stride, (ph, pw) = spec
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride,
        padding=[(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    scale = p["bn_scale"] * jax.lax.rsqrt(p["bn_var"] + eps)
    y = y * scale + (p["bn_bias"] - p["bn_mean"] * scale)
    return jax.nn.relu(y)


def _max_pool(x, k=3, s=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


def _avg_pool_nopad(x, k=3):
    """3x3 stride-1 avg pool, pad 1, ``count_include_pad=False`` — the FID
    variant's pooling (divisor counts only in-bounds taps)."""
    window = (1, k, k, 1)
    pads = [(0, 0), (1, 1), (1, 1), (0, 0)]
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, (1, 1, 1, 1), pads)
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    count = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window,
                                  (1, 1, 1, 1), pads)
    return s / count


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _run(params, name, x):
    return _conv_bn(x, params[name], CONV_SPECS[name])


def _block_a(params, prefix, x):
    b1 = _run(params, f"{prefix}.branch1x1", x)
    b5 = _run(params, f"{prefix}.branch5x5_1", x)
    b5 = _run(params, f"{prefix}.branch5x5_2", b5)
    b3 = _run(params, f"{prefix}.branch3x3dbl_1", x)
    b3 = _run(params, f"{prefix}.branch3x3dbl_2", b3)
    b3 = _run(params, f"{prefix}.branch3x3dbl_3", b3)
    bp = _run(params, f"{prefix}.branch_pool", _avg_pool_nopad(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(params, prefix, x):
    b3 = _run(params, f"{prefix}.branch3x3", x)
    bd = _run(params, f"{prefix}.branch3x3dbl_1", x)
    bd = _run(params, f"{prefix}.branch3x3dbl_2", bd)
    bd = _run(params, f"{prefix}.branch3x3dbl_3", bd)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _block_c(params, prefix, x):
    b1 = _run(params, f"{prefix}.branch1x1", x)
    b7 = x
    for tail in ("_1", "_2", "_3"):
        b7 = _run(params, f"{prefix}.branch7x7{tail}", b7)
    bd = x
    for tail in ("_1", "_2", "_3", "_4", "_5"):
        bd = _run(params, f"{prefix}.branch7x7dbl{tail}", bd)
    bp = _run(params, f"{prefix}.branch_pool", _avg_pool_nopad(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(params, prefix, x):
    b3 = _run(params, f"{prefix}.branch3x3_1", x)
    b3 = _run(params, f"{prefix}.branch3x3_2", b3)
    b7 = x
    for tail in ("_1", "_2", "_3", "_4"):
        b7 = _run(params, f"{prefix}.branch7x7x3{tail}", b7)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _block_e(params, prefix, x, *, pool: str):
    b1 = _run(params, f"{prefix}.branch1x1", x)
    b3 = _run(params, f"{prefix}.branch3x3_1", x)
    b3 = jnp.concatenate([_run(params, f"{prefix}.branch3x3_2a", b3),
                          _run(params, f"{prefix}.branch3x3_2b", b3)], -1)
    bd = _run(params, f"{prefix}.branch3x3dbl_1", x)
    bd = _run(params, f"{prefix}.branch3x3dbl_2", bd)
    bd = jnp.concatenate([_run(params, f"{prefix}.branch3x3dbl_3a", bd),
                          _run(params, f"{prefix}.branch3x3dbl_3b", bd)], -1)
    if pool == "avg":     # FIDInceptionE_1 (Mixed_7b)
        bp = _avg_pool_nopad(x)
    else:                 # FIDInceptionE_2 (Mixed_7c): max pool, pad 1
        bp = _max_pool(x, k=3, s=1, pad=1)
    bp = _run(params, f"{prefix}.branch_pool", bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("features", "resize"))
def inception_forward(params, x, features: Sequence[str] = ("2048",),
                      resize: bool = True):
    """Run the FID InceptionV3 graph on NCHW uint8/float images in [0, 255].

    Returns a dict {feature_name: (B, F) array} for the requested subset of
    FEATURE_NAMES.  Mirrors torch-fidelity's forward tap-for-tap
    (reference: utils/torchmetric_sfid.py:86-170).
    """
    want = set(features)
    unknown = want - set(FEATURE_NAMES)
    if unknown:
        raise ValueError(f"unknown features {sorted(unknown)}")
    out = {}
    x = jnp.transpose(x.astype(jnp.float32), (0, 2, 3, 1))  # NCHW -> NHWC
    if resize:
        x = tf1_bilinear_resize(x, 299)
    x = (x - 128.0) / 128.0

    x = _run(params, "Conv2d_1a_3x3", x)
    x = _run(params, "Conv2d_2a_3x3", x)
    x = _run(params, "Conv2d_2b_3x3", x)
    x = _max_pool(x)
    if "64" in want:
        out["64"] = jnp.mean(x, axis=(1, 2))
        if len(out) == len(want):
            return out
    x = _run(params, "Conv2d_3b_1x1", x)
    x = _run(params, "Conv2d_4a_3x3", x)
    x = _max_pool(x)
    if "192" in want:
        out["192"] = jnp.mean(x, axis=(1, 2))
        if len(out) == len(want):
            return out
    for m in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _block_a(params, m, x)
    x = _block_b(params, "Mixed_6a", x)
    for m in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _block_c(params, m, x)
    if "768" in want:
        # sFID feature: first 7 channels, flattened in the torch NCHW order
        sf = jnp.transpose(x[..., :7], (0, 3, 1, 2))
        out["768"] = sf.reshape(sf.shape[0], -1)
        if len(out) == len(want):
            return out
    x = _block_d(params, "Mixed_7a", x)
    x = _block_e(params, "Mixed_7b", x, pool="avg")
    x = _block_e(params, "Mixed_7c", x, pool="max")
    pooled = jnp.mean(x, axis=(1, 2))
    if "2048" in want:
        out["2048"] = pooled
    if "logits_unbiased" in want:
        out["logits_unbiased"] = pooled @ params["fc"]["w"].T
    return out


def inception_extractor(params, feature: str = "2048", batch: int = 64):
    """(B, C, H, W) numpy [0,255] -> (B, F) numpy features, batched on the
    default JAX device.  Plug into ``metrics.register_extractor``."""

    def extract(imgs: np.ndarray) -> np.ndarray:
        imgs = np.asarray(imgs)
        if imgs.ndim == 3:
            imgs = imgs[None]
        outs = []
        for i in range(0, imgs.shape[0], batch):
            chunk = imgs[i:i + batch]
            feats = inception_forward(params, jnp.asarray(chunk),
                                      features=(feature,))[feature]
            outs.append(np.asarray(feats))
        return np.concatenate(outs, axis=0)

    return extract


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def param_shapes() -> Dict[str, Dict[str, tuple]]:
    """Shape tree (HWIO convs) — converter target and test scaffold."""
    shapes = {}
    for name, (cin, cout, (kh, kw), _, _) in CONV_SPECS.items():
        shapes[name] = {"w": (kh, kw, cin, cout),
                        "bn_scale": (cout,), "bn_bias": (cout,),
                        "bn_mean": (cout,), "bn_var": (cout,)}
    shapes["fc"] = {"w": (NUM_CLASSES, 2048), "b": (NUM_CLASSES,)}
    return shapes


def random_params(seed: int = 0):
    """Random, correctly-shaped param tree (tests / smoke only).

    He-scaled conv weights + unit BN keep the signal alive through all 17
    conv levels, so features actually VARY across inputs — a flat random
    init decays to constant features, which would make smoke FIDs
    trivially zero."""
    rng = np.random.default_rng(seed)
    params = {}
    for name, sh in param_shapes().items():
        if name == "fc":
            params[name] = {
                "w": jnp.asarray(rng.standard_normal(sh["w"])
                                 / np.sqrt(sh["w"][1]), jnp.float32),
                "b": jnp.zeros(sh["b"], jnp.float32)}
            continue
        kh, kw, cin, _ = sh["w"]
        he = np.sqrt(2.0 / (kh * kw * cin))
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
    """Map a torch FID-inception state dict (``pt_inception-2015-12-05`` /
    torch-fidelity ``FeatureExtractorInceptionV3``) onto the JAX tree.

    Accepts tensors or numpy arrays; conv weights OIHW -> HWIO.  Ignores a
    leading ``base.``/``model.`` prefix and ``num_batches_tracked``.
    """
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("base.", "", 1) if k.startswith("base.") else k
        k = k.replace("model.", "", 1) if k.startswith("model.") else k
        sd[k] = np.asarray(getattr(v, "numpy", lambda: v)())

    params = {}
    missing = []
    for name in CONV_SPECS:
        entry = {}
        pairs = {"w": f"{name}.conv.weight",
                 "bn_scale": f"{name}.bn.weight",
                 "bn_bias": f"{name}.bn.bias",
                 "bn_mean": f"{name}.bn.running_mean",
                 "bn_var": f"{name}.bn.running_var"}
        for ours, theirs in pairs.items():
            if theirs not in sd:
                missing.append(theirs)
                continue
            arr = sd[theirs]
            if ours == "w":
                arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
            entry[ours] = jnp.asarray(arr, jnp.float32)
        params[name] = entry
    if "fc.weight" in sd:
        params["fc"] = {"w": jnp.asarray(sd["fc.weight"], jnp.float32),
                        "b": jnp.asarray(sd.get("fc.bias",
                                                np.zeros(NUM_CLASSES)),
                                         jnp.float32)}
    else:
        missing.append("fc.weight")
    if missing:
        raise KeyError(f"state dict is missing {len(missing)} keys, e.g. "
                       f"{missing[:4]} — not a FID InceptionV3 checkpoint?")

    # shape audit against the architecture table
    want = param_shapes()
    for name, sh in want.items():
        for k, s in sh.items():
            got = tuple(params[name][k].shape)
            if got != tuple(s):
                raise ValueError(f"{name}.{k}: shape {got} != expected {s}")
    return params
