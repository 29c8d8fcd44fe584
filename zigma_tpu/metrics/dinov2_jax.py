"""Native JAX DINOv2 ViT for the Fréchet-DINOv2-Distance (FDD).

The reference computes FDD with ``torch.hub.load("facebookresearch/dinov2",
"dinov2_vitl14")`` — images bicubic-resized to 224, ImageNet-normalized,
scored on the class-token embedding (reference:
utils/torchmetric_fdd.py:82-105).  This re-implements that ViT in pure JAX
so FDD features run on the accelerator, with a converter from the torch hub
state dict.

Architecture (dinov2 vit_large patch14, no registers):

- patch embed: 14x14 stride-14 conv to 1024 channels, flattened row-major;
  class token prepended.
- positional embedding trained at 518px (37x37 grid + cls); for other
  resolutions the grid part is bicubic-resized (half-pixel centers, no
  antialias — torch ``F.interpolate(mode="bicubic")``, dinov2's
  ``interpolate_pos_encoding`` default).
- 24 pre-norm blocks (LayerNorm eps 1e-6): MHSA (16 heads, qkv bias) with
  LayerScale gamma, then MLP (x4, GELU) with LayerScale.
- final LayerNorm; FDD feature = class token (1024-d).

Size presets cover vitl14 (the reference's choice) plus vits14/vitb14 for
completeness.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dinov2_cls", "dinov2_extractor", "load_torch_state_dict",
           "random_params", "param_shapes", "torch_bicubic_resize",
           "ARCHS"]

# arch -> (embed_dim, depth, num_heads)
ARCHS = {
    "vits14": (384, 12, 6),
    "vitb14": (768, 12, 12),
    "vitl14": (1024, 24, 16),
}
PATCH = 14
TRAIN_GRID = 37  # 518 / 14 — the pretrained pos-embed grid


def _cubic_weights(frac, a=-0.75):
    """Cubic convolution weights for taps at offsets (-1, 0, 1, 2)."""
    x = np.stack([frac + 1.0, frac, 1.0 - frac, 2.0 - frac])
    ax = np.abs(x)
    w_near = ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0
    w_far = (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a
    return np.where(ax <= 1.0, w_near, w_far)


def torch_bicubic_resize(x: jnp.ndarray, out_h: int, out_w: int,
                         scale_h: float = None, scale_w: float = None):
    """torch ``F.interpolate(mode="bicubic", align_corners=False,
    antialias=False)`` on (..., H, W, C): half-pixel centers, cubic
    convolution a=-0.75, border-clamped taps.

    scale_h/scale_w: explicit src/dst coordinate scales — torch uses
    ``1/scale_factor`` instead of ``in/out`` when the caller passes
    ``scale_factor=`` (the dinov2 interpolate_offset path)."""
    H, W = x.shape[-3:-1]

    def axis(in_size, out_size, scale):
        if scale is None:
            scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        base = np.floor(src).astype(np.int64)
        frac = src - base
        idx = np.clip(base[None] + np.array([[-1], [0], [1], [2]]),
                      0, in_size - 1)                       # (4, out)
        return jnp.asarray(idx), jnp.asarray(
            _cubic_weights(frac), jnp.float32)              # (4, out)

    yi, yw = axis(H, out_h, scale_h)
    xi, xw = axis(W, out_w, scale_w)
    x = x.astype(jnp.float32)
    rows = sum(jnp.take(x, yi[t], axis=-3) * yw[t][:, None, None]
               for t in range(4))
    return sum(jnp.take(rows, xi[t], axis=-2) * xw[t][:, None]
               for t in range(4))


def _interp_pos_embed(pos_embed, grid_h, grid_w, offset: float = 0.1):
    """dinov2 interpolate_pos_encoding: cls part kept, grid part
    bicubic-resized from TRAIN_GRID^2 to grid_h x grid_w.

    dinov2's default ``interpolate_offset=0.1`` passes
    ``scale_factor=(grid+0.1)/M`` to F.interpolate, so the coordinate
    scale torch actually uses is ``M/(grid+0.1)`` — NOT ``M/grid``
    (dinov2 vision_transformer.py interpolate_pos_encoding).  Replicated
    here for feature parity with the hub model."""
    cls_pe, grid_pe = pos_embed[:, :1], pos_embed[:, 1:]
    n = grid_pe.shape[1]
    side = int(round(float(np.sqrt(n))))
    if (grid_h, grid_w) != (side, side):
        g = grid_pe.reshape(1, side, side, -1)
        g = torch_bicubic_resize(
            g, grid_h, grid_w,
            scale_h=side / (grid_h + offset) if offset else None,
            scale_w=side / (grid_w + offset) if offset else None)
        grid_pe = g.reshape(1, grid_h * grid_w, -1)
    return cls_pe, grid_pe


def _layer_norm(x, p, eps=1e-6):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _attention(x, p, num_heads):
    B, N, D = x.shape
    qkv = x @ p["qkv_w"].T + p["qkv_b"]                     # (B, N, 3D)
    qkv = qkv.reshape(B, N, 3, num_heads, D // num_heads)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D // num_heads)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
    return out @ p["proj_w"].T + p["proj_b"]


def _block(x, p, num_heads):
    y = _attention(_layer_norm(x, p["norm1"]), p["attn"], num_heads)
    x = x + y * p["ls1"]
    y = _layer_norm(x, p["norm2"])
    y = jax.nn.gelu(y @ p["mlp_fc1_w"].T + p["mlp_fc1_b"], approximate=False)
    y = y @ p["mlp_fc2_w"].T + p["mlp_fc2_b"]
    return x + y * p["ls2"]


@functools.partial(jax.jit, static_argnames=("arch",))
def dinov2_cls(params, x, arch: str = "vitl14"):
    """Class-token embedding for images (B, C, H, W), ImageNet-normalized
    floats, H/W divisible by 14.  Returns (B, embed_dim)."""
    dim, depth, heads = ARCHS[arch]
    B, C, H, W = x.shape
    gh, gw = H // PATCH, W // PATCH
    x = jnp.transpose(x.astype(jnp.float32), (0, 2, 3, 1))
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["w"], (PATCH, PATCH), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x.reshape(B, gh * gw, dim) + params["patch_embed"]["b"]
    cls_pe, grid_pe = _interp_pos_embed(params["pos_embed"], gh, gw)
    cls = jnp.broadcast_to(params["cls_token"] + cls_pe, (B, 1, dim))
    x = jnp.concatenate([cls, x + grid_pe], axis=1)
    for i in range(depth):
        x = _block(x, params[f"block{i}"], heads)
    x = _layer_norm(x, params["norm"])
    return x[:, 0]


_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def dinov2_extractor(params, arch: str = "vitl14", batch: int = 32,
                     resolution: int = 224):
    """(B, C, H, W) uint8 [0,255] -> (B, embed_dim) FDD features: bicubic
    resize to 224 + ImageNet normalization (torchmetric_fdd.py:93-105)."""

    def extract(imgs: np.ndarray) -> np.ndarray:
        imgs = np.asarray(imgs)
        if imgs.ndim == 3:
            imgs = imgs[None]
        outs = []
        for i in range(0, imgs.shape[0], batch):
            c = jnp.asarray(imgs[i:i + batch], jnp.float32) / 255.0
            c = jnp.transpose(c, (0, 2, 3, 1))
            c = torch_bicubic_resize(c, resolution, resolution)
            c = (c - _IMAGENET_MEAN) / _IMAGENET_STD
            c = jnp.transpose(c, (0, 3, 1, 2))
            outs.append(np.asarray(dinov2_cls(params, c, arch)))
        return np.concatenate(outs, axis=0)

    return extract


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def param_shapes(arch: str = "vitl14") -> Dict:
    dim, depth, _ = ARCHS[arch]
    shapes = {
        "patch_embed": {"w": (PATCH, PATCH, 3, dim), "b": (dim,)},
        "cls_token": (1, 1, dim),
        "pos_embed": (1, 1 + TRAIN_GRID * TRAIN_GRID, dim),
        "norm": {"scale": (dim,), "bias": (dim,)},
    }
    for i in range(depth):
        shapes[f"block{i}"] = {
            "norm1": {"scale": (dim,), "bias": (dim,)},
            "attn": {"qkv_w": (3 * dim, dim), "qkv_b": (3 * dim,),
                     "proj_w": (dim, dim), "proj_b": (dim,)},
            "ls1": (dim,),
            "norm2": {"scale": (dim,), "bias": (dim,)},
            "mlp_fc1_w": (4 * dim, dim), "mlp_fc1_b": (4 * dim,),
            "mlp_fc2_w": (dim, 4 * dim), "mlp_fc2_b": (dim,),
            "ls2": (dim,),
        }
    return shapes


def random_params(seed: int = 0, arch: str = "vitl14"):
    rng = np.random.default_rng(seed)

    def make(sh):
        if isinstance(sh, dict):
            return {k: make(v) for k, v in sh.items()}
        fan_in = sh[-1] if len(sh) > 1 else sh[0]
        return jnp.asarray(rng.standard_normal(sh) / np.sqrt(fan_in),
                           jnp.float32)

    params = make(param_shapes(arch))
    # sane norm/LayerScale defaults so the forward stays well-conditioned
    dim, depth, _ = ARCHS[arch]
    for i in range(depth):
        b = params[f"block{i}"]
        for n in ("norm1", "norm2"):
            b[n] = {"scale": jnp.ones(dim), "bias": jnp.zeros(dim)}
        b["ls1"] = jnp.full((dim,), 0.5)
        b["ls2"] = jnp.full((dim,), 0.5)
    params["norm"] = {"scale": jnp.ones(dim), "bias": jnp.zeros(dim)}
    return params


def load_torch_state_dict(state_dict, arch: str = "vitl14") -> Dict:
    """Map the dinov2 torch hub state dict onto the JAX tree."""
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)())
          for k, v in state_dict.items()}
    dim, depth, _ = ARCHS[arch]
    missing = []

    def get(key, transpose=None):
        if key not in sd:
            missing.append(key)
            return None
        arr = sd[key]
        if transpose is not None:
            arr = np.transpose(arr, transpose)
        return jnp.asarray(arr, jnp.float32)

    params = {
        "patch_embed": {
            "w": get("patch_embed.proj.weight", (2, 3, 1, 0)),
            "b": get("patch_embed.proj.bias")},
        "cls_token": get("cls_token"),
        "pos_embed": get("pos_embed"),
        "norm": {"scale": get("norm.weight"), "bias": get("norm.bias")},
    }
    for i in range(depth):
        b = f"blocks.{i}"
        params[f"block{i}"] = {
            "norm1": {"scale": get(f"{b}.norm1.weight"),
                      "bias": get(f"{b}.norm1.bias")},
            "attn": {"qkv_w": get(f"{b}.attn.qkv.weight"),
                     "qkv_b": get(f"{b}.attn.qkv.bias"),
                     "proj_w": get(f"{b}.attn.proj.weight"),
                     "proj_b": get(f"{b}.attn.proj.bias")},
            "ls1": get(f"{b}.ls1.gamma"),
            "norm2": {"scale": get(f"{b}.norm2.weight"),
                      "bias": get(f"{b}.norm2.bias")},
            "mlp_fc1_w": get(f"{b}.mlp.fc1.weight"),
            "mlp_fc1_b": get(f"{b}.mlp.fc1.bias"),
            "mlp_fc2_w": get(f"{b}.mlp.fc2.weight"),
            "mlp_fc2_b": get(f"{b}.mlp.fc2.bias"),
            "ls2": get(f"{b}.ls2.gamma"),
        }
    if missing:
        raise KeyError(f"state dict is missing {len(missing)} keys, e.g. "
                       f"{missing[:4]} — not a dinov2_{arch} checkpoint?")
    return params
