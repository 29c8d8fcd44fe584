"""Native JAX SD-VAE (AutoencoderKL, f8/4ch) encoder + decoder.

The reference decodes latents with the diffusers ``AutoencoderKL``
(``sd-vae-ft-ema``; reference: train_acc.py:229-241, sample_acc.py:365).
diffusers is not part of this build environment at all, so a host-torch
fallback cannot exist here — this module IS the latent codec's compute
path, in pure JAX (NHWC, TPU-friendly), with a converter from the
diffusers state-dict layout.

Architecture (the standard SD f8 KL autoencoder):

- Encoder: conv_in 3->128; down blocks at [128, 256, 512, 512] with 2
  resnets each and a stride-2 conv (asymmetric (0,1) pad) between levels;
  mid resnet/attention/resnet; GroupNorm(32, eps 1e-6) + silu + conv_out
  -> 8 (mean ++ logvar); quant_conv 1x1.
- Decoder: post_quant_conv 1x1; conv_in 4->512; mid resnet/attn/resnet;
  up blocks at [512, 512, 256, 128] with 3 resnets each and
  nearest-x2-upsample + conv between levels; GroupNorm + silu + conv_out
  -> 3.
- ResnetBlock: GN + silu + conv3x3, twice; 1x1 shortcut on channel change.
  AttnBlock: GN + 1x1 q/k/v, full spatial attention, 1x1 proj, residual.

The 0.18215 latent scale stays at the train/sample layer (the codec works
on RAW latents), matching the shard contract (train_acc.py:432).
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["vae_decode", "vae_encode", "load_torch_state_dict",
           "random_params", "CHANNELS"]

CHANNELS: Sequence[int] = (128, 256, 512, 512)
Z_CH = 4


def _group_norm(x, p, groups=32, eps=1e-6):
    """GroupNorm over NHWC."""
    B, H, W, C = x.shape
    g = x.reshape(B, H, W, groups, C // groups)
    mu = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean((g - mu) ** 2, axis=(1, 2, 4), keepdims=True)
    g = (g - mu) * jax.lax.rsqrt(var + eps)
    return g.reshape(B, H, W, C) * p["scale"] + p["bias"]


def _conv(x, p, stride=1, pad=1):
    pads = pad if isinstance(pad, (list, tuple)) else [(pad, pad), (pad, pad)]
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def _resnet(x, p):
    h = _conv(jax.nn.silu(_group_norm(x, p["norm1"])), p["conv1"])
    h = _conv(jax.nn.silu(_group_norm(h, p["norm2"])), p["conv2"])
    if "shortcut" in p:
        x = _conv(x, p["shortcut"], pad=0)
    return x + h


def _attn(x, p):
    B, H, W, C = x.shape
    h = _group_norm(x, p["norm"])
    q = (h.reshape(B, H * W, C) @ p["q"]["w"] + p["q"]["b"])
    k = (h.reshape(B, H * W, C) @ p["k"]["w"] + p["k"]["b"])
    v = (h.reshape(B, H * W, C) @ p["v"]["w"] + p["v"]["b"])
    att = jax.nn.softmax(q @ jnp.swapaxes(k, 1, 2) / np.sqrt(C), axis=-1)
    h = (att @ v) @ p["proj"]["w"] + p["proj"]["b"]
    return x + h.reshape(B, H, W, C)


def _mid(x, p):
    x = _resnet(x, p["res1"])
    x = _attn(x, p["attn"])
    return _resnet(x, p["res2"])


@jax.jit
def vae_encode(params, images, rng=None):
    """(B, 3, H, W) in [-1, 1] -> RAW latents (B, 4, H/8, W/8).

    rng None -> posterior mean (the reference uses .sample() for shard
    prep but mean for deterministic paths); pass a PRNGKey to sample."""
    p = params["encoder"]
    x = jnp.transpose(images.astype(jnp.float32), (0, 2, 3, 1))
    x = _conv(x, p["conv_in"])
    for i in range(len(CHANNELS)):
        for j in range(2):
            x = _resnet(x, p[f"down{i}_res{j}"])
        if i < len(CHANNELS) - 1:
            # diffusers Downsample2d: asymmetric (0, 1) pad, stride 2
            x = _conv(x, p[f"down{i}_conv"], stride=2, pad=[(0, 1), (0, 1)])
    x = _mid(x, p["mid"])
    x = _conv(jax.nn.silu(_group_norm(x, p["norm_out"])), p["conv_out"])
    x = _conv(x, params["quant_conv"], pad=0)
    mean, logvar = jnp.split(x, 2, axis=-1)
    if rng is not None:
        logvar = jnp.clip(logvar, -30.0, 20.0)
        mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape)
    return jnp.transpose(mean, (0, 3, 1, 2))


@jax.jit
def vae_decode(params, latents):
    """RAW latents (B, 4, h, w) -> images (B, 3, 8h, 8w) in [-1, 1]."""
    p = params["decoder"]
    x = jnp.transpose(latents.astype(jnp.float32), (0, 2, 3, 1))
    x = _conv(x, params["post_quant_conv"], pad=0)
    x = _conv(x, p["conv_in"])
    x = _mid(x, p["mid"])
    for i in range(len(CHANNELS)):
        for j in range(3):
            x = _resnet(x, p[f"up{i}_res{j}"])
        if i < len(CHANNELS) - 1:
            B, H, W, C = x.shape
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = _conv(x, p[f"up{i}_conv"])
    x = _conv(jax.nn.silu(_group_norm(x, p["norm_out"])), p["conv_out"])
    return jnp.transpose(x, (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def _shapes(scale: int = 1):
    """Channel plan with an optional downscale factor for tiny test nets."""
    chs = [max(c // scale, 32) for c in CHANNELS]
    return chs


def random_params(seed: int = 0, scale: int = 4):
    """Random, correctly-structured tree; ``scale`` shrinks channels for
    tests (scale=1 is the real SD-VAE size; channels must stay multiples
    of the 32 GroupNorm groups, so scale <= 4)."""
    rng = np.random.default_rng(seed)
    chs = _shapes(scale)

    def conv(cin, cout, k=3):
        he = np.sqrt(2.0 / (k * k * cin))
        return {"w": jnp.asarray(rng.standard_normal((k, k, cin, cout))
                                 * he, jnp.float32),
                "b": jnp.zeros((cout,), jnp.float32)}

    def norm(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    def res(cin, cout):
        p = {"norm1": norm(cin), "conv1": conv(cin, cout),
             "norm2": norm(cout), "conv2": conv(cout, cout)}
        if cin != cout:
            p["shortcut"] = conv(cin, cout, k=1)
        return p

    def lin(c):
        return {"w": jnp.asarray(rng.standard_normal((c, c))
                                 / np.sqrt(c), jnp.float32),
                "b": jnp.zeros((c,), jnp.float32)}

    def attn(c):
        return {"norm": norm(c), "q": lin(c), "k": lin(c), "v": lin(c),
                "proj": lin(c)}

    def mid(c):
        return {"res1": res(c, c), "attn": attn(c), "res2": res(c, c)}

    enc = {"conv_in": conv(3, chs[0]), "mid": mid(chs[-1]),
           "norm_out": norm(chs[-1]),
           "conv_out": conv(chs[-1], 2 * Z_CH)}
    cin = chs[0]
    for i, c in enumerate(chs):
        for j in range(2):
            enc[f"down{i}_res{j}"] = res(cin if j == 0 else c, c)
        if i < len(chs) - 1:
            enc[f"down{i}_conv"] = conv(c, c)
        cin = c

    dec_chs = chs[::-1]  # [512, 512, 256, 128] pattern
    dec = {"conv_in": conv(Z_CH, dec_chs[0]), "mid": mid(dec_chs[0]),
           "norm_out": norm(dec_chs[-1]),
           "conv_out": conv(dec_chs[-1], 3)}
    cin = dec_chs[0]
    for i, c in enumerate(dec_chs):
        for j in range(3):
            dec[f"up{i}_res{j}"] = res(cin if j == 0 else c, c)
        if i < len(dec_chs) - 1:
            dec[f"up{i}_conv"] = conv(c, c)
        cin = c

    return {"encoder": enc, "decoder": dec,
            "quant_conv": conv(2 * Z_CH, 2 * Z_CH, k=1),
            "post_quant_conv": conv(Z_CH, Z_CH, k=1)}


def load_torch_state_dict(state_dict) -> Dict:
    """Map a diffusers ``AutoencoderKL`` state dict (sd-vae-ft-ema /
    SD-1.x vae) onto the JAX tree."""
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)())
          for k, v in state_dict.items()}
    missing = []

    def conv(prefix):
        wk, bk = f"{prefix}.weight", f"{prefix}.bias"
        if wk not in sd:
            missing.append(wk)
            return {}
        w = sd[wk]
        if w.ndim == 4:
            w = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        return {"w": jnp.asarray(w, jnp.float32),
                "b": jnp.asarray(sd.get(bk, np.zeros(w.shape[-1])),
                                 jnp.float32)}

    def lin(prefix):
        """Attention q/k/v/proj: diffusers stores Linear (out, in) (newer)
        or 1x1 Conv (out, in, 1, 1) (older) — normalize to (in, out)."""
        wk = f"{prefix}.weight"
        if wk not in sd:
            missing.append(wk)
            return {}
        w = sd[wk]
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        return {"w": jnp.asarray(w.T, jnp.float32),
                "b": jnp.asarray(sd.get(f"{prefix}.bias",
                                        np.zeros(w.shape[0])), jnp.float32)}

    def norm(prefix):
        wk = f"{prefix}.weight"
        if wk not in sd:
            missing.append(wk)
            return {}
        return {"scale": jnp.asarray(sd[wk], jnp.float32),
                "bias": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)}

    def res(prefix):
        p = {"norm1": norm(f"{prefix}.norm1"),
             "conv1": conv(f"{prefix}.conv1"),
             "norm2": norm(f"{prefix}.norm2"),
             "conv2": conv(f"{prefix}.conv2")}
        if f"{prefix}.conv_shortcut.weight" in sd:
            p["shortcut"] = conv(f"{prefix}.conv_shortcut")
        return p

    def attn(prefix):
        # diffusers >=0.15 names: to_q/to_k/to_v/to_out.0; older: q/k/v/proj_attn
        newer = f"{prefix}.to_q.weight" in sd
        qn, kn, vn, on = (("to_q", "to_k", "to_v", "to_out.0") if newer
                          else ("query", "key", "value", "proj_attn"))
        return {"norm": norm(f"{prefix}.group_norm"),
                "q": lin(f"{prefix}.{qn}"), "k": lin(f"{prefix}.{kn}"),
                "v": lin(f"{prefix}.{vn}"), "proj": lin(f"{prefix}.{on}")}

    def mid(prefix):
        return {"res1": res(f"{prefix}.resnets.0"),
                "attn": attn(f"{prefix}.attentions.0"),
                "res2": res(f"{prefix}.resnets.1")}

    enc = {"conv_in": conv("encoder.conv_in"),
           "mid": mid("encoder.mid_block"),
           "norm_out": norm("encoder.conv_norm_out"),
           "conv_out": conv("encoder.conv_out")}
    for i in range(len(CHANNELS)):
        for j in range(2):
            enc[f"down{i}_res{j}"] = res(
                f"encoder.down_blocks.{i}.resnets.{j}")
        if i < len(CHANNELS) - 1:
            enc[f"down{i}_conv"] = conv(
                f"encoder.down_blocks.{i}.downsamplers.0.conv")
    dec = {"conv_in": conv("decoder.conv_in"),
           "mid": mid("decoder.mid_block"),
           "norm_out": norm("decoder.conv_norm_out"),
           "conv_out": conv("decoder.conv_out")}
    for i in range(len(CHANNELS)):
        for j in range(3):
            dec[f"up{i}_res{j}"] = res(
                f"decoder.up_blocks.{i}.resnets.{j}")
        if i < len(CHANNELS) - 1:
            dec[f"up{i}_conv"] = conv(
                f"decoder.up_blocks.{i}.upsamplers.0.conv")
    params = {"encoder": enc, "decoder": dec,
              "quant_conv": conv("quant_conv"),
              "post_quant_conv": conv("post_quant_conv")}
    if missing:
        raise KeyError(f"state dict is missing {len(missing)} keys, e.g. "
                       f"{missing[:4]} — not a diffusers AutoencoderKL?")
    return params
