"""Native JAX CLIP text tower (ViT-L/14 text encoder).

The reference encodes captions with HF ``CLIPTextModel``
(reference: datasets/clip.py:13-48) to precompute the
``caption_clip_feature.npy`` shard entries.  This is that transformer in
pure JAX — so caption-feature preparation can run on the accelerator — with
a converter from the HF state dict.  The tokenizer stays host-side (it is
string processing; ``FrozenCLIPEmbedder`` in ``data/text.py`` wires both).

Architecture (openai/clip-vit-large-patch14 text_model):

- token embedding (vocab 49408) + learned positional embedding (77),
- 12 pre-norm blocks (LayerNorm eps 1e-5): causal MHSA (12 heads) and
  MLP with **quick-gelu** (``x * sigmoid(1.702 x)``),
- final LayerNorm; output = last_hidden_state (B, 77, 768).

Tested against the installed ``transformers`` torch implementation with
randomly-initialized weights (no downloads needed).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["clip_text_forward", "load_torch_state_dict", "random_params",
           "CONFIG"]

# openai/clip-vit-large-patch14 text tower
CONFIG = {"vocab": 49408, "dim": 768, "depth": 12, "heads": 12,
          "mlp": 3072, "ctx": 77}


def _layer_norm(x, p, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _attention(x, p, heads, mask):
    B, N, D = x.shape
    hd = D // heads

    def proj(name):
        return x @ p[f"{name}_w"].T + p[f"{name}_b"]

    q = proj("q").reshape(B, N, heads, hd).transpose(0, 2, 1, 3)
    k = proj("k").reshape(B, N, heads, hd).transpose(0, 2, 1, 3)
    v = proj("v").reshape(B, N, heads, hd).transpose(0, 2, 1, 3)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
    att = jax.nn.softmax(att + mask, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
    return out @ p["out_w"].T + p["out_b"]


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


@functools.partial(jax.jit, static_argnames=("heads",))
def clip_text_forward(params, input_ids, heads: int = CONFIG["heads"]):
    """last_hidden_state for token ids (B, L) int32, L <= 77."""
    B, L = input_ids.shape
    depth = sum(1 for k in params if k.startswith("block"))
    x = params["token_embedding"][input_ids]
    x = x + params["position_embedding"][:L]
    # causal mask (CLIP text is autoregressive-masked)
    mask = jnp.where(
        jnp.arange(L)[None, :] <= jnp.arange(L)[:, None], 0.0, -jnp.inf)
    for i in range(depth):
        p = params[f"block{i}"]
        x = x + _attention(_layer_norm(x, p["ln1"]), p["attn"], heads, mask)
        y = _layer_norm(x, p["ln2"])
        y = _quick_gelu(y @ p["fc1_w"].T + p["fc1_b"])
        x = x + (y @ p["fc2_w"].T + p["fc2_b"])
    return _layer_norm(x, params["final_ln"])


def random_params(seed: int = 0, cfg: Dict = None):
    cfg = dict(CONFIG, **(cfg or {}))
    rng = np.random.default_rng(seed)
    d, m = cfg["dim"], cfg["mlp"]

    def lin(rows, cols):
        return (jnp.asarray(rng.standard_normal((rows, cols))
                            / np.sqrt(cols), jnp.float32),
                jnp.asarray(0.02 * rng.standard_normal(rows), jnp.float32))

    params = {
        "token_embedding": jnp.asarray(
            0.02 * rng.standard_normal((cfg["vocab"], d)), jnp.float32),
        "position_embedding": jnp.asarray(
            0.01 * rng.standard_normal((cfg["ctx"], d)), jnp.float32),
        "final_ln": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
    }
    for i in range(cfg["depth"]):
        qw, qb = lin(d, d)
        kw, kb = lin(d, d)
        vw, vb = lin(d, d)
        ow, ob = lin(d, d)
        f1w, f1b = lin(m, d)
        f2w, f2b = lin(d, m)
        params[f"block{i}"] = {
            "ln1": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
            "attn": {"q_w": qw, "q_b": qb, "k_w": kw, "k_b": kb,
                     "v_w": vw, "v_b": vb, "out_w": ow, "out_b": ob},
            "ln2": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
            "fc1_w": f1w, "fc1_b": f1b, "fc2_w": f2w, "fc2_b": f2b,
        }
    return params


def load_torch_state_dict(state_dict, cfg: Dict = None) -> Dict:
    """Map an HF ``CLIPTextModel`` state dict onto the JAX tree.  Accepts
    keys with or without the ``text_model.`` prefix."""
    cfg = dict(CONFIG, **(cfg or {}))
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("text_model."):
            k = k[len("text_model."):]
        sd[k] = np.asarray(getattr(v, "numpy", lambda: v)())
    missing = []

    def get(key):
        if key not in sd:
            missing.append(key)
            return None
        return jnp.asarray(sd[key], jnp.float32)

    params = {
        "token_embedding": get("embeddings.token_embedding.weight"),
        "position_embedding": get("embeddings.position_embedding.weight"),
        "final_ln": {"scale": get("final_layer_norm.weight"),
                     "bias": get("final_layer_norm.bias")},
    }
    for i in range(cfg["depth"]):
        b = f"encoder.layers.{i}"
        params[f"block{i}"] = {
            "ln1": {"scale": get(f"{b}.layer_norm1.weight"),
                    "bias": get(f"{b}.layer_norm1.bias")},
            "attn": {
                "q_w": get(f"{b}.self_attn.q_proj.weight"),
                "q_b": get(f"{b}.self_attn.q_proj.bias"),
                "k_w": get(f"{b}.self_attn.k_proj.weight"),
                "k_b": get(f"{b}.self_attn.k_proj.bias"),
                "v_w": get(f"{b}.self_attn.v_proj.weight"),
                "v_b": get(f"{b}.self_attn.v_proj.bias"),
                "out_w": get(f"{b}.self_attn.out_proj.weight"),
                "out_b": get(f"{b}.self_attn.out_proj.bias")},
            "ln2": {"scale": get(f"{b}.layer_norm2.weight"),
                    "bias": get(f"{b}.layer_norm2.bias")},
            "fc1_w": get(f"{b}.mlp.fc1.weight"),
            "fc1_b": get(f"{b}.mlp.fc1.bias"),
            "fc2_w": get(f"{b}.mlp.fc2.weight"),
            "fc2_b": get(f"{b}.mlp.fc2.bias"),
        }
    if missing:
        raise KeyError(f"state dict is missing {len(missing)} keys, e.g. "
                       f"{missing[:4]} — not a CLIPTextModel checkpoint?")
    return params
