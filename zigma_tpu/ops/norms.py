"""Norms with the Mamba prenorm-residual contract.

The reference fuses residual-add + RMSNorm/LayerNorm in a Triton kernel
(dis_mamba/mamba_ssm/ops/triton/layernorm.py) because eager PyTorch would
materialize intermediates.  Under XLA these elementwise+reduction chains fuse
automatically, so plain jnp expressions are already "the fused kernel"; what
must be preserved is the *contract*:

    residual = x + residual            (kept in float32 if requested)
    out      = norm(residual)          (in the param dtype)

with ``prenorm=True`` returning both.  (reference: layernorm.py:464-504,
mamba block usage model_zigma.py:406-438.)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["rms_norm", "layer_norm", "add_norm"]


def rms_norm(x, weight, bias=None, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(x, weight=None, bias=None, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def add_norm(
    x,
    weight,
    bias=None,
    residual=None,
    *,
    kind: str = "rms",
    eps: float = 1e-5,
    prenorm: bool = False,
    residual_in_fp32: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Fused-add-norm contract: ``residual = x (+ residual); out = norm(residual)``.

    Returns ``(out, residual)`` when prenorm else just ``out``.
    """
    res = x if residual is None else x.astype(residual.dtype) + residual
    if residual_in_fp32:
        res = res.astype(jnp.float32)
    norm_fn = rms_norm if kind == "rms" else layer_norm
    # normalize the (possibly fp32) residual directly — the reference's
    # fused kernel does the same (layernorm.py:464-504); downcasting first
    # would re-quantize the accumulated residual every block
    out = norm_fn(res, weight, bias, eps).astype(x.dtype)
    return (out, res) if prenorm else out
