"""Causal depthwise 1-D convolution (widths 2-4) with optional fused SiLU.

TPU-native equivalent of the reference CUDA kernels
(``dis_causal_conv1d/csrc/causal_conv1d_{fwd,bwd,update}.cu``).  Layout is
``(batch, seq, channels)`` — the channels-last layout the reference only
offers as a special kernel variant is the natural one on TPU.

A width-W depthwise causal conv is just W shifted multiply-adds; expressing
it as such (rather than ``lax.conv_general_dilated``) lets XLA fuse it into
neighbouring elementwise work with zero copies.  Gradients come from JAX
autodiff (the reference hand-writes ``causal_conv1d_bwd.cu``; autodiff of W
shifted FMAs produces the identical computation).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["causal_conv1d", "causal_conv1d_ref", "causal_conv1d_update"]


def causal_conv1d(
    x,
    weight,
    bias: Optional[jax.Array] = None,
    activation: Optional[str] = "silu",
    initial_state: Optional[jax.Array] = None,
    accum_dtype: Optional[jax.typing.DTypeLike] = None,
):
    """Depthwise causal conv.

    Args:
      x: (batch, L, D).
      weight: (D, W) filter taps, tap ``W-1`` multiplies the current step
        (matches the reference's squeezed ``conv1d.weight`` layout
        ``(d, 1, w) -> (d, w)``).
      bias: optional (D,).
      activation: None | "silu"/"swish".
      initial_state: optional (batch, W-1, D) left context (for chunked
        prefill); defaults to zeros (causal left-padding).
      accum_dtype: tap accumulation dtype; None (default) computes in
        x.dtype, ``jnp.float32`` reproduces the reference CUDA kernel's
        fp32 accumulation for bf16 inputs (see comment below).
    Returns (batch, L, D) in x.dtype.
    """
    if activation not in (None, "silu", "swish"):
        raise ValueError(f"unsupported activation {activation!r}")
    B, L, D = x.shape
    W = weight.shape[-1]
    # Default: compute in x.dtype.  The reference CUDA kernel accumulates in
    # fp32 (causal_conv1d_fwd.cu), but here the consumer (the bf16 scan
    # kernel / x_proj GEMM) truncates straight back to bf16, so fp32 taps
    # only buy one rounding step — while costing ~200 MiB/layer of
    # materialized fp32 intermediates on the flagship (measured
    # 0.20 -> 0.08 ms/layer).  In fp32 mode (parity tests, fp32 models) this
    # IS full fp32 compute.  The measured end-to-end bf16 divergence of the
    # x.dtype choice is recorded in docs/DESIGN.md §"bf16 conv accumulation";
    # pass accum_dtype=jnp.float32 (Mamba: conv_fp32_taps=True) to force the
    # reference behavior.
    cdtype = x.dtype if accum_dtype is None else jnp.dtype(accum_dtype)
    xf = x.astype(cdtype)
    wf = weight.astype(cdtype)
    if initial_state is None:
        pad = jnp.zeros((B, W - 1, D), cdtype)
    else:
        pad = initial_state.astype(cdtype)
    xp = jnp.concatenate([pad, xf], axis=1)  # (B, L+W-1, D)
    y = jnp.zeros((B, L, D), cdtype)
    for k in range(W):  # W is static and tiny (2..4): unrolled shifted FMAs
        y = y + xp[:, k : k + L, :] * wf[:, k]
    if bias is not None:
        y = y + bias.astype(cdtype)
    if activation is not None:
        y = jax.nn.silu(y)
    return y.astype(x.dtype)


# The shifted-FMA formulation *is* the reference implementation; keep an
# alias so parity tests mirror the reference's fn/ref pairing.
causal_conv1d_ref = causal_conv1d


def causal_conv1d_update(x, conv_state, weight, bias=None, activation="silu",
                         accum_dtype=None):
    """Single-token decode step with a rolling conv state.

    Functional equivalent of ``causal_conv1d_update.cu:26-95`` — the state is
    returned, not mutated in place.  ``accum_dtype`` must match the parallel
    conv's setting for bitwise prefill/decode consistency.

    x: (batch, D) new token; conv_state: (batch, W, D) rolling window whose
    last slot is the most recent token.  Returns (y, new_state).
    """
    B, D = x.shape
    W = weight.shape[-1]
    new_state = jnp.concatenate([conv_state[:, 1:], x[:, None, :]], axis=1)
    # Same unrolled shifted-FMA form (and accumulation ORDER) as
    # causal_conv1d: prefill and step must be the same function for
    # cache-consistency.  An einsum here would accumulate through
    # dot_general (fp32 accumulation for bf16 inputs) and diverge from the
    # parallel conv's x.dtype adds by one rounding step per tap.
    cdtype = x.dtype if accum_dtype is None else jnp.dtype(accum_dtype)
    wf = weight.astype(cdtype)
    st = new_state.astype(cdtype)
    y = jnp.zeros_like(st[:, 0])
    for k in range(W):
        y = y + st[:, k, :] * wf[:, k]
    if bias is not None:
        y = y + bias.astype(cdtype)
    if activation in ("silu", "swish"):
        y = jax.nn.silu(y)
    elif activation is not None:
        raise ValueError(f"unsupported activation {activation!r}")
    return y.astype(x.dtype), new_state
