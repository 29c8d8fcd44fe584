"""Sequence-parallel selective scan over a mesh axis.

The SSM analogue of ring attention.  The reference handles long sequences
strictly within one device (kernel-internal chunking + gradient
checkpointing; SURVEY.md §2.4 — "No ring attention, no Ulysses, no context
parallelism exists in the reference").  Because the scan's combine
``(a1, b1) ∘ (a2, b2) = (a1·a2, a2·b1 + b2)`` is associative, the sequence
axis CAN be sharded across chips:

1. each shard scans its local tokens from a zero state and exposes its
   aggregate: the shard decay ``a_s = exp(A · Σ_t delta)`` (computable from
   one cheap reduction) and its local final state ``x_s``;
2. a tiny ``all_gather`` over the axis (per shard: (B, N, D) + (B, D) —
   megabytes, rides the ICI) lets every shard form its incoming prefix
   state ``x_in = Σ_{r<s} (Π_{r<q<s} a_q) · x_r``;
3. the local scan re-runs seeded with ``x_in`` (the Pallas kernel takes an
   initial state), giving exact outputs.

Cost: 2x local scan FLOPs + one small collective -> wall-clock ~``2/n`` of
the single-chip scan for an n-way shard.  Gradients flow through both
kernel invocations' custom VJPs and the collective automatically.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["selective_scan_seq_parallel", "ssd_seq_parallel"]


def selective_scan_seq_parallel(u, delta, A, B, C, D=None, z=None,
                                delta_bias=None, delta_softplus: bool = False,
                                axis_name: str = "seq",
                                interpret: Optional[bool] = None):
    """Selective scan where the L axis is sharded over ``axis_name``.

    Call inside ``shard_map``/``pjit`` with u/delta/B/C/z sharded on L and
    A/D/delta_bias replicated.  Per-shard shapes: u, delta, z (B, L_s, D);
    B, C (B, L_s, N).  Returns the local (B, L_s, D) slice of the output.
    """
    from zigma_tpu.ops.scan_pallas import _core_full, _core_x0

    if interpret is None:
        # the kernels are Mosaic TPU programs; interpret everywhere else
        interpret = jax.default_backend() != "tpu"
    batch, L_s, d_inner = u.shape
    N = A.shape[1]
    bias = (delta_bias if delta_bias is not None
            else jnp.zeros((d_inner,), jnp.float32))
    cfg = (bool(delta_softplus), bool(interpret))

    idx = jax.lax.axis_index(axis_name)
    n_shards = jax.lax.axis_size(axis_name)

    # --- pass 1: local scan from zero state; expose the aggregate ---------
    x0_zero = jnp.zeros((batch, N, d_inner), jnp.float32)
    _, x_local = _core_full(cfg, u, delta, A, B, C, bias, x0_zero)

    # shard decay a_s(d, n) = exp(A * sum_t softplus(delta + bias))
    dt = delta.astype(jnp.float32) + bias[None, None, :]
    if delta_softplus:
        dt = jax.nn.softplus(dt)
    sum_dt = jnp.sum(dt, axis=1)                        # (B, D)
    log_a = sum_dt[:, None, :] * jnp.asarray(A, jnp.float32).T[None]  # (B,N,D)

    # --- prefix exchange: x_in = sum_{r<idx} (prod_{r<q<idx} a_q) x_r ------
    agg = jnp.stack([log_a, x_local])                   # (2, B, N, D)
    all_agg = jax.lax.all_gather(agg, axis_name)        # (S, 2, B, N, D)
    log_as, xs = all_agg[:, 0], all_agg[:, 1]

    shard_ids = jnp.arange(n_shards)
    # decay applied to shard r's state on its way to this shard:
    # sum of log_a over q in (r, idx)
    cum = jnp.cumsum(log_as, axis=0)                    # inclusive over shards
    # sum_{q <= idx-1} - sum_{q <= r} = sum over q in (r, idx-1]
    upto_here = jnp.where(idx > 0, cum[jnp.maximum(idx - 1, 0)], 0.0)
    mask = (shard_ids < idx)[:, None, None, None]
    # mask INSIDE the exponent: for r >= idx the raw exponent is large and
    # positive (log_a < 0, cum decreasing) and exp would overflow — inf
    # poisons gradients through jnp.where (the where-grad trap)
    log_decay = jnp.where(mask, upto_here[None] - cum, -1e30)
    x_in = jnp.sum(jnp.exp(log_decay) * xs, axis=0)

    # --- pass 2: exact local outputs seeded with the incoming state -------
    y = _core_x0(cfg, u, delta, A, B, C, bias, x_in)

    out = y.astype(jnp.float32)
    if D is not None:
        out = out + u.astype(jnp.float32) * D
    if z is not None:
        out = out * jax.nn.silu(z.astype(jnp.float32))
    return out.astype(u.dtype)


def ssd_seq_parallel(x, dt, A, B, C, D=None, z=None, dt_bias=None,
                     dt_softplus: bool = False, axis_name: str = "seq",
                     chunk: int = 128):
    """Sequence-parallel Mamba-2 SSD scan (ops/ssd.py) over ``axis_name``.

    Same two-pass associative-prefix structure as
    :func:`selective_scan_seq_parallel`, simpler because the SSD decay is a
    SCALAR per (batch, head): the shard aggregate is ``(log_a (b, H),
    state (b, H, P, N))`` and ``ssd_scan`` natively threads
    ``initial_state``/``return_last_state``.  Call inside shard_map with
    x/dt/B/C/z sharded on L and A/D/dt_bias replicated.  Exact forward and
    backward (AD through both passes and the all_gather).
    """
    from zigma_tpu.ops.ssd import ssd_scan

    idx = jax.lax.axis_index(axis_name)
    n_shards = jax.lax.axis_size(axis_name)

    # --- pass 1: local scan from zero; expose (log decay, final state) ----
    _, s_local = ssd_scan(x, dt, A, B, C, dt_bias=dt_bias,
                          dt_softplus=dt_softplus, return_last_state=True,
                          chunk=chunk)
    dtv = dt.astype(jnp.float32)
    if dt_bias is not None:
        dtv = dtv + dt_bias.astype(jnp.float32)[None, None]
    if dt_softplus:
        dtv = jax.nn.softplus(dtv)
    log_a = jnp.sum(dtv, axis=1) * A.astype(jnp.float32)[None]   # (b, H)

    # --- prefix exchange (same masked log-domain form as the Mamba-1
    # path: mask INSIDE the exponent to avoid the where-grad inf trap) ----
    log_as = jax.lax.all_gather(log_a, axis_name)                # (S, b, H)
    ss = jax.lax.all_gather(s_local, axis_name)                  # (S,b,H,P,N)
    cum = jnp.cumsum(log_as, axis=0)
    upto_here = jnp.where(idx > 0, cum[jnp.maximum(idx - 1, 0)], 0.0)
    mask = (jnp.arange(n_shards) < idx)[:, None, None]
    log_decay = jnp.where(mask, upto_here[None] - cum, -1e30)
    x_in = jnp.sum(jnp.exp(log_decay)[..., None, None] * ss, axis=0)

    # --- pass 2: exact local outputs seeded with the incoming state -------
    return ssd_scan(x, dt, A, B, C, D=D, z=z, dt_bias=dt_bias,
                    dt_softplus=dt_softplus, initial_state=x_in, chunk=chunk)
