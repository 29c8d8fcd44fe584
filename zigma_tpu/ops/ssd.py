"""State-space duality (SSD / Mamba-2) scan: the MXU-resident recurrence.

Beyond reference parity: the reference ships only the Mamba-1 selective
scan (per-(channel, state) decays — dis_mamba/csrc/selective_scan/), whose
TPU form is necessarily VPU-bound (docs/DESIGN.md §8: the flagship kernel
sits at the VPU issue floor, and the one remaining throughput lever named
there is "Mamba-2-style scalar-decay heads that move the recurrence onto
the MXU").  This module is that lever, implemented as a framework
capability: the Mamba-2 recurrence

    S_t = exp(dt_t * A_h) * S_{t-1} + dt_t * (B_t ⊗ x_t)      S: (P, N)
    y_t = S_t @ C_t + D_h * x_t                                per head h

where the decay ``exp(dt_t * A_h)`` is a SCALAR per (t, head) — unlike
Mamba-1's per-(channel, state) decay — which makes the recurrence a
*semiseparable matrix multiply*: within a chunk of Q tokens

    Y_intra = ((C B^T) ⊙ M) X        M_{t,s} = exp(cum_t − cum_s) · dt_s
    S_chunk = (B · decay_to_end · dt)^T X
    Y_inter = (C · decay_from_start) S_prev

— three dense matmuls per (chunk, head) plus a tiny O(L/Q) inter-chunk
scan.  Everything heavy is (Q,N)x(N,Q), (Q,Q)x(Q,P), (N,Q)x(Q,P),
(Q,N)x(N,P) matmuls: exactly what the 128x128 systolic array wants, so no
Pallas kernel is needed — XLA tiles these natively (the same reason the
projections in DESIGN.md §2 are plain jnp).

Numerical notes:

- decays/cumsums are computed in fp32 regardless of the activation dtype;
  matmul operands are cast to the input dtype (bf16 on the hot path).
  The (C Bᵀ) scores and the chunk aggregates request fp32 outputs
  (``preferred_element_type``); the two big Y einsums emit the compute
  dtype (a measured HBM-traffic choice, DESIGN.md §11) and are summed in
  fp32.  For fp32 inputs every einsum additionally requests
  ``precision="highest"`` — XLA:TPU otherwise lowers fp32 dots to
  single-pass bf16 multiplies, silently degrading the result to
  bf16-class accuracy (caught by the hardware gate).
- with A < 0 and dt >= 0 (always true after ``dt_softplus``), every
  exponent ``cum_t − cum_s`` (s <= t), ``cum_last − cum_q`` and ``cum_t``
  is <= 0, so the segment-sum trick cannot overflow.  Raw negative dt
  without softplus would break that guarantee — the module-level users
  always softplus.
- the inter-chunk state recurrence runs as a ``lax.scan`` over L/Q chunk
  aggregates in fp32 — sequential, but O(L/Q) tiny (H, P, N) updates.

Public API mirrors ``ops.selective_scan``:

  ssd_scan(x, dt, A, B, C, ...)      parallel form, ref/chunked backends
  ssd_state_update(state, x, dt, ...)  single-token decode step

Shapes (channels-last, grouped like Mamba-2's multi-value attention
analogy — G groups of B/C shared by H/G heads each):

  x   (batch, L, H, P)      H heads x P head-channels = d_inner
  dt  (batch, L, H)         per-head timestep
  A   (H,) fp32, negative   scalar decay rate per head
  B   (batch, L, G, N)      input projection (G divides H)
  C   (batch, L, G, N)      output projection
  D   (H,) or (H, P)        skip, optional
  z   (batch, L, H, P)      optional silu gate (y * silu(z))
  initial_state / last state: (batch, H, P, N) fp32
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["ssd_scan", "ssd_scan_ref", "ssd_state_update"]


def _prep(x, dt, A, B, C, D, dt_bias, dt_softplus):
    """Common validation + dt activation. Returns fp32 dt values."""
    batch, L, H, P = x.shape
    if dt.shape != (batch, L, H):
        raise ValueError(f"dt shape {dt.shape} != {(batch, L, H)}")
    if A.shape != (H,):
        raise ValueError(f"A shape {A.shape} != ({H},)")
    if B.ndim != 4 or C.ndim != 4:
        raise ValueError("B/C must be (batch, L, G, N)")
    G, N = B.shape[2], B.shape[3]
    if C.shape != B.shape:
        raise ValueError(f"C shape {C.shape} != B shape {B.shape}")
    if H % G != 0:
        raise ValueError(f"heads {H} not divisible by groups {G}")
    if D is not None and D.shape not in ((H,), (H, P)):
        raise ValueError(f"D shape {D.shape} must be ({H},) or ({H},{P})")
    dtv = dt.astype(jnp.float32)
    if dt_bias is not None:
        if dt_bias.shape != (H,):
            raise ValueError(f"dt_bias shape {dt_bias.shape} != ({H},)")
        dtv = dtv + dt_bias.astype(jnp.float32)
    if dt_softplus:
        dtv = jax.nn.softplus(dtv)
    return dtv, G, N


def _skip_gate(y, x, D, z):
    if D is not None:
        d = D.astype(jnp.float32)
        d = d[:, None] if D.ndim == 1 else d          # (H, 1)|(H, P)
        y = y + d * x.astype(jnp.float32)
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y


def ssd_scan_ref(x, dt, A, B, C, D=None, z=None, dt_bias=None,
                 dt_softplus: bool = False, initial_state=None,
                 return_last_state: bool = False):
    """Sequential fp32 golden model: ``lax.scan`` over tokens."""
    batch, L, H, P = x.shape
    dtv, G, N = _prep(x, dt, A, B, C, D, dt_bias, dt_softplus)
    rep = H // G
    xf = x.astype(jnp.float32)
    Bf = B.astype(jnp.float32)
    Cf = C.astype(jnp.float32)
    Af = A.astype(jnp.float32)

    S0 = (jnp.zeros((batch, H, P, N), jnp.float32) if initial_state is None
          else initial_state.astype(jnp.float32))
    # carry variance must match the scanned inputs under shard_map's vma
    # typing (see the identical fix in _ssd_chunked)
    S0 = S0 + 0.0 * xf[:, 0, :, :, None]

    def step(S, inp):
        xt, dtt, Bt, Ct = inp            # (b,H,P) (b,H) (b,G,N) (b,G,N)
        a = jnp.exp(dtt * Af)            # (b, H)
        Bh = jnp.repeat(Bt, rep, axis=1)  # (b, H, N)
        Ch = jnp.repeat(Ct, rep, axis=1)
        dBx = jnp.einsum("bh,bhn,bhp->bhpn", dtt, Bh, xt)
        S = a[:, :, None, None] * S + dBx
        y = jnp.einsum("bhpn,bhn->bhp", S, Ch)
        return S, y

    xs = (jnp.moveaxis(xf, 1, 0), jnp.moveaxis(dtv, 1, 0),
          jnp.moveaxis(Bf, 1, 0), jnp.moveaxis(Cf, 1, 0))
    S, ys = lax.scan(step, S0, xs)
    y = jnp.moveaxis(ys, 0, 1)           # (b, L, H, P)
    y = _skip_gate(y, x, D, z).astype(x.dtype)
    return (y, S) if return_last_state else y


def _ssd_chunked(x, dt, A, B, C, D, z, dt_bias, dt_softplus,
                 initial_state, return_last_state, chunk):
    batch, L, H, P = x.shape
    dtv, G, N = _prep(x, dt, A, B, C, D, dt_bias, dt_softplus)
    Hg = H // G
    Q = int(chunk)
    pad = (-L) % Q
    nc = (L + pad) // Q
    mm = x.dtype if x.dtype in (jnp.bfloat16, jnp.float16) else jnp.float32
    # fp32 inputs must request full-precision MXU passes: XLA:TPU lowers
    # fp32 dots to single-pass bf16 multiplies by DEFAULT, which silently
    # degrades the "fp32" scan to bf16-class accuracy (caught by the
    # f64-truth hardware gate, bench.py _kernel_check_ssd); the hot bf16
    # path is unaffected
    prec = "highest" if mm == jnp.float32 else None

    # zero-pad dt AFTER softplus: dt=0 rows have decay 1 and inject nothing,
    # so padding never perturbs the carried state (mirrors the Pallas
    # kernel's causal-padding argument, scan_pallas.py)
    if pad:
        zpad = lambda a: jnp.pad(a, [(0, 0), (0, pad)] +
                                 [(0, 0)] * (a.ndim - 2))
        x, dtv, B, C = zpad(x), zpad(dtv), zpad(B), zpad(C)

    # (b, nc, Q, G, Hg, ...) views — heads grouped so B/C broadcast free
    xc = x.reshape(batch, nc, Q, G, Hg, P)
    dtc = dtv.reshape(batch, nc, Q, G, Hg)                  # fp32
    Bc = B.reshape(batch, nc, Q, G, N)
    Cc = C.reshape(batch, nc, Q, G, N)
    Ac = A.astype(jnp.float32).reshape(G, Hg)

    # head-major cumulative log decay: (b, nc, G, Hg, Q), <= 0.  dt stays
    # a factor of the (elementwise, XLA-fused) mask/aggregate chains —
    # folding it into the value stream instead was measured SLOWER (it
    # materializes a new (b,L,H,P) matmul operand while the multiply it
    # replaces fuses for free into the scores producer)
    dth = jnp.transpose(dtc, (0, 1, 3, 4, 2))               # (b,nc,G,Hg,Q)
    cum = jnp.cumsum(dth * Ac[..., None], axis=-1)

    # ---- intra-chunk: Y = ((C B^T) ⊙ M) X per (chunk, head) ------------
    cb = jnp.einsum("bcqgn,bcsgn->bcgqs", Cc.astype(mm), Bc.astype(mm),
                    preferred_element_type=jnp.float32,
                    precision=prec)                         # (b,nc,G,Q,Q)
    # M_{t,s} = exp(cum_t − cum_s) · dt_s  for s <= t, else 0  (fp32)
    seg = cum[..., :, None] - cum[..., None, :]             # (b,nc,G,Hg,t,s)
    mask = jnp.tril(jnp.ones((Q, Q), bool))
    decay = jnp.where(mask, jnp.exp(jnp.where(mask, seg, 0.0)), 0.0)
    scores = (cb[:, :, :, None] * decay * dth[..., None, :]).astype(mm)
    y_intra = jnp.einsum("bcghts,bcsghp->bctghp", scores, xc.astype(mm),
                         preferred_element_type=mm, precision=prec)

    # ---- chunk aggregates: S_c = (B · decay_to_end · dt)^T X ------------
    dte = jnp.exp(cum[..., -1:] - cum) * dth                # (b,nc,G,Hg,Q)
    s_chunk = jnp.einsum("bcqgn,bcghq,bcqghp->bcghpn",
                         Bc.astype(mm), dte.astype(mm), xc.astype(mm),
                         preferred_element_type=jnp.float32,
                         precision=prec)

    # ---- inter-chunk fp32 state recurrence over nc chunk aggregates -----
    a_chunk = jnp.exp(cum[..., -1])                         # (b,nc,G,Hg)
    S0 = (jnp.zeros((batch, G, Hg, P, N), jnp.float32) if initial_state is None
          else initial_state.astype(jnp.float32).reshape(
              batch, G, Hg, P, N))
    # under shard_map's vma typing a literal-zeros carry is
    # device-INVARIANT while the scanned aggregates are varying — a
    # trace-time carry-type error (hit by ssd_seq_parallel pass 1).
    # Deriving the carry from the aggregates fixes the variance type;
    # XLA folds the 0-multiply (NaN/Inf inputs would poison y anyway)
    S0 = S0 + 0.0 * s_chunk[:, 0]

    def step(S, inp):
        ac, sc = inp                                        # (b,G,Hg) ...
        S_prev = S
        S = ac[..., None, None] * S + sc
        return S, S_prev

    (S_last, S_prevs) = lax.scan(
        step, S0, (jnp.moveaxis(a_chunk, 1, 0), jnp.moveaxis(s_chunk, 1, 0)))
    S_prev = jnp.moveaxis(S_prevs, 0, 1)                    # (b,nc,G,Hg,P,N)

    # ---- inter-chunk contribution: Y += (C · decay_from_start) S_prev ---
    cdec = (Cc.astype(jnp.float32)[:, :, :, :, None, :] *
            jnp.transpose(jnp.exp(cum), (0, 1, 4, 2, 3))[..., None])
    y_inter = jnp.einsum("bcqghn,bcghpn->bcqghp", cdec.astype(mm),
                         S_prev.astype(mm), preferred_element_type=mm,
                         precision=prec)

    y = (y_intra.astype(jnp.float32) + y_inter.astype(jnp.float32)
         ).reshape(batch, nc * Q, H, P)[:, :L]
    if pad:
        x = x[:, :L]
    y = _skip_gate(y, x, D, z)
    y = y.astype(x.dtype)
    if return_last_state:
        return y, S_last.reshape(batch, H, P, N)
    return y


def ssd_scan(x, dt, A, B, C, D=None, z=None, dt_bias=None,
             dt_softplus: bool = False, initial_state=None,
             return_last_state: bool = False, backend: str = "auto",
             chunk: int = 128):
    """Mamba-2 SSD scan with backend dispatch (shapes: module docstring).

    backend: "auto" | "chunked" | "ref".  "auto" = chunked — the matmul
    form is the fast path on every XLA backend; "ref" is the sequential
    golden model for tests.
    """
    if backend in ("auto", "chunked"):
        return _ssd_chunked(x, dt, A, B, C, D, z, dt_bias, dt_softplus,
                            initial_state, return_last_state, chunk)
    if backend == "ref":
        return ssd_scan_ref(x, dt, A, B, C, D, z, dt_bias, dt_softplus,
                            initial_state, return_last_state)
    raise ValueError(f"unknown backend {backend!r}")


def ssd_state_update(state, x, dt, A, B, C, D=None, z=None, dt_bias=None,
                     dt_softplus: bool = False):
    """Single-token decode step (the Mamba-2 analogue of
    ``selective_state_update``).

    state (batch, H, P, N) fp32; x (batch, H, P); dt (batch, H);
    B/C (batch, G, N).  Returns (y (batch, H, P), new_state).
    """
    batch, H, P = x.shape
    G, N = B.shape[1], B.shape[2]
    rep = H // G
    dtv = dt.astype(jnp.float32)
    if dt_bias is not None:
        dtv = dtv + dt_bias.astype(jnp.float32)
    if dt_softplus:
        dtv = jax.nn.softplus(dtv)
    a = jnp.exp(dtv * A.astype(jnp.float32))                # (b, H)
    Bh = jnp.repeat(B.astype(jnp.float32), rep, axis=1)     # (b, H, N)
    Ch = jnp.repeat(C.astype(jnp.float32), rep, axis=1)
    dBx = jnp.einsum("bh,bhn,bhp->bhpn", dtv, Bh, x.astype(jnp.float32))
    state = a[:, :, None, None] * state.astype(jnp.float32) + dBx
    y = jnp.einsum("bhpn,bhn->bhp", state, Ch)
    y = _skip_gate(y, x, D, z)
    return y.astype(x.dtype), state
