"""Pallas TPU kernel for the Mamba selective scan.

Replaces the reference CUDA kernels (dis_mamba/csrc/selective_scan/
selective_scan_fwd_kernel.cuh, selective_scan_bwd_kernel.cuh) with a
TPU-native design:

- The jnp backends in ``selective_scan.py`` must materialize the
  ``(B, L, D, N)`` expansion in HBM (1.6 GB for the flagship 256^2 config) —
  the bandwidth bottleneck.  This kernel never forms it: the fp32 SSM state
  ``(N, d_block)`` lives in VMEM scratch and is carried across sequence
  chunks by the sequential TPU grid, mirroring the CUDA kernel's
  chunked-prefix scheme (selective_scan.cpp:307-313) with zero HBM
  intermediate traffic.
- Grid = (batch, L/BL, d_inner/BD) with the D-BLOCK axis innermost: Pallas
  TPU grids iterate sequentially, so VMEM scratch persists across grid
  steps and acts as the inter-chunk carry — one ``(n_dblocks, N, BD)``
  slot per d-block, since all d-blocks of a chunk run before the next
  chunk (the CUDA version spills carries to the ``x`` intermediates tensor
  instead).  d-block-innermost keeps the lane-padded BC block (the widest
  physical stream) resident across the d-blocks of a chunk: Pallas elides
  the DMA when consecutive steps map to the same block index.
- Layout: activations (B, L, D) channels-last (lanes = channels); A and the
  per-step B/C projections are passed time-minor/(N, L) so per-step columns
  broadcast along lanes without transposes.
- delta bias + softplus are fused in, matching the CUDA fwd
  (selective_scan_fwd_kernel.cuh:154-156).
- Backward: a dedicated reverse Pallas kernel.  The forward also emits the
  chunk-start states (the analogue of the CUDA ``x`` intermediates tensor,
  selective_scan.cpp:307-313); the backward walks the chunk grid in reverse,
  recomputes the in-chunk states from each carry (the reference's
  recompute-in-backward, selective_scan_bwd_kernel.cuh), runs the adjoint
  reverse scan with the cotangent carry in VMEM, and emits du/ddelta plus
  per-(batch, d-block) partials for dB/dC/dA that XLA reduces outside — no
  atomics, so gradients are deterministic (the CUDA bwd's gpuAtomicAdd for
  dB/dC is not, selective_scan_bwd_kernel.cuh:297-313).

The gating ``y * silu(z)`` and the ``D * u`` skip stay outside the kernel as
plain jnp: they are pointwise on (B, L, D), XLA fuses them, and JAX autodiff
composes their gradients with the core custom VJP automatically.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["selective_scan_pallas", "scan_core_pallas"]


def _scan_kernel(u_ref, dt_ref, bias_ref, A_ref, BC_ref,
                 x0_ref, D_ref, z_ref,                           # inputs
                 y_ref, carry_ref, xlast_ref,                    # outputs
                 state_ref, decay_s, w_s, xs_s,                  # scratch
                 *, softplus: bool, group: int, fuse_gate: bool):
    """One (batch, chunk, d-block) grid step.

    Block shapes:
      u_ref, dt_ref: (1, BL, BD)    — time on sublanes, channels on lanes
      bias_ref:      (1, BD)        — delta bias (fp32)
      A_ref:         (N, BD)        — A transposed so N sits on sublanes
      BC_ref:        (1, BL, N, 2)  — B and C packed on a tiny lane dim so
                     per-(t, n) scalars broadcast along lanes natively (an
                     (BL, N) block would put n on lanes and force a
                     lane->sublane relayout per chunk); packing both into
                     one lane-padded tensor halves that stream's HBM
                     traffic (measured 1.70 -> 1.49 ms on the flagship).
                     The d-block axis is INNERMOST in the grid so the lane-
                     padded BC block (the kernel's widest physical stream)
                     stays resident across all D//BD d-blocks of a chunk
                     instead of being re-fetched per d-block — Pallas
                     elides the copy when consecutive grid steps map to
                     the same block index
      y_ref:         (1, BL, BD)
      state_ref:     (n_dblocks, N, BD) fp32 scratch; slot j persists
                     across the (sequential) chunk grid dimension = the
                     inter-chunk carry for d-block j.  Full-width so the
                     chunk axis can sit OUTSIDE the d-block axis (costs
                     only N*D*4 bytes)
      decay_s, w_s:  (BL, N, BD) full-chunk exp(dt*A) and dt*u*B in the
                     input dtype (bf16 inputs -> bf16 scratch: the loop is
                     VMEM-bandwidth-bound, halving operand bytes ~doubles
                     throughput; the state itself stays fp32)
      xs_s:          (BL, N, BD) per-step states for the bulk C-contraction
      D_ref, z_ref:  (1, BD) / (1, BL, BD) — with ``fuse_gate`` the epilogue
                     computes ``(y + u*D) * silu(z)`` in-kernel, saving the
                     HBM roundtrip of the raw scan output (~100 MB/layer on
                     the flagship); dummies otherwise

    The recurrence loop is grouped: one leading-dim load of ``group`` steps
    amortizes VMEM load latency, then static register extracts drive the
    FMAs.  Swept on v5e for the flagship shape: group=4 is the optimum
    (1.36 ms vs 1.65 at 8, 1.54 at 2, 1.81 at 1).
    """
    k = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    j = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        # initial state: zeros by default; callers (decode prefill,
        # sequence-parallel sharding) pass an incoming state
        state_ref[j] = x0_ref[0]

    # chunk-START state, saved for the backward pass (the CUDA kernel's
    # ``x`` intermediates tensor)
    carry_ref[0, 0] = state_ref[j]

    u = u_ref[0].astype(jnp.float32)          # (BL, BD)
    dt = dt_ref[0].astype(jnp.float32) + bias_ref[0][None, :]
    if softplus:
        # softplus with the same large-x shortcut the CUDA kernel uses
        dt = jnp.where(dt <= 20.0, jnp.log1p(jnp.exp(dt)), dt)
    A = A_ref[...]                             # (N, BD) fp32
    Bv = BC_ref[0, :, :, 0][..., None]         # (BL, N, 1)
    Cv = BC_ref[0, :, :, 1][..., None]         # (BL, N, 1)
    cdtype = decay_s.dtype

    # bulk precompute: one full-width pass instead of per-step slices.
    # The exp here is NOT worth approximating: replacing it with exp2, a
    # Schraudolph-style poly-exp2 (bit-assembled 2^k), or even a 2-op clip
    # measured 1.63 / 5.2-5.6 / 1.82 ms vs 1.64 exact on the bf16 flagship
    # fwd — the kernel sits at its VPU issue floor (~32 vector issues per
    # recurrence step x 128 steps x 384 grid steps ~ 1.6 ms at 0.94 GHz),
    # so the transcendental is hidden and int/bitcast ops are pathological
    # in Mosaic (see docs/DESIGN.md section 9).
    decay_s[...] = jnp.exp(dt[:, None, :] * A[None]).astype(cdtype)
    w_s[...] = ((dt * u)[:, None, :] * Bv.astype(jnp.float32)).astype(cdtype)

    BL = u.shape[0]

    def body(g, x):
        base = pl.multiple_of(g * group, group)
        dg = decay_s[pl.ds(base, group)].astype(jnp.float32)   # (G, N, BD)
        wg = w_s[pl.ds(base, group)].astype(jnp.float32)
        for jj in range(group):  # jj: loop step, NOT the grid d-block j
            x = dg[jj] * x + wg[jj]                            # (N, BD)
            xs_s[base + jj] = x.astype(cdtype)
        return x

    state = jax.lax.fori_loop(0, BL // group, body, state_ref[j])
    state_ref[j] = state

    @pl.when(k == n_chunks - 1)
    def _():
        xlast_ref[0] = state  # final SSM state (decode prefill / seq-parallel)

    # bulk output contraction: y(t, d) = sum_n C(t, n) * x(t, n, d)
    y = jnp.sum(xs_s[...].astype(jnp.float32) * Cv.astype(jnp.float32),
                axis=1)                                        # (BL, BD)
    if fuse_gate:
        y = y + u * D_ref[0][None, :]
        z = z_ref[0].astype(jnp.float32)
        y = y * (z * jax.nn.sigmoid(z))
    y_ref[0] = y.astype(y_ref.dtype)


# The kernel's ``vmem_limit_bytes`` is RESERVED, not advisory: XLA
# allocates the declared limit as the custom call's frame on the module's
# scoped-vmem stack (112 MiB budget on v5e).  Three hardware observations
# pin the semantics:
#   * leaving it unset makes the frame default to the FULL 112 MiB module
#     budget — the bwd grad graph then dies in AOT ("scoped allocation
#     112.06M, limit 112.00M") because 58 KiB of neighbouring S(1) buffers
#     no longer fit;
#   * a blanket 64 MiB limit compiles everywhere but costs ~17% END-TO-END
#     sampling throughput (3.46 vs 4.15 img/s) by starving the surrounding
#     module's fusions/prefetch, even though the ISOLATED kernel got
#     faster (1.572 vs 1.741 ms);
#   * Mosaic's own accounting rejects limits below its computed usage
#     (the fp32 flagship fwd computes 16.76 MiB vs a 14.9 MiB additive
#     model — ~12% above the naive sum).
# So each call declares the smallest safe limit: 1.5x the additive
# scratch+stream model (covers Mosaic's accounting slack), floored at
# 24 MiB — a 16 MiB floor re-triggered the same 58 KiB AOT overflow (XLA
# packs S(1) neighbours up to the declared headroom and mis-accounts at
# the cliff), while 24 MiB compiles everywhere AND measures at full
# throughput (4.153 img/s, bit-identical to the no-params round-1 bench).
# The reference CUDA kernel makes the same capacity tradeoff by shrinking
# kNItems as dstate grows (selective_scan.cpp:262 caps dstate at 256).
_VMEM_SCRATCH_BUDGET = 48 * 1024 * 1024
_VMEM_LIMIT_FLOOR = 24 * 1024 * 1024


def _vmem_limit(scratch_bytes_total, block_bytes_total):
    """Smallest safe ``vmem_limit_bytes`` for a kernel whose VMEM scratch
    totals ``scratch_bytes_total`` and whose (single-buffered) block
    streams total ``block_bytes_total`` (see module comment above)."""
    need = (3 * (scratch_bytes_total + 2 * block_bytes_total)) // 2
    return max(need, _VMEM_LIMIT_FLOOR)

# grid = (batch, chunk, d-block) — d-block INNERMOST so the lane-padded BC
# block stays resident across a chunk's d-blocks (see module docstring).
# All three axes stay "arbitrary" (sequential): the VMEM scratch carries
# per-d-block state slots along the chunk axis, re-seeded at k==0.
# Marking batch/d-block "parallel" was tried (on the older
# chunk-innermost grid) and produced CORRUPT gradients on hardware
# (round-2 kernel check: du/ddelta/dA/dB off by 1e3 while the carry-free
# dC stayed exact) — Mosaic may reorder parallel dims around the scratch
# carry.
#
# Rejected (round 2, measured): replacing the materialized w_s = dt*u*B
# buffer with a (BL, 1, BD) dt*u scratch + an in-loop outer product
# bg[j] * dug[j].  It cuts ~1/3 of the loop's VMEM traffic on paper but
# measured 2.50-2.74 ms vs 1.48-1.68 ms on the flagship bf16 shape
# (experiments/kernel_microbench.py): the recurrence loop is LATENCY-bound
# on its serial dependency chain, so adding a broadcast-multiply per step
# costs far more than the bandwidth it saves.  (Also note: a 2D (BL, BD)
# scratch cannot be dynamically sliced on dim 0 at group=4 strides —
# Mosaic requires sublane-aligned dynamic indices on tiled dims; any such
# buffer must be (BL, 1, BD).)
_DIM_SEMANTICS = ("arbitrary", "arbitrary", "arbitrary")


# the bwd kernel's default d-block size; also the CANONICAL cap used to
# resolve BL (see _blocks) so fwd and bwd always agree on n_chunks
_CANONICAL_BLOCK_D = 256


def _bd_chain(D: int, cap: int) -> list:
    """Mosaic-valid d-block sizes for a (.., BD)-last block over a D-wide
    axis, descending, capped at ``cap``.

    Mosaic requires the last block dim to be a multiple of 128 lanes OR
    equal to the full array dim, and the grid needs BD to divide D — so the
    candidates are {divisors of D that are 128-multiples} plus D itself.
    If nothing fits under the cap (e.g. D=416 has no 128-multiple divisor),
    the smallest valid size is used regardless of the cap.
    """
    valid = sorted({d for d in range(128, D, 128) if D % d == 0} | {D},
                   reverse=True)
    chain = [d for d in valid if d <= cap]
    return chain or [valid[-1]]


def _blocks(L, D, N, itemsize, block_l, block_d, group):
    """Pick (BL, BD) so the kernel's VMEM scratch fits the budget.

    The scratch model is the BACKWARD kernel's (3 chunk-dtype (BL, N, BD)
    buffers + 1 fp32, plus the full-width per-d-block carry/partial slots)
    — the tighter of the two — for BOTH kernels.  BL is resolved against
    the CANONICAL d-block cap (_CANONICAL_BLOCK_D, the bwd default) no
    matter which ``block_d`` the caller tuned, so fwd and bwd ALWAYS agree
    on BL: the bwd consumes the fwd's (B, n_chunks, N, D) carries and
    n_chunks = L/BL is a shared contract (a fwd/bwd BL mismatch silently
    misindexes every chunk-start carry).  When the flagship-tuned blocks
    overflow (large N), BD shrinks first (through the Mosaic-valid sizes
    from _bd_chain), then BL (floor: one 8-sublane tile) — extending the
    envelope to the reference's full d_state <= 256 range instead of
    letting Mosaic fail on an oversized or lane-misaligned allocation.
    """
    BL = min(block_l, L)
    if L % BL or BL % group:
        raise ValueError(
            f"pallas scan needs its sequence block ({BL}) to divide L ({L}); "
            f"pad L to a multiple of {BL}, pass a block_l that divides L "
            f"(and is a multiple of the loop group {group}), or use "
            f"backend='chunked'")

    def scratch_bytes(bl, bd):
        # 3 chunk-dtype + 1 fp32 (BL, N, BD) buffers, plus the d-block-
        # innermost carry scratch: gcarry + dA partials (2 * nD * N * BD * 4
        # = 8*N*D, BD-independent) and the dD partial row (4*D), plus the
        # double-buffered lane-PADDED BC stream: the packed (BL, N, 2)
        # block physically occupies (BL, N, 128) lanes under TPU tiling —
        # negligible at the flagship N=16 but the dominant stream at
        # N >= 128 (unmodeled, it VMEM-OOMs the bwd at e.g. D=384 N=192)
        return (bl * N * bd * (3 * itemsize + 4)
                + 8 * N * D + 4 * D
                + 2 * bl * N * 128 * itemsize)

    # canonical resolution: walk the canonical BD chain, then shrink BL
    cchain = _bd_chain(D, _CANONICAL_BLOCK_D)
    BDc = next((d for d in cchain
                if scratch_bytes(BL, d) <= _VMEM_SCRATCH_BUDGET), cchain[-1])
    while (scratch_bytes(BL, BDc) > _VMEM_SCRATCH_BUDGET
           and BL > max(8, group)
           and BL % 2 == 0 and (BL // 2) % group == 0):
        BL //= 2  # stays a multiple of 8 sublanes (Mosaic) and of group
    if scratch_bytes(BL, BDc) > _VMEM_SCRATCH_BUDGET:
        raise ValueError(
            f"pallas scan state (N={N}, d_block={BDc}) does not fit the "
            f"VMEM scratch budget at any block size; use backend='chunked'")
    # this kernel's BD: the largest Mosaic-valid size under its own cap
    # whose scratch fits at the agreed BL (the canonical size always fits,
    # and both chains share their smallest element, so the fallback is safe)
    BD = next((d for d in _bd_chain(D, block_d)
               if scratch_bytes(BL, d) <= _VMEM_SCRATCH_BUDGET), BDc)
    return BL, BD, L // BL


def pallas_shape_supported(L: int, D: int, N: int, dtype=None) -> bool:
    """Whether the Pallas kernel (fwd AND bwd) has a valid blocking for this
    shape.  ``selective_scan``'s auto-dispatch queries this so no publicly
    reachable shape can hit a Mosaic allocation failure — it degrades to the
    chunked jnp backend instead."""
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    align = 8 if L <= 128 else 128
    Lp = -(-L // align) * align  # the kernel pads unaligned L itself
    try:
        _blocks(Lp, D, N, itemsize, 128, 256, 4)
        return True
    except ValueError:
        return False


@functools.partial(jax.jit, static_argnames=("softplus", "block_l", "block_d",
                                             "group", "interpret"))
def scan_core_fwd_pallas(u, delta, delta_bias, A, Bv, Cv, x0=None,
                         Dskip=None, z=None, *,
                         softplus: bool = True, block_l: int = 128,
                         block_d: int = 512, group: int = 4,
                         interpret: bool = False):
    """Forward kernel: (y, chunk_carries, x_last).

    u, delta: (B, L, D); delta_bias: (D,) fp32; A: (D, N) fp32;
    Bv, Cv: (B, L, N); x0: optional (B, N, D) fp32 initial state.
    Dskip (D,) + z (B, L, D) together enable the fused gate epilogue
    ``(y + u*D) * silu(z)``.
    carries: (B, n_chunks, N, D) fp32 chunk-START states;
    x_last: (B, N, D) fp32 final state.
    """
    batch, L, D = u.shape
    N = A.shape[1]
    cdtype_size = 2 if u.dtype == jnp.bfloat16 else 4
    BL, BD, n_chunks = _blocks(L, D, N, cdtype_size, block_l, block_d, group)

    At = jnp.asarray(A, jnp.float32).T  # (N, D)
    # B/C packed on a 2-wide lane dim: native lane broadcast per (t, n) and
    # one lane-padded stream instead of two
    BC = jnp.stack([Bv, Cv], axis=-1)  # (B, L, N, 2)
    cdtype = u.dtype if u.dtype == jnp.bfloat16 else jnp.float32
    if x0 is None:
        x0 = jnp.zeros((batch, N, D), jnp.float32)
    fuse_gate = Dskip is not None and z is not None
    if not fuse_gate:
        Dskip = jnp.zeros((D,), jnp.float32)
        z = jnp.zeros((batch, 8, D), u.dtype)  # dummy, minimal stream
    BLz = BL if fuse_gate else 8

    # d-block axis INNERMOST: consecutive grid steps then share the same
    # BC block (index map ignores j), so Pallas fetches the lane-padded BC
    # stream once per (batch, chunk) instead of once per d-block — on the
    # flagship (3 d-blocks) that cuts the kernel's widest physical stream
    # by 3x (~128 MiB/layer of HBM traffic)
    n_dblocks = D // BD
    grid = (batch, n_chunks, n_dblocks)

    bc_sz = BC.dtype.itemsize
    scratch_total = n_dblocks * N * BD * 4 + 3 * BL * N * BD * cdtype_size
    block_total = (3 * BL * BD * cdtype_size        # u, delta, y
                   + BLz * BD * cdtype_size         # z
                   + BL * N * 128 * bc_sz           # BC (lane-padded to 128)
                   + 3 * N * BD * 4                 # At, x0, carry+xlast
                   + N * BD * 4 + 3 * BD * 4)
    vmem_limit = _vmem_limit(scratch_total, block_total)

    return pl.pallas_call(
        functools.partial(_scan_kernel, softplus=softplus, group=group,
                          fuse_gate=fuse_gate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BL, BD), lambda b, k, j: (b, k, j)),
            pl.BlockSpec((1, BL, BD), lambda b, k, j: (b, k, j)),
            pl.BlockSpec((1, BD), lambda b, k, j: (0, j)),
            pl.BlockSpec((N, BD), lambda b, k, j: (0, j)),
            pl.BlockSpec((1, BL, N, 2), lambda b, k, j: (b, k, 0, 0)),
            pl.BlockSpec((1, N, BD), lambda b, k, j: (b, 0, j)),
            pl.BlockSpec((1, BD), lambda b, k, j: (0, j)),
            pl.BlockSpec((1, BLz, BD),
                         (lambda b, k, j: (b, k, j)) if fuse_gate
                         else (lambda b, k, j: (b, 0, j))),
        ],
        out_specs=(
            pl.BlockSpec((1, BL, BD), lambda b, k, j: (b, k, j)),
            pl.BlockSpec((1, 1, N, BD), lambda b, k, j: (b, k, 0, j)),
            pl.BlockSpec((1, N, BD), lambda b, k, j: (b, 0, j)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, L, D), u.dtype),
            jax.ShapeDtypeStruct((batch, n_chunks, N, D), jnp.float32),
            jax.ShapeDtypeStruct((batch, N, D), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_dblocks, N, BD), jnp.float32),
            pltpu.VMEM((BL, N, BD), cdtype),
            pltpu.VMEM((BL, N, BD), cdtype),
            pltpu.VMEM((BL, N, BD), cdtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=_DIM_SEMANTICS,
            vmem_limit_bytes=vmem_limit),
        cost_estimate=pl.CostEstimate(
            flops=9 * batch * L * D * N,
            bytes_accessed=(2 * batch * L * D * u.dtype.itemsize * 2
                            + 2 * batch * L * N * 4),
            transcendentals=batch * L * D * N,
        ),
    )(u, delta, delta_bias[None].astype(jnp.float32), At, BC, x0,
      jnp.asarray(Dskip, jnp.float32)[None], z)


def scan_core_pallas(u, delta, delta_bias, A, Bv, Cv, **kw):
    """Raw kernel call returning only y (see scan_core_fwd_pallas)."""
    return scan_core_fwd_pallas(u, delta, delta_bias, A, Bv, Cv, **kw)[0]


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _scan_bwd_kernel(u_ref, dt_ref, bias_ref, A_ref, BC_ref,
                     carry_ref, gy_ref, glast_ref, D_ref, z_ref,  # inputs
                     du_ref, dd_ref, dBp_ref, dCp_ref, dAp_ref,
                     dx0_ref, dz_ref, dDp_ref,                   # outputs
                     gcarry_s, dA_s, dD_s, decay_s, w_s, xs_s, gs_s,  # scratch
                     *, softplus: bool, fuse_gate: bool):
    """Reverse grid step: chunk kk = n_chunks-1-k (via index maps).

    Recomputes in-chunk states from the saved chunk-start carry, runs the
    adjoint reverse recurrence g_t = dy_t*C_t + decay_{t+1} g_{t+1} with the
    inter-chunk cotangent in ``gcarry_s`` (slot j = this d-block), then
    emits all gradient pieces in bulk passes.  dB/dC come out as per-d-block
    partials and dA as per-batch partials (summed outside) — the
    deterministic replacement for the CUDA kernel's atomics.

    Like the forward, the d-block axis is innermost so the lane-padded BC
    block stays resident across all D//BD d-blocks of a chunk.  The
    chunk-crossing accumulators (gcarry, dA, dD partials) therefore live in
    per-d-block scratch slots and the dA/dD/dx0 OUTPUT blocks are written
    once, on the final chunk — output blocks cannot accumulate across
    non-consecutive grid revisits.
    """
    k = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    j = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        # cotangent of the FINAL state seeds the adjoint (zero unless the
        # caller consumed x_last, e.g. sequence-parallel / prefill)
        gcarry_s[j] = glast_ref[0]
        dA_s[j] = jnp.zeros_like(dA_s[j])
        if fuse_gate:
            dD_s[j] = jnp.zeros_like(dD_s[j])

    u = u_ref[0].astype(jnp.float32)                       # (BL, BD)
    dt_pre = dt_ref[0].astype(jnp.float32) + bias_ref[0][None, :]
    if softplus:
        sig = jax.nn.sigmoid(dt_pre)
        dt = jnp.where(dt_pre <= 20.0, jnp.log1p(jnp.exp(dt_pre)), dt_pre)
    else:
        sig = jnp.ones_like(dt_pre)
        dt = dt_pre
    A = A_ref[...]                                          # (N, BD)
    Bv = BC_ref[0, :, :, 0][..., None]                      # (BL, N, 1)
    Cv = BC_ref[0, :, :, 1][..., None]
    gy = gy_ref[0].astype(jnp.float32)                      # (BL, BD)
    if fuse_gate:
        z = z_ref[0].astype(jnp.float32)
        sig_z = jax.nn.sigmoid(z)
        silu_z = z * sig_z
        g_out = gy
        gy = g_out * silu_z  # cotangent of the raw scan output
    cdtype = decay_s.dtype
    dtu = dt * u

    decay_s[...] = jnp.exp(dt[:, None, :] * A[None]).astype(cdtype)
    w_s[...] = (dtu[:, None, :] * Bv.astype(jnp.float32)).astype(cdtype)

    BL = u.shape[0]
    G = 4  # grouped leading-dim loads amortize VMEM latency (as in the fwd)

    # forward recompute within the chunk from the saved carry
    def fwd_group(g_i, x):
        base = pl.multiple_of(g_i * G, G)
        dg = decay_s[pl.ds(base, G)].astype(jnp.float32)
        wg = w_s[pl.ds(base, G)].astype(jnp.float32)
        for jj in range(G):
            x = dg[jj] * x + wg[jj]
            xs_s[base + jj] = x.astype(cdtype)
        return x

    jax.lax.fori_loop(0, BL // G, fwd_group, carry_ref[0, 0])

    # adjoint reverse recurrence; dx_local staged in gs_s first
    gs_s[...] = (gy[:, None, :] * Cv.astype(jnp.float32))

    def bwd_group(g_i, c):
        base = pl.multiple_of(BL - (g_i + 1) * G, G)
        dxg = gs_s[pl.ds(base, G)]
        dg = decay_s[pl.ds(base, G)].astype(jnp.float32)
        for jj in range(G - 1, -1, -1):
            g = dxg[jj] + c
            gs_s[base + jj] = g
            c = dg[jj] * g
        return c

    gcarry_s[j] = jax.lax.fori_loop(0, BL // G, bwd_group, gcarry_s[j])

    # bulk gradient assembly
    gs = gs_s[...]                                          # (BL, N, BD) f32
    xs = xs_s[...].astype(jnp.float32)
    w = w_s[...].astype(jnp.float32)
    dla = gs * (xs - w)                                     # d log-decay
    gB = jnp.sum(gs * Bv.astype(jnp.float32), axis=1)       # (BL, BD)
    dd = jnp.sum(dla * A[None], axis=1) + gB * u
    dd_ref[0] = (dd * sig).astype(dd_ref.dtype)             # softplus bwd
    du = dt * gB
    if fuse_gate:
        Dp = D_ref[0][None, :]                              # (1, BD)
        du = du + gy * Dp                                   # through u*D
        # dz/dD need the raw scan output: recompute y = sum_n C * x (bulk)
        y = jnp.sum(Cv.astype(jnp.float32) * xs, axis=1)    # (BL, BD)
        out_pre = y + u * Dp
        dz_ref[0] = (g_out * out_pre
                     * (sig_z * (1.0 + z * (1.0 - sig_z)))).astype(dz_ref.dtype)
        dD_s[j] = dD_s[j] + jnp.sum(gy * u, axis=0, keepdims=True)
    du_ref[0] = du.astype(du_ref.dtype)
    dBp_ref[0, 0] = jnp.sum(gs * dtu[:, None, :], axis=2).astype(dBp_ref.dtype)
    dCp_ref[0, 0] = jnp.sum(gy[:, None, :] * xs, axis=2).astype(dCp_ref.dtype)
    dA_s[j] = dA_s[j] + jnp.sum(dla * dt[:, None, :], axis=0)

    @pl.when(k == n_chunks - 1)
    def _():
        # final grid step for this (b, j) — chunk 0 of the reversed order:
        # flush the chunk-crossing accumulators.  gcarry now holds the
        # cotangent w.r.t. the initial state.
        dAp_ref[0] = dA_s[j]
        dx0_ref[0] = gcarry_s[j]
        if fuse_gate:
            dDp_ref[0] = dD_s[j]


@functools.partial(jax.jit, static_argnames=("softplus", "block_l", "block_d",
                                             "interpret"))
def scan_core_bwd_pallas(u, delta, delta_bias, A, Bv, Cv, carries, gy,
                         g_last=None, Dskip=None, z=None, *,
                         softplus: bool = True, block_l: int = 128,
                         block_d: int = 256, interpret: bool = False):
    """Backward kernel: cotangents
    (du, ddelta, dA, dB, dC, dbias, dx0[, dz, dD]).

    g_last: optional (B, N, D) cotangent w.r.t. the final state.
    Dskip + z: fused-gate mode — gy is then the cotangent of the GATED
    output and dz/dD are also returned."""
    batch, L, D = u.shape
    N = A.shape[1]
    cdtype_size = 2 if u.dtype == jnp.bfloat16 else 4
    BL, BD, n_chunks = _blocks(L, D, N, cdtype_size, block_l, block_d,
                               group=4)
    nD = D // BD

    At = jnp.asarray(A, jnp.float32).T
    BC = jnp.stack([Bv, Cv], axis=-1)  # (B, L, N, 2)
    cdtype = u.dtype if u.dtype == jnp.bfloat16 else jnp.float32
    if g_last is None:
        g_last = jnp.zeros((batch, N, D), jnp.float32)
    fuse_gate = Dskip is not None and z is not None
    if not fuse_gate:
        Dskip = jnp.zeros((D,), jnp.float32)
        z = jnp.zeros((batch, 8, D), u.dtype)
    BLz = BL if fuse_gate else 8
    z_map = ((lambda b, k, j: (b, nc - 1 - k, j)) if fuse_gate
             else (lambda b, k, j: (b, 0, j)))

    # d-block axis innermost (as in the forward): the lane-padded BC block
    # stays resident across the nD d-blocks of a chunk instead of being
    # re-fetched nD times (nD=6 at the flagship bwd blocking)
    grid = (batch, n_chunks, nD)
    nc = n_chunks  # reverse chunk order via index maps

    bc_sz = BC.dtype.itemsize
    scratch_total = (nD * N * BD * 4 * 2 + nD * BD * 4
                     + BL * N * BD * (3 * cdtype_size + 4))
    block_total = (5 * BL * BD * cdtype_size        # u, delta, gy, du, dd
                   + 2 * BLz * BD * cdtype_size     # z, dz
                   + BL * N * 128 * bc_sz           # BC (lane-padded to 128)
                   + 2 * BL * N * 4                 # dBp, dCp
                   + 5 * N * BD * 4                 # At, carries, g_last, dAp, dx0
                   + 4 * BD * 4)                    # bias, Dskip, dDp (+slack)
    vmem_limit = _vmem_limit(scratch_total, block_total)

    du, dd, dBp, dCp, dAp, dx0, dz, dDp = pl.pallas_call(
        functools.partial(_scan_bwd_kernel, softplus=softplus,
                          fuse_gate=fuse_gate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BL, BD), lambda b, k, j: (b, nc - 1 - k, j)),
            pl.BlockSpec((1, BL, BD), lambda b, k, j: (b, nc - 1 - k, j)),
            pl.BlockSpec((1, BD), lambda b, k, j: (0, j)),
            pl.BlockSpec((N, BD), lambda b, k, j: (0, j)),
            pl.BlockSpec((1, BL, N, 2), lambda b, k, j: (b, nc - 1 - k, 0, 0)),
            pl.BlockSpec((1, 1, N, BD), lambda b, k, j: (b, nc - 1 - k, 0, j)),
            pl.BlockSpec((1, BL, BD), lambda b, k, j: (b, nc - 1 - k, j)),
            pl.BlockSpec((1, N, BD), lambda b, k, j: (b, 0, j)),
            pl.BlockSpec((1, BD), lambda b, k, j: (0, j)),
            pl.BlockSpec((1, BLz, BD), z_map),
        ],
        out_specs=(
            pl.BlockSpec((1, BL, BD), lambda b, k, j: (b, nc - 1 - k, j)),
            pl.BlockSpec((1, BL, BD), lambda b, k, j: (b, nc - 1 - k, j)),
            pl.BlockSpec((1, 1, BL, N), lambda b, k, j: (b, j, nc - 1 - k, 0)),
            pl.BlockSpec((1, 1, BL, N), lambda b, k, j: (b, j, nc - 1 - k, 0)),
            pl.BlockSpec((1, N, BD), lambda b, k, j: (b, 0, j)),
            pl.BlockSpec((1, N, BD), lambda b, k, j: (b, 0, j)),
            pl.BlockSpec((1, BLz, BD), z_map),
            pl.BlockSpec((1, 1, BD), lambda b, k, j: (b, 0, j)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, L, D), u.dtype),
            jax.ShapeDtypeStruct((batch, L, D), delta.dtype),
            jax.ShapeDtypeStruct((batch, nD, L, N), jnp.float32),
            jax.ShapeDtypeStruct((batch, nD, L, N), jnp.float32),
            jax.ShapeDtypeStruct((batch, N, D), jnp.float32),
            jax.ShapeDtypeStruct((batch, N, D), jnp.float32),
            jax.ShapeDtypeStruct((batch, L if fuse_gate else 8, D),
                                 u.dtype),
            jax.ShapeDtypeStruct((batch, 1, D), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nD, N, BD), jnp.float32),   # gcarry per d-block
            pltpu.VMEM((nD, N, BD), jnp.float32),   # dA partial per d-block
            pltpu.VMEM((nD, 1, BD), jnp.float32),   # dD partial per d-block
            pltpu.VMEM((BL, N, BD), cdtype),
            pltpu.VMEM((BL, N, BD), cdtype),
            pltpu.VMEM((BL, N, BD), cdtype),
            pltpu.VMEM((BL, N, BD), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=_DIM_SEMANTICS,
            vmem_limit_bytes=vmem_limit),
        cost_estimate=pl.CostEstimate(
            flops=25 * batch * L * D * N,
            bytes_accessed=6 * batch * L * D * u.dtype.itemsize,
            transcendentals=batch * L * D * N,
        ),
    )(u, delta, delta_bias[None].astype(jnp.float32), At, BC, carries,
      gy, g_last, jnp.asarray(Dskip, jnp.float32)[None], z)

    dB = jnp.sum(dBp, axis=1).astype(Bv.dtype)          # (B, L, N)
    dC = jnp.sum(dCp, axis=1).astype(Cv.dtype)
    dA = jnp.sum(dAp, axis=0).T                          # (D, N) fp32
    dbias = jnp.sum(dd.astype(jnp.float32), axis=(0, 1))
    if fuse_gate:
        dD = jnp.sum(dDp, axis=(0, 1))                   # (D,) fp32
        return du, dd, dA, dB, dC, dbias, dx0, dz, dD
    return du, dd, dA, dB, dC, dbias, dx0


# ---------------------------------------------------------------------------
# custom VJP over the CORE scan (D-skip / z-gating composed outside in jnp,
# so JAX autodiff handles their gradients)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _core(cfg, u, delta, A, Bv, Cv, delta_bias):
    softplus, interpret = cfg
    y, _, _ = scan_core_fwd_pallas(u, delta, delta_bias, A, Bv, Cv,
                                softplus=softplus, interpret=interpret)
    return y


def _core_fwd(cfg, u, delta, A, Bv, Cv, delta_bias):
    softplus, interpret = cfg
    y, carries, _ = scan_core_fwd_pallas(u, delta, delta_bias, A, Bv, Cv,
                                      softplus=softplus, interpret=interpret)
    return y, (u, delta, A, Bv, Cv, delta_bias, carries)


def _core_bwd(cfg, res, gy):
    softplus, interpret = cfg
    u, delta, A, Bv, Cv, delta_bias, carries = res
    du, dd, dA, dB, dC, dbias, _ = scan_core_bwd_pallas(
        u, delta, delta_bias, A, Bv, Cv, carries, gy,
        softplus=softplus, interpret=interpret)
    return du, dd, dA, dB, dC, dbias


_core.defvjp(_core_fwd, _core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _core_x0(cfg, u, delta, A, Bv, Cv, delta_bias, x0):
    """Seeded core scan: like _core but starting from state x0 (B, N, D).
    Used by the sequence-parallel wrapper and decode prefill chunking."""
    softplus, interpret = cfg
    y, _, _ = scan_core_fwd_pallas(u, delta, delta_bias, A, Bv, Cv, x0,
                                   softplus=softplus, interpret=interpret)
    return y


def _core_x0_fwd(cfg, u, delta, A, Bv, Cv, delta_bias, x0):
    softplus, interpret = cfg
    y, carries, _ = scan_core_fwd_pallas(u, delta, delta_bias, A, Bv, Cv, x0,
                                         softplus=softplus,
                                         interpret=interpret)
    # carries[:, 0] == x0, so the backward recompute is seeded correctly
    return y, (u, delta, A, Bv, Cv, delta_bias, carries)


def _core_x0_bwd(cfg, res, gy):
    softplus, interpret = cfg
    u, delta, A, Bv, Cv, delta_bias, carries = res
    du, dd, dA, dB, dC, dbias, dx0 = scan_core_bwd_pallas(
        u, delta, delta_bias, A, Bv, Cv, carries, gy,
        softplus=softplus, interpret=interpret)
    return du, dd, dA, dB, dC, dbias, dx0


_core_x0.defvjp(_core_x0_fwd, _core_x0_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _core_full(cfg, u, delta, A, Bv, Cv, delta_bias, x0):
    """Seeded core scan returning (y, x_last) — both differentiable.  The
    VJP seeds the adjoint reverse recurrence with the x_last cotangent.
    Building block for sequence-parallel scans and chunked decode prefill."""
    softplus, interpret = cfg
    y, _, x_last = scan_core_fwd_pallas(u, delta, delta_bias, A, Bv, Cv, x0,
                                        softplus=softplus,
                                        interpret=interpret)
    return y, x_last


def _core_full_fwd(cfg, u, delta, A, Bv, Cv, delta_bias, x0):
    softplus, interpret = cfg
    y, carries, x_last = scan_core_fwd_pallas(
        u, delta, delta_bias, A, Bv, Cv, x0,
        softplus=softplus, interpret=interpret)
    return (y, x_last), (u, delta, A, Bv, Cv, delta_bias, carries)


def _core_full_bwd(cfg, res, g):
    softplus, interpret = cfg
    gy, g_last = g
    u, delta, A, Bv, Cv, delta_bias, carries = res
    du, dd, dA, dB, dC, dbias, dx0 = scan_core_bwd_pallas(
        u, delta, delta_bias, A, Bv, Cv, carries, gy, g_last,
        softplus=softplus, interpret=interpret)
    return du, dd, dA, dB, dC, dbias, dx0


_core_full.defvjp(_core_full_fwd, _core_full_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(cfg, u, delta, A, Bv, Cv, delta_bias, Dskip, z):
    """Fully fused hot path: out = (scan(u, ...) + u*D) * silu(z) with the
    gate epilogue inside the kernel (saves the raw-y HBM roundtrip)."""
    softplus, interpret = cfg
    out, _, _ = scan_core_fwd_pallas(u, delta, delta_bias, A, Bv, Cv,
                                     None, Dskip, z,
                                     softplus=softplus, interpret=interpret)
    return out


def _fused_fwd(cfg, u, delta, A, Bv, Cv, delta_bias, Dskip, z):
    softplus, interpret = cfg
    out, carries, _ = scan_core_fwd_pallas(u, delta, delta_bias, A, Bv, Cv,
                                           None, Dskip, z,
                                           softplus=softplus,
                                           interpret=interpret)
    return out, (u, delta, A, Bv, Cv, delta_bias, Dskip, z, carries)


def _fused_bwd(cfg, res, g):
    softplus, interpret = cfg
    u, delta, A, Bv, Cv, delta_bias, Dskip, z, carries = res
    du, dd, dA, dB, dC, dbias, _, dz, dD = scan_core_bwd_pallas(
        u, delta, delta_bias, A, Bv, Cv, carries, g, None, Dskip, z,
        softplus=softplus, interpret=interpret)
    return du, dd, dA, dB, dC, dbias, dD, dz


_fused.defvjp(_fused_fwd, _fused_bwd)


def pallas_seq_aligned(L: int) -> bool:
    """Whether the kernel handles length L without auto-padding — the one
    place the alignment rule lives (selective_scan's auto-dispatch queries
    this to keep return_last_state off the padding path)."""
    align = 8 if L <= 128 else 128
    return L % align == 0


def selective_scan_pallas(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                          delta_softplus: bool = False,
                          return_last_state: bool = False,
                          interpret: Optional[bool] = None,
                          fuse_gate: bool = False):
    """Drop-in pallas backend for ``selective_scan`` (variable B/C only —
    the ZigMa hot path).  See selective_scan.py for argument semantics."""
    if B.ndim != 3 or C.ndim != 3:
        raise ValueError("pallas backend requires variable B/C (B, L, N)")
    if interpret is None:
        # Mosaic TPU programs; interpret on every other backend
        interpret = jax.default_backend() != "tpu"
    d_inner = u.shape[-1]
    bias = (delta_bias if delta_bias is not None
            else jnp.zeros((d_inner,), jnp.float32))
    cfg = (bool(delta_softplus), bool(interpret))

    # pad unaligned L: the scan is causal, so zero-padded trailing steps
    # never influence y[:L].  (They DO evolve the state, so last-state
    # requests need aligned L.)
    L = u.shape[1]
    align = 8 if L <= 128 else 128
    Lp = -(-L // align) * align
    if not pallas_seq_aligned(L):
        if return_last_state:
            raise NotImplementedError(
                f"return_last_state needs L divisible by {align} (got {L}); "
                f"use backend='chunked'")
        pad = [(0, 0), (0, Lp - L), (0, 0)]
        u_p, d_p, B_p, C_p = (jnp.pad(a, pad) for a in (u, delta, B, C))
        y = _core(cfg, u_p, d_p, A, B_p, C_p, bias)[:, :L].astype(jnp.float32)
        if D is not None:
            y = y + u.astype(jnp.float32) * D
        if z is not None:
            y = y * jax.nn.silu(z.astype(jnp.float32))
        return y.astype(u.dtype)
    if fuse_gate and D is not None and z is not None and not return_last_state:
        # gate epilogue inside the kernel.  Saves the raw-y HBM roundtrip
        # but measured SLOWER on v5e for the flagship shape (3.36 vs 3.93
        # img/s end to end): the extra z/D streams stall the kernel's DMA
        # pipeline more than the roundtrip costs.  Kept for shapes where
        # the tradeoff flips (longer L, narrower D); off by default.
        return _fused(cfg, u, delta, A, B, C, bias, D, z)
    if return_last_state:
        batch, _, _ = u.shape
        x0 = jnp.zeros((batch, A.shape[1], d_inner), jnp.float32)
        y, x_last = _core_full(cfg, u, delta, A, B, C, bias, x0)
        y = y.astype(jnp.float32)
    else:
        y = _core(cfg, u, delta, A, B, C, bias).astype(jnp.float32)
    if D is not None:
        y = y + u.astype(jnp.float32) * D
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    out = y.astype(u.dtype)
    if return_last_state:
        # (B, N, D) -> the reference's (B, D, N) state layout
        return out, jnp.swapaxes(x_last, 1, 2)
    return out
