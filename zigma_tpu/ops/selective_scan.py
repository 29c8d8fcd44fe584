"""Mamba selective-scan SSM for TPU.

Computes the diagonal state-space recurrence

    x_t = exp(dt_t * A) * x_{t-1} + dt_t * B_t * u_t          (state, (D, N))
    y_t = <C_t, x_t> (+ D * u_t)  (* silu(z_t))               (output, (D,))

This is the TPU-native equivalent of the reference CUDA kernel
(``dis_mamba/csrc/selective_scan/``) and its PyTorch golden model
``selective_scan_ref`` (dis_mamba/mamba_ssm/ops/selective_scan_interface.py:86-152).

Design notes (TPU-first, not a translation):

- Layout is ``(batch, seq, channels)`` — channels on the 128-wide lane
  dimension, unlike the reference's CUDA-friendly ``(B, D, L)``.
- ``backend="chunked"`` (default for long sequences) is a
  ``jax.custom_vjp`` that runs a ``lax.scan`` over sequence chunks with the
  state carried between chunks, an associative scan *within* each chunk, and
  a backward pass that recomputes per-chunk states from saved chunk carries
  before running the reverse adjoint scan.  This mirrors the reference
  kernel's chunking scheme (selective_scan.cpp:307-313, chunked prefix
  carry) and its recompute-in-backward strategy — but with no atomics, so
  gradients are bitwise deterministic (the CUDA backward uses
  ``gpuAtomicAdd`` for dB/dC and is not).
- ``backend="assoc"`` materializes the full ``(B, L, D, N)`` operands and
  differentiates through ``lax.associative_scan`` — simple, good for short
  sequences / debugging.
- ``backend="ref"`` is the sequential ``lax.scan`` golden model used by the
  parity tests (tolerances follow dis_mamba/tests/ops/test_selective_scan.py).

All internal accumulation is float32 regardless of input dtype, matching the
reference kernel's fp32 state/weight discipline (selective_scan.cpp:282-293).

Complex-valued ``A`` (the reference kernel's complex64 weight dispatch,
selective_scan.cpp:14-51,328-332 — the S4D-complex mode; unused by every
shipped ZigMa config), optionally with complex B/C, is supported on the
``ref``, ``assoc``, and (round 3) ``chunked`` backends: the recurrence runs
in complex64 and the real output doubles the real part,
``y = 2*Re(<C_t, x_t>)``, exactly as the reference golden model
(selective_scan_interface.py:143-145).  Complex B/C are passed as complex
(B, L, N) arrays (the JAX-native form of the reference's packed-real
``(B, N, 2L)`` view_as_complex layout).  ``backend="auto"`` routes complex
variable-B/C inputs to the chunked custom-VJP (recompute-in-backward, no
(B, L, D, N) HBM materialization — the memory class the reference's complex
bwd kernels occupy, selective_scan_bwd_*_complex.cu); only the Pallas
kernel stays real-only.

Grouped variable B/C (``ngroups > 1``: (B, L, G, N) arrays, each group
covering ``d_inner // G`` consecutive channels —
selective_scan_interface.py:30-40) runs on ALL backends; the fast paths
(chunked, pallas) vmap over the group axis (round 3), matching the CUDA
kernel's grouped dispatch tested at groups {1, 2}.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "selective_scan",
    "selective_scan_ref",
    "selective_state_update",
    "selective_scan_flops",
]


def _f32(x):
    """fp32 compute dtype — complex inputs keep their imaginary part."""
    if jnp.iscomplexobj(x):
        return x.astype(jnp.complex64)
    return x.astype(jnp.float32)


def _is_complex(*arrays):
    return any(a is not None and jnp.iscomplexobj(a) for a in arrays)


def _apply_delta_prep(delta, delta_bias, delta_softplus):
    delta = _f32(delta)
    if delta_bias is not None:
        delta = delta + _f32(delta_bias)
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    return delta


def _expand_bc(M, batch, L, d_inner):
    """Normalize B/C to (batch, L, d_inner-broadcastable, N) float32.

    Accepts (N,)-less shapes: (D, N) static, (B, L, N) variable shared over
    channels, or (B, L, G, N) grouped variable (each group covers
    ``d_inner // G`` consecutive channels, matching the reference's
    ``repeat(B, "B G N L -> B (G H) N L")``).
    Returns an array broadcastable against (batch, L, d_inner, N).
    """
    M = _f32(M)
    if M.ndim == 2:  # static (D, N)
        return M[None, None]  # (1, 1, D, N)
    if M.ndim == 3:  # (B, L, N)
        return M[:, :, None, :]  # (B, L, 1, N)
    if M.ndim == 4:  # (B, L, G, N)
        G = M.shape[2]
        return jnp.repeat(M, d_inner // G, axis=2)  # (B, L, D, N)
    raise ValueError(f"bad B/C shape {M.shape}")


# ---------------------------------------------------------------------------
# Golden model: sequential scan over time
# ---------------------------------------------------------------------------


def selective_scan_ref(
    u,
    delta,
    A,
    B,
    C,
    D: Optional[jax.Array] = None,
    z: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
):
    """Sequential golden model (``lax.scan`` over time, fp32 compute).

    Args:
      u: (batch, L, d_inner) input sequence.
      delta: (batch, L, d_inner) timestep.
      A: (d_inner, N) state matrix (real; fp32).
      B, C: (batch, L, N), (batch, L, G, N), or static (d_inner, N).
      D: optional (d_inner,) skip.
      z: optional (batch, L, d_inner) gate; output multiplied by silu(z).
      delta_bias: optional (d_inner,) added to delta before softplus.
    Returns out (batch, L, d_inner) in u.dtype; optionally also the final
    state (batch, d_inner, N) fp32.
    """
    dtype_in = u.dtype
    batch, L, d_inner = u.shape
    N = A.shape[1]
    uf = _f32(u)
    delta = _apply_delta_prep(delta, delta_bias, delta_softplus)
    A = _f32(A)
    Bv = jnp.broadcast_to(_expand_bc(B, batch, L, d_inner), (batch, L, d_inner, N))
    Cv = jnp.broadcast_to(_expand_bc(C, batch, L, d_inner), (batch, L, d_inner, N))

    log_a = delta[..., None] * A  # (B, L, D, N)
    b = (delta * uf)[..., None] * Bv

    cplx = _is_complex(A)
    if _is_complex(Bv, Cv) and not cplx:
        raise ValueError("complex B/C require complex A (the reference's "
                         "S4D-complex mode dispatches on A's dtype)")

    def step(x, inp):
        la_t, b_t, c_t = inp
        x = jnp.exp(la_t) * x + b_t
        y = jnp.sum(x * c_t, axis=-1)
        if cplx:
            # reference complex mode: y = 2 * Re(<C, x>)
            # (selective_scan_interface.py:143-145)
            y = 2.0 * y.real
        return x, y

    x0 = jnp.zeros((batch, d_inner, N),
                   jnp.complex64 if cplx else jnp.float32)
    # scan over time: move L to the leading axis
    xs_last, ys = jax.lax.scan(
        step,
        x0,
        (
            jnp.moveaxis(log_a, 1, 0),
            jnp.moveaxis(b, 1, 0),
            jnp.moveaxis(Cv, 1, 0),
        ),
    )
    y = jnp.moveaxis(ys, 0, 1)  # (B, L, D)
    out = y if D is None else y + uf * _f32(D)
    if z is not None:
        out = out * jax.nn.silu(_f32(z))
    out = out.astype(dtype_in)
    return (out, xs_last) if return_last_state else out


# ---------------------------------------------------------------------------
# assoc backend: full-sequence associative scan (autodiff-through)
# ---------------------------------------------------------------------------


def _scan_combine(left, right):
    """Monoid for x -> a*x + b segments in log-a space:
    (la1, b1) ∘ (la2, b2) = (la1+la2, b1*exp(la2)+b2).
    Same operator as the reference CUDA scan (selective_scan_common.h:108-129)
    but with the multiplier kept as a log for exact exp fusion."""
    la_l, b_l = left
    la_r, b_r = right
    return la_l + la_r, b_l * jnp.exp(la_r) + b_r


def _selective_scan_assoc(u, delta, A, B, C, D, z, delta_bias, delta_softplus,
                          return_last_state):
    dtype_in = u.dtype
    batch, L, d_inner = u.shape
    N = A.shape[1]
    uf = _f32(u)
    delta = _apply_delta_prep(delta, delta_bias, delta_softplus)
    Bv = _expand_bc(B, batch, L, d_inner)
    Cv = _expand_bc(C, batch, L, d_inner)

    cplx = _is_complex(A)
    if _is_complex(Bv, Cv) and not cplx:
        raise ValueError("complex B/C require complex A (the reference's "
                         "S4D-complex mode dispatches on A's dtype)")
    log_a = delta[..., None] * _f32(A)  # (B, L, D, N)
    b = (delta * uf)[..., None] * Bv  # broadcast over D or N as needed
    if cplx:
        log_a = log_a.astype(jnp.complex64)
        b = b.astype(jnp.complex64)
    b = jnp.broadcast_to(b, log_a.shape)

    _, xs = jax.lax.associative_scan(_scan_combine, (log_a, b), axis=1)
    y = jnp.sum(xs * Cv, axis=-1)  # (B, L, D)
    if cplx:
        y = 2.0 * y.real  # reference complex mode (2x real part)
    out = y if D is None else y + uf * _f32(D)
    if z is not None:
        out = out * jax.nn.silu(_f32(z))
    out = out.astype(dtype_in)
    return (out, xs[:, -1]) if return_last_state else out


# ---------------------------------------------------------------------------
# chunked backend: lax.scan over chunks + within-chunk associative scan,
# custom VJP with per-chunk state recomputation
# ---------------------------------------------------------------------------


def _chunk_states(la, b, x0):
    """Within-chunk scan seeded by carry x0.

    la, b: (batch, cl, D, N); x0: (batch, D, N).
    Returns xs (batch, cl, D, N) and the chunk-end state xs[:, -1].
    """
    la_cum, xs0 = jax.lax.associative_scan(_scan_combine, (la, b), axis=1)
    xs = xs0 + jnp.exp(la_cum) * x0[:, None]
    return xs


# --- real-pair (structure-of-arrays) complex arithmetic --------------------
# TPUs have no complex hardware type; XLA lowers complex64 to real pairs
# itself — and on this libtpu that lowering SIGABRTs the compiler on the
# chunked BACKWARD graph (round 3: tpu_compile_helper exit signal 6 on the
# (4, 512, 512, 8) grad; the forward compiles and runs).  So the S4D-complex
# mode (selective_scan.cpp:14-51) runs the SAME monoid on explicit (re, im)
# pairs: complex only ever appears at the jit boundary (splitting the user's
# complex64 A/B/C, reassembling the complex cotangents), which compiles fine.


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cexp(lr, li):
    e = jnp.exp(lr)
    return e * jnp.cos(li), e * jnp.sin(li)


def _scan_combine_pairs(left, right):
    """Real-pair form of ``_scan_combine``: elements are (Re la, Im la,
    Re b, Im b); combine is (la_l + la_r, b_l * exp(la_r) + b_r)."""
    lar_l, lai_l, br_l, bi_l = left
    lar_r, lai_r, br_r, bi_r = right
    er, ei = _cexp(lar_r, lai_r)
    pr, pi = _cmul(br_l, bi_l, er, ei)
    return lar_l + lar_r, lai_l + lai_r, pr + br_r, pi + bi_r


def _chunk_states_pairs(lar, lai, br, bi, x0r, x0i):
    """Real-pair form of ``_chunk_states``."""
    lcr, lci, xr0, xi0 = jax.lax.associative_scan(
        _scan_combine_pairs, (lar, lai, br, bi), axis=1)
    er, ei = _cexp(lcr, lci)
    tr, ti = _cmul(er, ei, x0r[:, None], x0i[:, None])
    return xr0 + tr, xi0 + ti


def _chunk_adjoint_pairs(lar, lai, dxr, dxi, g_inr, g_ini):
    """Real-pair form of ``_chunk_adjoint`` (same flip-into-scan fusion
    hazard — the optimization barrier mirrors the real path, see below)."""
    shift = lambda t: jnp.concatenate(
        [t[:, 1:], jnp.zeros_like(t[:, :1])], axis=1)
    lar_r = jnp.flip(shift(lar), axis=1)
    lai_r = jnp.flip(shift(lai), axis=1)
    dxr_r = jnp.flip(dxr, axis=1)
    dxi_r = jnp.flip(dxi, axis=1)
    lar_r, lai_r, dxr_r, dxi_r = jax.lax.optimization_barrier(
        (lar_r, lai_r, dxr_r, dxi_r))
    lcr, lci, gr0, gi0 = jax.lax.associative_scan(
        _scan_combine_pairs, (lar_r, lai_r, dxr_r, dxi_r), axis=1)
    er, ei = _cexp(lcr, lci)
    tr, ti = _cmul(er, ei, g_inr[:, None], g_ini[:, None])
    return jnp.flip(gr0 + tr, axis=1), jnp.flip(gi0 + ti, axis=1)


def _chunk_adjoint(la, dx, g_in):
    """Reverse adjoint scan within a chunk.

    Solves g_t = dx_t + a_{t+1} g_{t+1} for t = cl-1 .. 0, where ``g_in`` is
    the already-discounted contribution flowing in from the next chunk
    (i.e. a_{t1+1} * g_{t1+1}).  Returns g (batch, cl, D, N).
    This is the deterministic mirror of the reference's reverse postfix scan
    (reverse_scan.cuh:202-290).
    """
    # reversed-time recurrence has multiplier a_{t+1}: shift la left by one,
    # then flip; the last element (t = cl-1) has multiplier handled by g_in.
    la_next = jnp.concatenate([la[:, 1:], jnp.zeros_like(la[:, :1])], axis=1)
    la_r = jnp.flip(la_next, axis=1)
    dx_r = jnp.flip(dx, axis=1)
    # XLA:TPU miscompiles jnp.flip fused INTO lax.associative_scan at large
    # batch*d_inner (observed: (16, 128, 512, 16) fp32 gives garbage — max
    # err ~1e1 on O(1) data — while (2, ...) and (16, ..., 128, ...) pass;
    # flip alone and the scan alone are each exact; `reverse=True` flips
    # internally and fails identically).  The barrier materializes the
    # flipped operands so the scan's slices never fuse with the reversal.
    la_r, dx_r = jax.lax.optimization_barrier((la_r, dx_r))
    la_cum_r, g_r0 = jax.lax.associative_scan(_scan_combine, (la_r, dx_r), axis=1)
    g_r = g_r0 + jnp.exp(la_cum_r) * g_in[:, None]
    return jnp.flip(g_r, axis=1)


def _pad_chunks(x, L_pad, axis=1):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, L_pad - x.shape[axis])
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _chunked_core(cfg, u, delta, A, Bv, Cv, Dp, z, delta_bias):
    out, _ = _chunked_fwd_impl(cfg, u, delta, A, Bv, Cv, Dp, z, delta_bias)
    return out


def _chunked_fwd_impl(cfg, u, delta, A, Bv, Cv, Dp, z, delta_bias):
    """Forward pass.  cfg = (chunk, softplus, has_D, has_z, has_bias).

    u, delta: (B, L, D); A: (D, N) fp32; Bv, Cv: (B, L, N);
    Dp: (D,) or 0-size; z: (B, L, D) or 0-size; delta_bias: (D,) or 0-size.
    Returns (out, carries) with carries (B, nc, D, N) = chunk-start states.
    """
    chunk, softplus, has_D, has_z, has_bias = cfg
    dtype_in = u.dtype
    batch, L, d_inner = u.shape
    N = A.shape[1]
    cl = min(chunk, L)
    nc = -(-L // cl)
    L_pad = nc * cl

    uf = _f32(u)
    dlt = _apply_delta_prep(delta, delta_bias if has_bias else None, softplus)
    Bvf, Cvf = _f32(Bv), _f32(Cv)
    if L_pad != L:
        uf, dlt, Bvf, Cvf = (_pad_chunks(t, L_pad) for t in (uf, dlt, Bvf, Cvf))

    def reshape_c(t):  # (B, L_pad, ...) -> (nc, B, cl, ...)
        t = t.reshape(batch, nc, cl, *t.shape[2:])
        return jnp.moveaxis(t, 1, 0)

    u_c, d_c = reshape_c(uf), reshape_c(dlt)

    cplx = _is_complex(A)
    if cplx:
        # real-pair lowering (see the pair helpers above): split the
        # complex operands ONCE at the boundary; all scan math is real
        Ar, Ai = jnp.real(A), jnp.imag(A)
        Br_c, Bi_c = reshape_c(jnp.real(Bvf)), reshape_c(jnp.imag(Bvf))
        Cr_c, Ci_c = reshape_c(jnp.real(Cvf)), reshape_c(jnp.imag(Cvf))

        def body(x, inp):
            xr, xi = x
            uc, dc, bcr, bci, ccr, cci = inp
            lar = dc[..., None] * Ar
            lai = dc[..., None] * Ai
            w = (dc * uc)[..., None]
            xsr, xsi = _chunk_states_pairs(
                lar, lai, w * bcr[:, :, None, :], w * bci[:, :, None, :],
                xr, xi)
            # reference complex mode: y = 2 * Re(<C, x>)
            y = 2.0 * (jnp.einsum("bldn,bln->bld", xsr, ccr)
                       - jnp.einsum("bldn,bln->bld", xsi, cci))
            return (xsr[:, -1], xsi[:, -1]), (y, x)

        x0 = (jnp.zeros((batch, d_inner, N), jnp.float32),) * 2
        xs_in = (u_c, d_c, Br_c, Bi_c, Cr_c, Ci_c)
    else:
        B_c, C_c = reshape_c(Bvf), reshape_c(Cvf)

        def body(x, inp):
            uc, dc, bc, cc = inp  # (B,cl,D), (B,cl,D), (B,cl,N), (B,cl,N)
            la = dc[..., None] * A  # (B, cl, D, N)
            b = (dc * uc)[..., None] * bc[:, :, None, :]
            xs = _chunk_states(la, b, x)
            y = jnp.einsum("bldn,bln->bld", xs, cc,
                           preferred_element_type=jnp.float32)
            return xs[:, -1], (y, x)

        x0 = jnp.zeros((batch, d_inner, N), jnp.float32)
        xs_in = (u_c, d_c, B_c, C_c)

    x_final, (ys, carries) = jax.lax.scan(body, x0, xs_in)
    y = jnp.moveaxis(ys, 0, 1).reshape(batch, L_pad, d_inner)[:, :L]

    out = y if not has_D else y + _f32(u) * _f32(Dp)
    if has_z:
        out = out * jax.nn.silu(_f32(z))
    # chunk starts (B, nc, D, N) — a (re, im) pair of those when complex
    # (the residual stays real so the bwd graph is complex-free);
    # x_final = state after the last chunk, complex at the API boundary
    if cplx:
        carries = tuple(jnp.moveaxis(c, 0, 1) for c in carries)
        x_final = (x_final[0] + 1j * x_final[1]).astype(jnp.complex64)
    else:
        carries = jnp.moveaxis(carries, 0, 1)
    return out.astype(dtype_in), (carries, x_final)


def _chunked_fwd(cfg, u, delta, A, Bv, Cv, Dp, z, delta_bias):
    out, (carries, _) = _chunked_fwd_impl(cfg, u, delta, A, Bv, Cv, Dp, z,
                                          delta_bias)
    return out, (u, delta, A, Bv, Cv, Dp, z, delta_bias, carries)


def _chunked_bwd(cfg, res, g_out):
    chunk, softplus, has_D, has_z, has_bias = cfg
    u, delta, A, Bv, Cv, Dp, z, delta_bias, carries = res
    batch, L, d_inner = u.shape
    N = A.shape[1]
    cl = min(chunk, L)
    # carries is a (re, im) pair of (B, nc, D, N) when A is complex
    nc = (carries[0] if isinstance(carries, tuple) else carries).shape[1]
    L_pad = nc * cl

    uf = _f32(u)
    # delta pre-activation (for softplus backward) and activated delta
    dlt_pre = _f32(delta) + (_f32(delta_bias) if has_bias else 0.0)
    dlt = jax.nn.softplus(dlt_pre) if softplus else dlt_pre
    Bvf, Cvf = _f32(Bv), _f32(Cv)
    g = _f32(g_out)

    if has_z:
        zf = _f32(z)
        sig = jax.nn.sigmoid(zf)
        silu_z = zf * sig

    def reshape_c(t):
        t = _pad_chunks(t, L_pad) if L_pad != L else t
        t = t.reshape(batch, nc, cl, *t.shape[2:])
        return jnp.moveaxis(t, 1, 0)

    u_c, d_c, g_c = reshape_c(uf), reshape_c(dlt), reshape_c(g)
    if has_z:
        z_c, sig_c, silu_c = (reshape_c(t) for t in (zf, sig, silu_z))

    cplx = _is_complex(A)
    dD0 = jnp.zeros((d_inner,), jnp.float32)

    def _epilogue(y, inp_tail, dD_acc):
        """Shared real epilogue: dz / dD / the du(D) term from the gate."""
        uc, gc = inp_tail[0], inp_tail[1]
        if has_z:
            zc, sigc, siluc = inp_tail[2:]
            out_pre = y + uc * _f32(Dp) if has_D else y
            dz_c = gc * out_pre * (sigc * (1.0 + zc * (1.0 - sigc)))
            gyD = gc * siluc
        else:
            dz_c = None
            gyD = gc
        if has_D:
            dD_acc = dD_acc + jnp.einsum("bld,bld->d", gyD, uc)
            du_c = gyD * _f32(Dp)
        else:
            du_c = jnp.zeros_like(uc)
        return gyD, du_c, dz_c, dD_acc

    # Complex cotangents follow the JAX convention for real-valued
    # losses, g_w = dL/dRe(w) - i*dL/dIm(w) — under which the chain
    # rule through HOLOMORPHIC factors is conjugate-free (g_w = k*g_o
    # for o = k*w; verified empirically: jax.grad of 2*Re(k*w) is 2k).
    # So the complex adjoint is the real code with (a) the factor 2
    # and no conj on the y = 2*Re(x*C) taps, and (b) Re(k*g) when a
    # complex product lands on a REAL leaf (delta, u).  Validated
    # against autodiff-through-ref and torch autograd
    # (tests/test_selective_scan.py, test_reference_scan_parity.py).
    # The complex path runs entirely on (re, im) PAIRS — see the pair
    # helpers above for why (XLA:TPU SIGABRT on the complex bwd graph).
    if cplx:
        Ar, Ai = jnp.real(A), jnp.imag(A)
        Br_c, Bi_c = reshape_c(jnp.real(Bvf)), reshape_c(jnp.imag(Bvf))
        Cr_c, Ci_c = reshape_c(jnp.real(Cvf)), reshape_c(jnp.imag(Cvf))
        car_rc = jnp.moveaxis(carries[0], 1, 0)  # (nc, B, D, N)
        car_ic = jnp.moveaxis(carries[1], 1, 0)
        dA0 = (jnp.zeros_like(Ar), jnp.zeros_like(Ai))
        gx0 = (jnp.zeros((batch, d_inner, N), jnp.float32),) * 2

        def body(carry, inp):
            (gxr, gxi), (dAr_acc, dAi_acc), dD_acc = carry
            uc, dc, bcr, bci, ccr, cci, gc, x0r, x0i = inp[:9]
            lar = dc[..., None] * Ar
            lai = dc[..., None] * Ai
            w = (dc * uc)[..., None]
            br, bi = w * bcr[:, :, None, :], w * bci[:, :, None, :]
            # recompute within-chunk states (recompute-in-backward, as the
            # reference kernel, selective_scan_bwd_kernel.cuh)
            xsr, xsi = _chunk_states_pairs(lar, lai, br, bi, x0r, x0i)
            y = 2.0 * (jnp.einsum("bldn,bln->bld", xsr, ccr)
                       - jnp.einsum("bldn,bln->bld", xsi, cci))
            gyD, du_c, dz_c, dD_acc = _epilogue(
                y, (uc, gc) + tuple(inp[9:]), dD_acc)
            dy = gyD
            dC_r = 2.0 * jnp.einsum("bld,bldn->bln", dy, xsr)
            dC_i = 2.0 * jnp.einsum("bld,bldn->bln", dy, xsi)
            dxr = 2.0 * dy[..., None] * ccr[:, :, None, :]
            dxi = 2.0 * dy[..., None] * cci[:, :, None, :]
            gsr, gsi = _chunk_adjoint_pairs(lar, lai, dxr, dxi, gxr, gxi)
            # db = gs; dla = gs * a * x_{t-1} = gs * (xs - b)
            dlar, dlai = _cmul(gsr, gsi, xsr - br, xsi - bi)
            gB = (jnp.einsum("bldn,bln->bld", gsr, bcr)
                  - jnp.einsum("bldn,bln->bld", gsi, bci))   # Re<gs, B>
            dd_A = (jnp.einsum("bldn,dn->bld", dlar, Ar)
                    - jnp.einsum("bldn,dn->bld", dlai, Ai))  # Re<dla, A>
            dd_c = dd_A + gB * uc
            dB_r = jnp.einsum("bldn,bld->bln", gsr, dc * uc)
            dB_i = jnp.einsum("bldn,bld->bln", gsi, dc * uc)
            dAr_acc = dAr_acc + jnp.einsum("bldn,bld->dn", dlar, dc)
            dAi_acc = dAi_acc + jnp.einsum("bldn,bld->dn", dlai, dc)
            # carry to the previous chunk: a_{t0} * g_{t0}
            er, ei = _cexp(lar[:, 0], lai[:, 0])
            gx_prev = _cmul(er, ei, gsr[:, 0], gsi[:, 0])
            du_c = du_c + dc * gB
            outs = (du_c, dd_c, (dB_r, dB_i), (dC_r, dC_i), dz_c)
            return (gx_prev, (dAr_acc, dAi_acc), dD_acc), (
                outs if has_z else outs[:4])

        xs_in = (u_c, d_c, Br_c, Bi_c, Cr_c, Ci_c, g_c, car_rc, car_ic)
    else:
        B_c, C_c = reshape_c(Bvf), reshape_c(Cvf)
        car_c = jnp.moveaxis(carries, 1, 0)  # (nc, B, D, N)
        dA0 = jnp.zeros_like(A)
        gx0 = jnp.zeros((batch, d_inner, N), jnp.float32)

        def body(carry, inp):
            gx, dA_acc, dD_acc = carry
            uc, dc, bc, cc, gc, x0c = inp[:6]
            # recompute within-chunk states (recompute-in-backward, as the
            # reference kernel, selective_scan_bwd_kernel.cuh)
            la = dc[..., None] * A
            b = (dc * uc)[..., None] * bc[:, :, None, :]
            xs = _chunk_states(la, b, x0c)
            y = jnp.einsum("bldn,bln->bld", xs, cc,
                           preferred_element_type=jnp.float32)
            gyD, du_c, dz_c, dD_acc = _epilogue(
                y, (uc, gc) + tuple(inp[6:]), dD_acc)
            dy = gyD  # (B, cl, D)
            dC_c = jnp.einsum("bld,bldn->bln", dy, xs)
            dx_local = dy[..., None] * cc[:, :, None, :]  # (B, cl, D, N)
            gs = _chunk_adjoint(la, dx_local, gx)  # (B, cl, D, N)
            # db = gs; dla = gs * a * x_{t-1} = gs * (xs - b)
            dla = gs * (xs - b)
            gB = jnp.einsum("bldn,bln->bld", gs, bc)  # sum_n gs * B
            dd_A = jnp.einsum("bldn,dn->bld", dla, A)
            dd_c = dd_A + gB * uc
            dB_c = jnp.einsum("bldn,bld->bln", gs, dc * uc)
            dA_acc = dA_acc + jnp.einsum("bldn,bld->dn", dla, dc)
            # carry to the previous chunk: a_{t0} * g_{t0}
            gx_prev = jnp.exp(la[:, 0]) * gs[:, 0]
            du_c = du_c + dc * gB
            outs = (du_c, dd_c, dB_c, dC_c, dz_c)
            return (gx_prev, dA_acc, dD_acc), (outs if has_z else outs[:4])

        xs_in = (u_c, d_c, B_c, C_c, g_c, car_c)
    if has_z:
        xs_in = xs_in + (z_c, sig_c, silu_c)
    (gx, dA, dD), outs = jax.lax.scan(body, (gx0, dA0, dD0), xs_in, reverse=True)

    def unchunk(t):  # (nc, B, cl, ...) -> (B, L, ...)
        t = jnp.moveaxis(t, 0, 1).reshape(batch, L_pad, *t.shape[3:])
        return t[:, :L]

    du, dd = unchunk(outs[0]), unchunk(outs[1])
    if cplx:
        # reassemble the complex cotangents at the boundary (JAX convention
        # g_w = dL/dRe(w) - i dL/dIm(w) with the conjugate-free chain rule
        # — identical to what autodiff produced on the old complex path)
        dBv = unchunk(outs[2][0]) + 1j * unchunk(outs[2][1])
        dCv = unchunk(outs[3][0]) + 1j * unchunk(outs[3][1])
        dA = dA[0] + 1j * dA[1]
    else:
        dBv, dCv = unchunk(outs[2]), unchunk(outs[3])
    dz = unchunk(outs[4]).astype(z.dtype) if has_z else None

    # softplus / bias backward
    if softplus:
        dd = dd * jax.nn.sigmoid(dlt_pre)
    ddelta_bias = jnp.einsum("bld->d", dd) if has_bias else None

    return (
        du.astype(u.dtype),
        dd.astype(delta.dtype),
        dA,
        dBv.astype(Bv.dtype),
        dCv.astype(Cv.dtype),
        dD if has_D else jnp.zeros_like(Dp),
        dz if has_z else jnp.zeros_like(z),
        ddelta_bias if has_bias else jnp.zeros_like(delta_bias),
    )


_chunked_core.defvjp(_chunked_fwd, _chunked_bwd)


def _grouped_fast_call(fn, u, delta, A, B, C, D, z, delta_bias,
                       return_last_state):
    """Run a (B, L, N)-variable-B/C fast backend with GROUPED (B, L, G, N)
    B/C by vmapping it over the group axis.

    Group g covers the ``d_inner // G`` consecutive channels
    ``[g*H, (g+1)*H)`` — the reference's
    ``repeat(B, "B G N L -> B (G H) N L")`` semantics
    (selective_scan_interface.py:30-40; CUDA tests at groups {1, 2},
    dis_mamba/tests/ops/test_selective_scan.py:32).  Each per-group slice
    is an independent scan, so the mapped call is exact, and vmap turns it
    into one batched kernel (an extra grid dimension on the Pallas path).
    """
    batch, L, d_inner = u.shape
    G = B.shape[2]
    if d_inner % G != 0:
        raise ValueError(f"d_inner {d_inner} not divisible by {G} B/C groups")
    H = d_inner // G

    def split_d(t):  # (..., D) -> (G, ..., H) consecutive blocks
        if t is None:
            return None
        t = t.reshape(*t.shape[:-1], G, H)
        return jnp.moveaxis(t, -2, 0)

    ug, dg, zg = split_d(u), split_d(delta), split_d(z)
    Ag = A.reshape(G, H, A.shape[1])
    Dg = split_d(D) if D is not None else None
    dbg = split_d(delta_bias) if delta_bias is not None else None
    Bg = jnp.moveaxis(B, 2, 0)  # (G, batch, L, N)
    Cg = jnp.moveaxis(C, 2, 0)

    axes = (0, 0, 0, 0, 0,
            0 if D is not None else None,
            0 if z is not None else None,
            0 if delta_bias is not None else None)
    res = jax.vmap(fn, in_axes=axes)(ug, dg, Ag, Bg, Cg, Dg, zg, dbg)
    out, last = res if return_last_state else (res, None)
    # (G, batch, L, H) -> (batch, L, G, H) -> consecutive channel blocks
    out = jnp.moveaxis(out, 0, 2).reshape(batch, L, d_inner)
    if return_last_state:
        # (G, batch, H, N) -> (batch, G*H, N)
        last = jnp.moveaxis(last, 0, 1).reshape(batch, d_inner, last.shape[-1])
        return out, last
    return out


def _selective_scan_chunked(u, delta, A, B, C, D, z, delta_bias, delta_softplus,
                            return_last_state, chunk):
    batch, L, d_inner = u.shape
    if B.ndim == 4 and C.ndim == 4:
        if B.shape[2] == 1 and C.shape[2] == 1:
            B, C = B[:, :, 0], C[:, :, 0]
        else:
            fn = lambda *a: _selective_scan_chunked(
                *a, delta_softplus=delta_softplus,
                return_last_state=return_last_state, chunk=chunk)
            return _grouped_fast_call(fn, u, delta, A, B, C, D, z,
                                      delta_bias, return_last_state)
    if B.ndim != 3 or C.ndim != 3:
        raise ValueError("chunked backend requires variable B/C of shape "
                         "(B, L, N) or grouped (B, L, G, N)")
    cfg = (chunk, bool(delta_softplus), D is not None, z is not None,
           delta_bias is not None)
    Dp = D if D is not None else jnp.zeros((d_inner,), jnp.float32)
    zz = z if z is not None else jnp.zeros((0,), u.dtype)
    db = delta_bias if delta_bias is not None else jnp.zeros((0,), jnp.float32)
    if return_last_state:
        # the chunked scan's final carry IS the last state (padded steps are
        # identity: the activated delta is zero-padded, so exp(0)*x + 0 = x)
        out, (_, x_final) = _chunked_fwd_impl(cfg, u, delta, A, B, C, Dp, zz,
                                              db)
        return out, x_final
    return _chunked_core(cfg, u, delta, A, B, C, Dp, zz, db)


# ---------------------------------------------------------------------------
# public dispatch
# ---------------------------------------------------------------------------


def selective_scan(
    u,
    delta,
    A,
    B,
    C,
    D: Optional[jax.Array] = None,
    z: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
    backend: str = "auto",
    chunk: int = 128,
):
    """Selective scan with backend dispatch.  See module docstring.

    backend: "auto" | "chunked" | "assoc" | "ref" | "pallas".
    "auto" picks the Pallas kernel on TPU for the ZigMa hot path (variable
    (B, L, N)-shaped B/C, no last-state request) — measured ~2 ms for the
    flagship (16, 1024, 1536, 16) scan, at the VPU roofline, while the
    chunked jnp path must materialize (B, L, D, N) in HBM.  Elsewhere:
    chunked for variable B/C, assoc for static B/C.
    """
    cplx = _is_complex(A)
    if _is_complex(B, C) and not cplx:
        # the 2x-real-part output convention is the S4D conjugate-pair
        # trick, defined by COMPLEX A (the reference dispatches on
        # A.is_complex() only, selective_scan_interface.py:111); complex
        # B/C with real A has no reference semantics — reject rather than
        # silently double the output
        raise ValueError("complex B/C require complex A (the reference's "
                         "S4D-complex mode dispatches on A's dtype)")
    if (B.ndim, C.ndim) in ((4, 3), (3, 4)):
        # mixed-rank variable B/C: the reference treats grouping per-tensor
        # (is_variable_B/C are independent, selective_scan_interface.py:
        # 30-40), so a shared (B, L, N) projection alongside a grouped
        # (B, L, G, N) one applies to every group — broadcast it so the
        # grouped fast backends see matching ranks (free under XLA)
        G = B.shape[2] if B.ndim == 4 else C.shape[2]
        if B.ndim == 3:
            B = jnp.broadcast_to(B[:, :, None],
                                 B.shape[:2] + (G,) + B.shape[2:])
        else:
            C = jnp.broadcast_to(C[:, :, None],
                                 C.shape[:2] + (G,) + C.shape[2:])
    if B.ndim == 4 and C.ndim == 4 and B.shape[2] != C.shape[2]:
        raise ValueError(
            f"grouped B/C must agree on n_groups (got {B.shape[2]} vs "
            f"{C.shape[2]}; the reference kernel checks C against B's "
            "n_groups, selective_scan.cpp)")
    variable_bc = B.ndim in (3, 4) and C.ndim in (3, 4)
    if backend == "auto" and cplx:
        # complex64 weights (the reference kernel's S4D-complex dispatch):
        # the chunked custom-VJP runs the recurrence in complex64 with
        # recompute-in-backward (round 3) — same memory class as the real
        # path, unlike assoc which materializes (B, L, D, N) complex and
        # autodiffs through it (kept for static-B/C / debugging)
        backend = "chunked" if variable_bc else "assoc"
    if cplx and backend == "pallas":
        raise ValueError(
            "backend='pallas' is real-only; complex A runs on 'chunked' "
            "(custom VJP), 'assoc', or 'ref' (auto picks chunked)")
    if backend == "auto":
        from zigma_tpu.ops.scan_pallas import (
            pallas_seq_aligned, pallas_shape_supported)

        G = B.shape[2] if B.ndim == 4 else 1
        # the pallas backend auto-pads unaligned L, except when the final
        # state is requested (padding would evolve it past position L-1);
        # shapes whose VMEM scratch can't be blocked (very large d_state)
        # degrade to the chunked jnp path instead of a Mosaic failure
        pallas_ok = (
            (pallas_seq_aligned(u.shape[1]) or not return_last_state)
            and pallas_shape_supported(u.shape[1], u.shape[2] // G,
                                       A.shape[1], u.dtype))
        if (variable_bc and pallas_ok
                and jax.default_backend() == "tpu"):
            backend = "pallas"
        else:
            backend = "chunked" if variable_bc else "assoc"
    if backend == "ref":
        return selective_scan_ref(u, delta, A, B, C, D, z, delta_bias,
                                  delta_softplus, return_last_state)
    if backend == "assoc":
        return _selective_scan_assoc(u, delta, A, B, C, D, z, delta_bias,
                                     delta_softplus, return_last_state)
    if backend == "chunked":
        return _selective_scan_chunked(u, delta, A, B, C, D, z, delta_bias,
                                       delta_softplus, return_last_state, chunk)
    if backend == "pallas":
        from zigma_tpu.ops.scan_pallas import selective_scan_pallas

        if B.ndim == 4 and C.ndim == 4 and B.shape[2] > 1:
            fn = lambda *a: selective_scan_pallas(
                *a, delta_softplus=delta_softplus,
                return_last_state=return_last_state)
            return _grouped_fast_call(fn, u, delta, A, B, C, D, z,
                                      delta_bias, return_last_state)
        if B.ndim == 4:
            B, C = B[:, :, 0], C[:, :, 0]
        return selective_scan_pallas(u, delta, A, B, C, D, z, delta_bias,
                                     delta_softplus, return_last_state)
    raise ValueError(f"unknown backend {backend!r}")


# ---------------------------------------------------------------------------
# single-step decode update
# ---------------------------------------------------------------------------


def selective_state_update(
    state,
    x,
    dt,
    A,
    B,
    C,
    D: Optional[jax.Array] = None,
    z: Optional[jax.Array] = None,
    dt_bias: Optional[jax.Array] = None,
    dt_softplus: bool = False,
):
    """One-timestep SSM update for autoregressive decode.

    Functional equivalent of the reference Triton kernel
    (dis_mamba/mamba_ssm/ops/triton/selective_state_update.py:21-155) — the
    state is returned, not mutated.

    state: (batch, D, N) fp32; x, dt: (batch, D); B, C: (batch, N).
    Returns (y, new_state) with y (batch, D) in x.dtype.
    """
    dtf = _f32(dt)
    if dt_bias is not None:
        dtf = dtf + _f32(dt_bias)
    if dt_softplus:
        dtf = jax.nn.softplus(dtf)
    dA = jnp.exp(dtf[..., None] * _f32(A))  # (batch, D, N)
    dBx = (dtf * _f32(x))[..., None] * _f32(B)[:, None, :]
    new_state = _f32(state) * dA + dBx
    y = jnp.einsum("bdn,bn->bd", new_state, _f32(C))
    if jnp.iscomplexobj(y):
        # S4D-complex output convention, matching every scan backend
        # (selective_scan_interface.py:143-145): y = 2 * Re(<C, x>) — so
        # prefill (parallel scan) and decode (this step) agree token-for-
        # token on complex-A models
        y = 2.0 * y.real
    if D is not None:
        y = y + _f32(D) * _f32(x)
    if z is not None:
        y = y * jax.nn.silu(_f32(z))
    return y.astype(x.dtype), new_state


def selective_scan_flops(batch: int, L: int, d_inner: int, N: int,
                         with_D: bool = True, with_z: bool = False) -> int:
    """Analytic FLOP count per scan, matching the reference's fvcore rule
    (model_zigma.py:1140-1170): 9*B*L*D*N plus skip/gate terms."""
    flops = 9 * batch * L * d_inner * N
    if with_D:
        flops += batch * d_inner * L
    if with_z:
        flops += batch * d_inner * L
    return flops
