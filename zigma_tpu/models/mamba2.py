"""Mamba-2 sequence mixer (Flax): scalar-decay heads on the MXU.

Beyond reference parity — the reference ships only Mamba-1
(dis_mamba/mamba_ssm/modules/mamba_simple.py); there is no Mamba-2
anywhere in it.  This module exists because the Mamba-1 selective scan is
architecturally VPU-bound on TPU (docs/DESIGN.md §8-9: the Pallas kernel
sits at the VPU issue floor, and the named remaining throughput lever is
"Mamba-2-style scalar-decay heads that move the recurrence onto the
MXU").  ``Mamba2`` is that lever as a drop-in ZigMa mixer: set
``ssm_cfg: {ssm_version: 2}`` on any ZigMa config and every block's token
mixer becomes the SSD recurrence (``ops/ssd.py``), whose chunked form is
three dense matmuls per (chunk, head) — MXU food instead of a sequential
VPU recurrence.

Design (follows the public Mamba-2 paper / mamba_ssm-2.x conventions,
re-derived for channels-last TPU layout):

- ``in_proj: d_model -> 2*d_inner + 2*ngroups*d_state + nheads`` produces
  ``(z, xBC, dt)`` in one GEMM.
- causal depthwise conv (width ``d_conv``, fused silu) over the
  ``xBC = (x, B, C)`` channels — reuses ``ops/causal_conv1d``.
- scalar decay per head: ``A = -exp(A_log)``, ``A_log`` init
  log(U[A_init_range]); ``dt`` per head with the same inverse-softplus
  bias init as Mamba-1.
- ``y = ssd_scan(x, dt, A, B, C, D)`` (heads H = d_inner/headdim, groups
  G = ngroups sharing B/C — the multi-value-attention analogy).
- gated RMS norm **after** the scan: ``y = RMSNorm_g(y * silu(z))`` with
  per-group statistics (group size ``d_inner/ngroups``), then
  ``out_proj``.

ZigMa scan-type dispatch mirrors ``Mamba``: the space-filling-curve
permutation is applied to the tokens before ``in_proj`` and inverted
after ``out_proj`` (the ops in between are pointwise per token), so
zigzagN/hilbertN/randomN and the factorized ``video_*`` folds work
unchanged.  ``v2`` runs a second SSD branch on the flipped sequence with
its own conv/A/dt_bias/D (the Mamba-1 v2 analogue: projections shared —
flip commutes with pointwise GEMMs — recurrence parameters per
direction); the silu(z) gate is applied once after the directional sum,
which is algebraically identical to Mamba-1's per-branch gating
(``flip(y_b·silu(flip(z))) = flip(y_b)·silu(z)``).  ``parallelN`` is a
Mamba-1 vestige (dead code in the reference) and is not defined here.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from zigma_tpu.models.inits import torch_linear_init
from zigma_tpu.models.mamba import (_conv_init, _dt_bias_init,
                                    permute_tokens, vjp_inverse)
from zigma_tpu.ops.causal_conv1d import causal_conv1d, causal_conv1d_update
from zigma_tpu.ops.ssd import ssd_scan, ssd_state_update

__all__ = ["Mamba2", "Mamba2Cache"]


def _a_log_init_scalar(a_init_range):
    """A_log (H,) init: log(U[lo, hi]) — scalar decay rate per head."""
    lo, hi = a_init_range

    def init(key, shape, dtype=jnp.float32):
        return jnp.log(jax.random.uniform(key, shape, dtype, lo, hi))

    return init


class Mamba2Cache:
    """Per-layer decode cache: rolling conv window over the xBC channels
    + the (H, P, N) SSD state."""

    @staticmethod
    def init(batch: int, conv_dim: int, d_conv: int, nheads: int,
             headdim: int, d_state: int, dtype=jnp.float32):
        return (
            jnp.zeros((batch, d_conv, conv_dim), dtype),
            jnp.zeros((batch, nheads, headdim, d_state), jnp.float32),
        )


class _SSDBranch(nn.Module):
    """One conv -> SSD direction (recurrence params only; projections are
    shared at the Mamba2 level — see module docstring)."""

    d_inner: int
    d_state: int
    d_conv: int
    nheads: int
    headdim: int
    ngroups: int
    a_init_range: tuple
    dt_min: float
    dt_max: float
    dt_init_floor: float
    conv_bias: bool
    dtype: Any
    chunk: int
    backend: str
    conv_fp32_taps: bool = False

    @property
    def conv_dim(self):
        return self.d_inner + 2 * self.ngroups * self.d_state

    def setup(self):
        self.conv_weight = self.param(
            "conv1d_weight", _conv_init(self.d_conv),
            (self.conv_dim, self.d_conv), jnp.float32)
        self.conv_b = (
            self.param("conv1d_bias", _conv_init(self.d_conv),
                       (self.conv_dim,), jnp.float32)
            if self.conv_bias else None)
        self.A_log = self.param("A_log",
                                _a_log_init_scalar(self.a_init_range),
                                (self.nheads,), jnp.float32)
        self.dt_bias = self.param(
            "dt_bias", _dt_bias_init(self.dt_min, self.dt_max,
                                     self.dt_init_floor),
            (self.nheads,), jnp.float32)
        self.D = self.param("D", nn.initializers.ones, (self.nheads,),
                            jnp.float32)

    def _split(self, xbc_c, B_, L):
        G, N = self.ngroups, self.d_state
        x, Bv, Cv = jnp.split(
            xbc_c, [self.d_inner, self.d_inner + G * N], axis=-1)
        x = x.reshape(B_, L, self.nheads, self.headdim)
        return x, Bv.reshape(B_, L, G, N), Cv.reshape(B_, L, G, N)

    def __call__(self, xbc, dt):
        """xbc (B, L, conv_dim), dt (B, L, nheads) -> (B, L, d_inner)."""
        B_, L, _ = xbc.shape
        accum = jnp.float32 if self.conv_fp32_taps else None
        xbc_c = causal_conv1d(xbc, self.conv_weight, self.conv_b,
                              activation="silu", accum_dtype=accum)
        x, Bv, Cv = self._split(xbc_c, B_, L)
        y = ssd_scan(x, dt, -jnp.exp(self.A_log), Bv, Cv, self.D,
                     dt_bias=self.dt_bias, dt_softplus=True,
                     backend=self.backend, chunk=self.chunk)
        return checkpoint_name(y.reshape(B_, L, self.d_inner), "scan_out")

    def step(self, xbc, dt, cache):
        """Single-token decode.  xbc (B, conv_dim), dt (B, nheads)."""
        conv_state, ssm_state = cache
        accum = jnp.float32 if self.conv_fp32_taps else None
        xbc_c, conv_state = causal_conv1d_update(
            xbc, conv_state, self.conv_weight, self.conv_b,
            accum_dtype=accum)
        x, Bv, Cv = self._split(xbc_c[:, None], xbc.shape[0], 1)
        y, ssm_state = ssd_state_update(
            ssm_state, x[:, 0], dt, -jnp.exp(self.A_log), Bv[:, 0],
            Cv[:, 0], self.D, dt_bias=self.dt_bias, dt_softplus=True)
        return y.reshape(xbc.shape[0], self.d_inner), (conv_state, ssm_state)

    def prefill(self, xbc, dt):
        """Parallel prompt pass returning output + decode cache."""
        B_, L, _ = xbc.shape
        accum = jnp.float32 if self.conv_fp32_taps else None
        xbc_c = causal_conv1d(xbc, self.conv_weight, self.conv_b,
                              activation="silu", accum_dtype=accum)
        x, Bv, Cv = self._split(xbc_c, B_, L)
        y, ssm_state = ssd_scan(
            x, dt, -jnp.exp(self.A_log), Bv, Cv, self.D,
            dt_bias=self.dt_bias, dt_softplus=True,
            return_last_state=True, backend=self.backend, chunk=self.chunk)
        pad = jnp.zeros((B_, self.d_conv, self.conv_dim), xbc.dtype)
        conv_state = jnp.concatenate([pad, xbc], axis=1)[:, -self.d_conv:]
        return (y.reshape(B_, L, self.d_inner),
                (conv_state, ssm_state))


class Mamba2(nn.Module):
    """Mamba-2 token mixer with the ZigMa scan-type dispatch surface.

    Drop-in for ``Mamba`` in ``ZigMaBlock`` (select with
    ``ssm_cfg: {ssm_version: 2}``); same (x, perm, perm_rev) call
    contract.  Defaults follow the public Mamba-2 conventions
    (d_state 64, headdim 64, ngroups 1, A_init_range (1, 16)).
    """

    d_model: int
    d_state: int = 64
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    ngroups: int = 1
    a_init_range: tuple = (1.0, 16.0)
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4
    conv_bias: bool = True
    bias: bool = False
    rms_norm_eps: float = 1e-5
    scan_type: str = "v1"
    layer_idx: Optional[int] = None
    perm: Optional[Any] = None          # np.ndarray, static
    perm_rev: Optional[Any] = None
    video_frames: int = 0
    st: Optional[str] = None            # 's' | 't' for video layers
    parallel_perms: Optional[tuple] = None  # rejected (Mamba-1 vestige)
    dtype: Any = jnp.float32
    scan_backend: str = "auto"          # ssd_scan backend
    scan_chunk: int = 128
    conv_fp32_taps: bool = False
    out_proj_kernel_init: Optional[Any] = None

    @property
    def d_inner(self) -> int:
        return int(self.expand * self.d_model)

    @property
    def nheads(self) -> int:
        return self.d_inner // self.headdim

    @property
    def conv_dim(self) -> int:
        return self.d_inner + 2 * self.ngroups * self.d_state

    def setup(self):
        if self.d_inner % self.headdim:
            raise ValueError(f"d_inner {self.d_inner} not divisible by "
                             f"headdim {self.headdim}")
        if self.nheads % self.ngroups:
            raise ValueError(f"nheads {self.nheads} not divisible by "
                             f"ngroups {self.ngroups}")
        if self.scan_type.startswith("parallelN"):
            raise ValueError(
                "parallelN is a Mamba-1 construct (dead code in the "
                "reference); Mamba2 supports v1/v2/zigzagN/hilbertN/"
                "randomN/video_* scan types")
        backend = ("chunked" if self.scan_backend in ("auto", "pallas")
                   else self.scan_backend)
        branch_cfg = dict(
            d_inner=self.d_inner, d_state=self.d_state, d_conv=self.d_conv,
            nheads=self.nheads, headdim=self.headdim, ngroups=self.ngroups,
            a_init_range=self.a_init_range, dt_min=self.dt_min,
            dt_max=self.dt_max, dt_init_floor=self.dt_init_floor,
            conv_bias=self.conv_bias, dtype=self.dtype,
            chunk=self.scan_chunk, backend=backend,
            conv_fp32_taps=self.conv_fp32_taps)
        self.in_proj = nn.Dense(
            2 * self.d_inner + 2 * self.ngroups * self.d_state + self.nheads,
            use_bias=self.bias, dtype=self.dtype,
            kernel_init=torch_linear_init(), name="in_proj")
        self.fwd = _SSDBranch(**branch_cfg, name="ssd")
        if self.scan_type == "v2":
            self.bwd = _SSDBranch(**branch_cfg, name="ssd_b")
        self.norm_weight = self.param(
            "norm_weight", nn.initializers.ones, (self.d_inner,),
            jnp.float32)
        self.out_proj = nn.Dense(
            self.d_model, use_bias=self.bias, dtype=self.dtype,
            kernel_init=self.out_proj_kernel_init or torch_linear_init(),
            name="out_proj")

    def _gated_norm(self, y, z):
        """y = RMSNorm(y * silu(z)) with per-``ngroups`` statistics
        (the Mamba-2 RMSNormGated contract), fp32 stats."""
        y = y.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
        g = y.reshape(y.shape[:-1] + (self.ngroups,
                                      self.d_inner // self.ngroups))
        var = jnp.mean(jnp.square(g), axis=-1, keepdims=True)
        g = g * jax.lax.rsqrt(var + self.rms_norm_eps)
        y = g.reshape(y.shape) * self.norm_weight
        return y.astype(self.dtype)

    def _project(self, x):
        zxbcdt = self.in_proj(x)
        z, xbc, dt = jnp.split(
            zxbcdt, [self.d_inner, self.d_inner + self.conv_dim], axis=-1)
        return z, xbc, dt

    def __call__(self, x, perm=None, perm_rev=None):
        """x: (B, L, d_model) -> (B, L, d_model)."""
        B_, L, _ = x.shape
        if perm is None:
            perm = self.perm
        if perm_rev is None:
            perm_rev = self.perm_rev

        video = self.scan_type.startswith(("video_", "zzvideo_"))
        if video:
            if self.st not in ("s", "t"):
                raise ValueError(
                    f"video scan_type {self.scan_type!r} requires st='s' "
                    f"or 't' per layer, got {self.st!r}")
            T = self.video_frames
            K = L // T
            if self.st == "s":
                x = x.reshape(B_ * T, K, self.d_model)
            else:
                x = x.reshape(B_, T, K, self.d_model)
                x = jnp.moveaxis(x, 2, 1).reshape(B_ * K, T, self.d_model)

        if (perm is None) != (perm_rev is None):
            raise ValueError("perm and perm_rev must be given together")
        if perm is not None:
            x = permute_tokens(
                x, jnp.asarray(perm, jnp.int32),
                jnp.asarray(vjp_inverse(perm, perm_rev, not video),
                            jnp.int32))

        z, xbc, dt = self._project(x)
        y = self.fwd(xbc, dt)
        if self.scan_type == "v2":
            y_b = self.bwd(jnp.flip(xbc, axis=1), jnp.flip(dt, axis=1))
            y = y + jnp.flip(y_b, axis=1)
        out = self.out_proj(self._gated_norm(y, z))

        if perm_rev is not None:
            out = permute_tokens(
                out, jnp.asarray(perm_rev, jnp.int32),
                jnp.asarray(vjp_inverse(perm_rev, perm, not video),
                            jnp.int32))

        if video:
            T = self.video_frames
            if self.st == "s":
                out = out.reshape(B_, L, self.d_model)
            else:
                K = L // T
                out = out.reshape(B_, K, T, self.d_model)
                out = jnp.moveaxis(out, 2, 1).reshape(B_, L, self.d_model)
        return out

    def step(self, x, cache):
        """One decode token.  x: (B, 1, d_model); cache from
        Mamba2Cache.init.  Direction-less like ``Mamba.step``."""
        z, xbc, dt = self._project(x[:, 0])
        y, cache = self.fwd.step(xbc, dt, cache)
        return self.out_proj(self._gated_norm(y, z))[:, None], cache

    def prefill(self, x):
        """Parallel prompt processing -> (out (B, L, d_model), cache)."""
        if self.scan_type != "v1":
            raise ValueError(
                f"prefill/decode requires scan_type='v1', got "
                f"{self.scan_type!r}")
        z, xbc, dt = self._project(x)
        y, cache = self.fwd.prefill(xbc, dt)
        return self.out_proj(self._gated_norm(y, z)), cache
