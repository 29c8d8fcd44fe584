"""Mamba sequence-mixer module (Flax) with ZigMa scan-type dispatch.

TPU-native rebuild of the reference ``Mamba`` module
(reference: dis_mamba/mamba_ssm/modules/mamba_simple.py:64-608).

Key TPU-first departures from the reference (same math, different layout):

- Everything is channels-last ``(batch, seq, d)`` — the reference transposes
  to ``(B, D, L)`` because its CUDA kernels want channels-first
  (mamba_simple.py:290-296); on TPU the lane dimension should hold channels.
- The space-filling-curve permutation is applied to the *model-dim* input
  tokens before ``in_proj`` and inverted after ``out_proj`` instead of to the
  ``2*d_inner``-wide ``xz`` tensor (mamba_simple.py:356-395).  All ops between
  the reference's permutation site and ours are pointwise per token, so the
  result is identical while the gather moves 4x less data (d_model vs
  2*d_inner with expand=2).
- Permutations are static ``jnp.int32`` constants baked at model build, so
  under ``jit`` they compile to fused gathers (the reference needed
  ``torch.compile`` on the gather to reach its best speed, README.md:97-99).
- The v2 backward direction flips the *input* to the conv/scan rather than
  the packed ``xz`` tensor (mamba_simple.py:321-323; flip commutes with the
  pointwise in_proj) and shares ``out_proj`` applied to the summed branches,
  matching mamba_simple.py:334-339.
- ``parallelN`` — dead code in the reference (params allocated at
  mamba_simple.py:173-227 but forward raises NotImplementedError at :443) —
  is implemented here as N parallel scan branches (one per zigzag path)
  summed before out_proj, i.e. the natural reading of the parameter layout.

Weight-layout note for the checkpoint converter: kernels here are
``(in, out)`` = transpose of torch ``Linear.weight``; the depthwise conv
weight is ``(d_inner, d_conv)`` = squeeze of torch's ``(d, 1, w)``.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from jax.ad_checkpoint import checkpoint_name

from zigma_tpu.models.inits import torch_linear_init
from zigma_tpu.ops.causal_conv1d import causal_conv1d, causal_conv1d_update
from zigma_tpu.ops.selective_scan import selective_scan, selective_state_update


@jax.custom_vjp
def permute_tokens(x, perm, inv_perm):
    """``x[:, perm]`` with a bijection-aware VJP.

    ``jnp.take``'s autodiff adjoint is a scatter-add — XLA cannot know the
    index set is a permutation — and TPU scatters are slow.  For a bijection
    the adjoint is simply the inverse gather: measured 0.068 vs 0.136 ms
    per fwd+bwd at the flagship gather shape ((16, 1024, 768) bf16, v5e),
    and bit-identical (every output row receives exactly one input row, so
    no accumulation is involved in either form).  ``inv_perm`` MUST be the
    functional inverse of ``perm`` (argsort(perm)) — NOT blindly the
    model's paired perm_rev: video temporal layers deliberately pair
    non-inverse (perm, perm_rev) for checkpoint parity (ops/paths.py), and
    passing that pair here would silently flip every temporal gradient.
    Use ``vjp_inverse`` to derive the right argument.
    """
    return jnp.take(x, perm, axis=1)


def _permute_tokens_fwd(x, perm, inv_perm):
    return jnp.take(x, perm, axis=1), (inv_perm,)


def _permute_tokens_bwd(res, g):
    (inv_perm,) = res
    return jnp.take(g, inv_perm, axis=1), None, None


permute_tokens.defvjp(_permute_tokens_fwd, _permute_tokens_bwd)


def vjp_inverse(perm, paired_rev, trust_pair: bool):
    """The functional inverse of ``perm`` for permute_tokens' VJP argument.

    Image scan tables always come as mutual-inverse (perm, perm_rev) pairs,
    so the paired table IS the inverse (``trust_pair=True``, zero cost).
    Video temporal layers pair t_fwd with t_bwd — NOT inverses (a
    checkpoint-parity quirk, ops/paths.py) — so the inverse is derived:
    via numpy argsort for the static per-layer tables (free at trace time)
    or jnp.argsort for traced rows (scan-over-layers).
    """
    if trust_pair:
        return paired_rev
    if isinstance(perm, np.ndarray):
        return np.argsort(perm)
    return jnp.argsort(jnp.asarray(perm))


__all__ = ["Mamba", "MambaCache"]


def _dt_proj_kernel_init(dt_rank: int, dt_scale: float, dt_init: str):
    """dt_proj weight init preserving variance (mamba_simple.py:128-136)."""
    std = dt_rank**-0.5 * dt_scale

    def init(key, shape, dtype=jnp.float32):
        if dt_init == "constant":
            return jnp.full(shape, std, dtype)
        if dt_init == "random":
            return jax.random.uniform(key, shape, dtype, -std, std)
        raise NotImplementedError(dt_init)

    return init


def _dt_bias_init(dt_min: float, dt_max: float, dt_init_floor: float):
    """Inverse-softplus init so softplus(bias) ~ LogUniform[dt_min, dt_max]
    (mamba_simple.py:138-148)."""

    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, jnp.float32)
            * (math.log(dt_max) - math.log(dt_min))
            + math.log(dt_min)
        )
        dt = jnp.clip(dt, min=dt_init_floor)
        # softplus^{-1}(x) = x + log(-expm1(-x))
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)

    return init


def _a_log_init(d_state: int):
    """S4D-real init: A = -(1..N) per channel, stored as log, fp32
    (mamba_simple.py:151-158)."""

    def init(key, shape, dtype=jnp.float32):
        del key
        d_inner = shape[0]
        A = jnp.tile(jnp.arange(1, d_state + 1, dtype=jnp.float32), (d_inner, 1))
        return jnp.log(A).astype(dtype)

    return init


def _conv_init(d_conv: int):
    """torch Conv1d default: U(-sqrt(k), sqrt(k)), k = 1/(C_in/groups * W) = 1/W."""
    bound = (1.0 / d_conv) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init




class MambaCache:
    """Per-layer decode cache: rolling conv window + SSM state.

    Functional replacement for the reference's in-place
    ``allocate_inference_cache`` tensors (mamba_simple.py:554-573).
    """

    @staticmethod
    def init(batch: int, d_inner: int, d_conv: int, d_state: int, dtype=jnp.float32):
        return (
            jnp.zeros((batch, d_conv, d_inner), dtype),
            jnp.zeros((batch, d_inner, d_state), jnp.float32),
        )


class _ScanBranch(nn.Module):
    """One conv -> x_proj -> dt_proj -> selective-scan direction.

    Matches the fused ``mamba_inner_fn`` semantics
    (selective_scan_interface.py:292-434): the dt_proj *bias* is passed to
    the scan as delta_bias so the softplus fuses with it, and the scan's
    z-gating applies silu(z).  A_log / D / dt bias / conv weights live in
    fp32 (mamba_simple.py:151-161); activations follow ``dtype``.
    """

    d_inner: int
    d_state: int
    d_conv: int
    dt_rank: int
    dt_min: float
    dt_max: float
    dt_init: str
    dt_scale: float
    dt_init_floor: float
    conv_bias: bool
    dtype: Any
    scan_backend: str
    scan_chunk: int
    # force the reference CUDA kernel's fp32 conv-tap accumulation for
    # bf16 activations (ops/causal_conv1d.py); default keeps the measured
    # x.dtype fast path — end-to-end divergence quantified in
    # docs/DESIGN.md and tests/test_causal_conv1d.py
    conv_fp32_taps: bool = False

    @property
    def _conv_accum(self):
        return jnp.float32 if self.conv_fp32_taps else None

    def setup(self):
        self.conv_weight = self.param(
            "conv1d_weight", _conv_init(self.d_conv),
            (self.d_inner, self.d_conv), jnp.float32)
        self.conv_b = (
            self.param("conv1d_bias", _conv_init(self.d_conv),
                       (self.d_inner,), jnp.float32)
            if self.conv_bias else None)
        self.x_proj_kernel = self.param(
            "x_proj_kernel", torch_linear_init(),
            (self.d_inner, self.dt_rank + 2 * self.d_state), jnp.float32)
        self.dt_kernel = self.param(
            "dt_proj_kernel",
            _dt_proj_kernel_init(self.dt_rank, self.dt_scale, self.dt_init),
            (self.dt_rank, self.d_inner), jnp.float32)
        self.dt_bias = self.param(
            "dt_proj_bias",
            _dt_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
            (self.d_inner,), jnp.float32)
        self.A_log = self.param("A_log", _a_log_init(self.d_state),
                                (self.d_inner, self.d_state), jnp.float32)
        self.D = self.param("D", nn.initializers.ones, (self.d_inner,), jnp.float32)

    def _features(self, x_c):
        """x_proj -> (delta_wo_bias, Bv, Cv) and A, shared by every mode."""
        x_dbl = x_c @ self.x_proj_kernel.astype(self.dtype)
        dt, Bv, Cv = jnp.split(
            x_dbl, [self.dt_rank, self.dt_rank + self.d_state], axis=-1)
        delta = dt @ self.dt_kernel.astype(self.dtype)  # bias added in scan
        A = -jnp.exp(self.A_log)  # fp32
        return delta, Bv, Cv, A

    def __call__(self, x_in, z):
        """x_in, z: (B, L, d_inner) -> gated scan output (B, L, d_inner)."""
        x_c = causal_conv1d(x_in, self.conv_weight, self.conv_b,
                            activation="silu", accum_dtype=self._conv_accum)
        delta, Bv, Cv, A = self._features(x_c)
        y = selective_scan(
            x_c, delta, A, Bv, Cv, self.D, z=z,
            delta_bias=self.dt_bias, delta_softplus=True,
            backend=self.scan_backend, chunk=self.scan_chunk)
        # named so a selective remat policy (ZigMa remat_policy='scan_out')
        # can SAVE the scan output: the rematerialized forward then skips
        # re-running the scan kernel, whose VJP recomputes internally anyway
        return checkpoint_name(y, "scan_out")

    def step(self, x, z, cache):
        """Single-token decode (mamba_simple.py:492-552)."""
        conv_state, ssm_state = cache
        x_c, conv_state = causal_conv1d_update(
            x, conv_state, self.conv_weight, self.conv_b,
            accum_dtype=self._conv_accum)
        delta, Bv, Cv, A = self._features(x_c)
        y, ssm_state = selective_state_update(
            ssm_state, x_c, delta, A, Bv, Cv, self.D, z=z,
            dt_bias=self.dt_bias, dt_softplus=True)
        return y, (conv_state, ssm_state)

    def prefill(self, x_in, z):
        """Parallel-scan prefill: output for the whole prompt PLUS the decode
        cache — O(L) parallel work instead of L sequential step() calls (the
        reference replays tokens one at a time, generation.py:93-140).

        Returns (y (B, L, d_inner), (conv_state, ssm_state)).
        """
        B_ = x_in.shape[0]
        x_c = causal_conv1d(x_in, self.conv_weight, self.conv_b,
                            activation="silu",
                            accum_dtype=self._conv_accum)
        delta, Bv, Cv, A = self._features(x_c)
        y, ssm_state = selective_scan(
            x_c, delta, A, Bv, Cv, self.D, z=z,
            delta_bias=self.dt_bias, delta_softplus=True,
            return_last_state=True,
            backend=self.scan_backend, chunk=self.scan_chunk)
        # rolling conv window = last d_conv pre-conv inputs (right-aligned)
        pad = jnp.zeros((B_, self.d_conv, self.d_inner), x_in.dtype)
        conv_state = jnp.concatenate([pad, x_in], axis=1)[:, -self.d_conv:]
        return y, (conv_state, ssm_state)


class Mamba(nn.Module):
    """Selective-SSM token mixer with scan-type dispatch.

    Constructor attributes mirror the reference (mamba_simple.py:66-93).
    ``perm`` / ``perm_rev`` are this layer's static scan-path permutation (or
    None); ``video_frames``/``st`` configure the factorized video fold.
    """

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Any = "auto"
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init: str = "random"
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    conv_bias: bool = True
    bias: bool = False
    scan_type: str = "v2"
    layer_idx: Optional[int] = None
    perm: Optional[Any] = None          # np.ndarray, static
    perm_rev: Optional[Any] = None      # np.ndarray, static
    video_frames: int = 0
    st: Optional[str] = None            # 's' | 't' for video layers
    parallel_perms: Optional[tuple] = None  # parallelN: ((perm, perm_rev), ...)
    dtype: Any = jnp.float32
    scan_backend: str = "auto"
    scan_chunk: int = 128
    conv_fp32_taps: bool = False  # fp32 conv-tap accumulation (see _ScanBranch)
    out_proj_kernel_init: Optional[Any] = None  # GPT-2 residual rescale hook

    @property
    def d_inner(self) -> int:
        return int(self.expand * self.d_model)

    @property
    def dt_rank_(self) -> int:
        return math.ceil(self.d_model / 16) if self.dt_rank == "auto" else int(self.dt_rank)

    def setup(self):
        branch_cfg = dict(
            d_inner=self.d_inner, d_state=self.d_state, d_conv=self.d_conv,
            dt_rank=self.dt_rank_, dt_min=self.dt_min, dt_max=self.dt_max,
            dt_init=self.dt_init, dt_scale=self.dt_scale,
            dt_init_floor=self.dt_init_floor, conv_bias=self.conv_bias,
            dtype=self.dtype, scan_backend=self.scan_backend,
            scan_chunk=self.scan_chunk, conv_fp32_taps=self.conv_fp32_taps)
        self.in_proj = nn.Dense(2 * self.d_inner, use_bias=self.bias,
                                dtype=self.dtype, kernel_init=torch_linear_init(),
                                name="in_proj")
        self.fwd = _ScanBranch(**branch_cfg, name="scan")
        if self.scan_type == "v2":
            self.bwd = _ScanBranch(**branch_cfg, name="scan_b")
        elif self.scan_type.startswith("parallelN"):
            try:
                n = int(self.scan_type[len("parallelN"):])
            except ValueError as e:
                raise ValueError(
                    f"scan_type {self.scan_type!r} needs a branch count, "
                    f"e.g. 'parallelN4'") from e
            if self.parallel_perms is None or len(self.parallel_perms) != n:
                raise ValueError(
                    f"scan_type {self.scan_type!r} requires parallel_perms "
                    f"with {n} (perm, perm_rev) pairs, got "
                    f"{None if self.parallel_perms is None else len(self.parallel_perms)}")
            self.parallel = [
                _ScanBranch(**branch_cfg, name=f"scan_b{i}") for i in range(n)
            ]
        self.out_proj = nn.Dense(
            self.d_model, use_bias=self.bias, dtype=self.dtype,
            kernel_init=self.out_proj_kernel_init or torch_linear_init(),
            name="out_proj")

    def __call__(self, x, perm=None, perm_rev=None):
        """x: (B, L, d_model) -> (B, L, d_model).

        perm/perm_rev override the static module attributes — used by the
        scan-over-layers path, where each layer's permutation arrives as a
        traced row of a stacked (depth, L) table.
        """
        B_, L, _ = x.shape
        if perm is None:
            perm = self.perm
        if perm_rev is None:
            perm_rev = self.perm_rev

        # ---- factorized video fold (mamba_simple.py:396-442) -------------
        video = self.scan_type.startswith(("video_", "zzvideo_"))
        if video:
            if self.st not in ("s", "t"):
                raise ValueError(
                    f"video scan_type {self.scan_type!r} requires st='s' or "
                    f"'t' per layer, got {self.st!r} (video models need the "
                    f"per-layer python path, not scan-over-layers)")
            T = self.video_frames
            K = L // T
            if self.st == "s":      # (b, (t k), d) -> ((b t), k, d)
                x = x.reshape(B_ * T, K, self.d_model)
            else:                   # 't': (b, (t k), d) -> ((b k), t, d)
                x = x.reshape(B_, T, K, self.d_model)
                x = jnp.moveaxis(x, 2, 1).reshape(B_ * K, T, self.d_model)

        # ---- scan-path permutation (gather, fused under jit; bwd is the
        # inverse gather via permute_tokens, never a scatter) --------------
        if (perm is None) != (perm_rev is None):
            raise ValueError("perm and its inverse perm_rev must be given "
                             "together (the scan paths always come as "
                             "(perm, perm_rev) pairs)")
        if perm is not None:
            x = permute_tokens(
                x, jnp.asarray(perm, jnp.int32),
                jnp.asarray(vjp_inverse(perm, perm_rev, not video), jnp.int32))

        xz = self.in_proj(x)
        x_in, z = jnp.split(xz, 2, axis=-1)

        if self.scan_type == "v2":
            y = self.fwd(x_in, z)
            y_b = self.bwd(jnp.flip(x_in, axis=1), jnp.flip(z, axis=1))
            y = y + jnp.flip(y_b, axis=1)
        elif self.scan_type.startswith("parallelN"):
            y = self.fwd(x_in, z)
            for br, (p, pr) in zip(self.parallel, self.parallel_perms):
                p = jnp.asarray(p, jnp.int32)
                pr = jnp.asarray(pr, jnp.int32)
                yi = br(permute_tokens(x_in, p, pr), permute_tokens(z, p, pr))
                y = y + permute_tokens(yi, pr, p)
        else:  # v1 / zigzagN / hilbertN / randomN / video_* — single scan
            y = self.fwd(x_in, z)

        out = self.out_proj(y)

        if perm_rev is not None:
            out = permute_tokens(
                out, jnp.asarray(perm_rev, jnp.int32),
                jnp.asarray(vjp_inverse(perm_rev, perm, not video), jnp.int32))

        if video:
            T = self.video_frames
            if self.st == "s":      # ((b t), k, d) -> (b, (t k), d)
                out = out.reshape(B_, L, self.d_model)
            else:
                K = L // T
                out = out.reshape(B_, K, T, self.d_model)
                out = jnp.moveaxis(out, 2, 1).reshape(B_, L, self.d_model)
        return out

    def step(self, x, cache):
        """One decode token.  x: (B, 1, d_model); cache from MambaCache.init.

        Like the reference's ``Mamba.step`` this is direction-less (the v2 /
        permuted paths are train/prefill-time constructs).
        Returns (out (B, 1, d_model), new_cache).
        """
        xz = self.in_proj(x[:, 0])
        x_in, z = jnp.split(xz, 2, axis=-1)
        y, cache = self.fwd.step(x_in, z, cache)
        return self.out_proj(y)[:, None], cache

    def prefill(self, x):
        """Parallel prompt processing: (out (B, L, d_model), decode cache).

        One O(L)-parallel scan instead of L sequential ``step`` calls
        (the reference replays tokens one by one, generation.py:93-140).
        Like ``step``, defined only for the direction-less v1 scan (decode
        is an LM construct; v2/permuted scans have no causal decode order).
        """
        if self.scan_type != "v1":
            raise ValueError(
                f"prefill/decode requires scan_type='v1', got "
                f"{self.scan_type!r}: bidirectional or permuted scans have "
                f"no causal decode semantics")
        xz = self.in_proj(x)
        x_in, z = jnp.split(xz, 2, axis=-1)
        y, cache = self.fwd.prefill(x_in, z)
        return self.out_proj(y), cache
