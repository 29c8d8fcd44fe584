"""ZigMa denoiser: DiT-style adaLN blocks with Mamba zigzag-scan mixers.

TPU-native rebuild of the reference model (reference: model_zigma.py:544-1137).

Structure per block (model_zigma.py:340-460):

    x, residual = add_norm(x, residual, prenorm)          # fused by XLA
    shift, scale, gate[, shift_msa, scale_msa, gate_msa] = adaLN(c)
    x = x + gate * Mamba(modulate(x, shift, scale))
    x = x + gate_msa * CrossAttn(modulate(LN(x), ...), text)   # if has_text

then a final add-norm + FinalLayer linear -> unpatchify.

Reference quirks intentionally handled differently (SURVEY.md §7.4):
- ``use_pe=3`` per-layer position tables are real (registered) parameters
  here; the reference aliases one unregistered tensor across layers
  (model_zigma.py:644-651).
- ``parallelN`` forward is implemented (the reference allocates its params
  but raises NotImplementedError, mamba_simple.py:443-444).
- ``zzvideo_*`` and ``video_*`` are one consistent factorized-scan path
  (the reference mixes both names, SURVEY.md §3.2).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from zigma_tpu.models.embedders import (
    LabelEmbedder,
    PatchEmbed,
    TimestepEmbedder,
    get_2d_sincos_pos_embed,
)
from zigma_tpu.models.inits import rescaled_linear_init, torch_linear_init
from zigma_tpu.models.mamba import Mamba
from zigma_tpu.models.mamba2 import Mamba2
from zigma_tpu.ops.norms import add_norm, layer_norm
from zigma_tpu.ops.paths import build_layer_paths, parallel_scan_perms

__all__ = ["ZigMa", "ZigMaBlock", "CrossAttention", "FinalLayer", "zigma_model",
           "ZIGMA_PRESETS"]


def modulate(x, shift, scale):
    """adaLN modulation (model_zigma.py:52-54)."""
    return x * (1 + scale[:, None]) + shift[:, None]




class CrossAttention(nn.Module):
    """Cross-attention to text tokens (model_zigma.py:93-136).

    Uses XLA's fused dot-product attention; O(L * 77), never the hot path.
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        if (self.context_dim is not None
                and context.shape[-1] != self.context_dim):
            raise ValueError(
                f"CrossAttention got context with feature dim "
                f"{context.shape[-1]}, expected context_dim="
                f"{self.context_dim}")
        inner = self.heads * self.dim_head
        ti = torch_linear_init()
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     kernel_init=ti, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     kernel_init=ti, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     kernel_init=ti, name="to_v")(context)
        B, L, _ = q.shape
        S = k.shape[1]
        q = q.reshape(B, L, self.heads, self.dim_head)
        k = k.reshape(B, S, self.heads, self.dim_head)
        v = v.reshape(B, S, self.heads, self.dim_head)
        o = jax.nn.dot_product_attention(q, k, v)
        o = o.reshape(B, L, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype,
                        kernel_init=ti, name="to_out")(o)


class FinalLayer(nn.Module):
    """Final LayerNorm (no affine) + linear to patch pixels
    (model_zigma.py:313-337).  The optional conditioned variant (cond adaLN,
    zero-init) is included for capability parity though unused by ZigMa."""

    patch_size: int
    out_channels: int
    cond: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c=None):
        h = layer_norm(x, eps=1e-6)
        if self.cond and c is not None:
            mod = nn.Dense(2 * x.shape[-1], dtype=self.dtype,
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           name="adaLN")(nn.silu(c))
            shift, scale = jnp.split(mod, 2, axis=-1)
            h = modulate(h, shift, scale)
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            dtype=self.dtype, kernel_init=torch_linear_init(), name="linear",
        )(h)


def drop_path(x, rate, rng, scale_by_keep: bool = True):
    """Stochastic depth: zero a sample's contribution with prob ``rate``
    (model_zigma.py:139-175).  Caller gates on training."""
    keep = 1.0 - rate  # may be traced (per-layer rates ride the layer scan)
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    x = jnp.where(mask, x, jnp.zeros((), x.dtype))
    if scale_by_keep:
        # stay in x.dtype: an f32 scalar would promote bf16 activations and
        # break the layer-scan carry dtype
        x = x / jnp.maximum(keep, 1e-6).astype(x.dtype)
    return x


class ZigMaBlock(nn.Module):
    """adaLN Mamba block with the prenorm-residual contract
    (model_zigma.py:340-460)."""

    dim: int
    mixer_cfg: dict
    has_text: bool = False
    rms_norm: bool = True
    norm_epsilon: float = 1e-5
    residual_in_fp32: bool = True
    n_layer: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual, c, text=None, perm=None, perm_rev=None,
                 drop_path_rate=None):
        if drop_path_rate is not None:
            # stochastic depth on the residual-stream contribution
            # (model_zigma.py:415-438: drop_path(x) enters the fused add)
            x = drop_path(x, drop_path_rate, self.make_rng("dropout"))
        norm_w = self.param("norm_weight", nn.initializers.ones, (self.dim,),
                            jnp.float32)
        norm_b = (None if self.rms_norm else
                  self.param("norm_bias", nn.initializers.zeros, (self.dim,),
                             jnp.float32))
        x, residual = add_norm(
            x, norm_w, norm_b, residual,
            kind="rms" if self.rms_norm else "layer",
            eps=self.norm_epsilon, prenorm=True,
            residual_in_fp32=self.residual_in_fp32,
        )

        n_mod = 6 if self.has_text else 3
        mod = nn.Dense(n_mod * self.dim, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       name="adaLN")(nn.silu(c))
        parts = jnp.split(mod, n_mod, axis=-1)

        # ssm_version 2 swaps the Mamba-1 selective scan for the Mamba-2
        # SSD recurrence (models/mamba2.py — MXU-resident, beyond
        # reference parity); the scan-type/permutation dispatch surface
        # is identical between the two mixers
        m_cfg = dict(self.mixer_cfg)
        mixer_cls = {1: Mamba, 2: Mamba2}[int(m_cfg.pop("ssm_version", 1))]
        mixer = mixer_cls(
            d_model=self.dim, dtype=self.dtype,
            out_proj_kernel_init=rescaled_linear_init(self.n_layer),
            name="mixer", **m_cfg)
        x = x + parts[2][:, None] * mixer(
            modulate(x, parts[0], parts[1]), perm=perm, perm_rev=perm_rev)

        if self.has_text:
            h = layer_norm(x, eps=1e-6)  # norm_msa: no affine
            attn = CrossAttention(query_dim=self.dim, context_dim=self.dim,
                                  dtype=self.dtype, name="msa")
            x = x + parts[5][:, None] * attn(
                modulate(h, parts[3], parts[4]), text)
        return x, residual



def _remat_policy(name):
    """Map ZigMa.remat_policy strings onto jax checkpoint policies."""
    import jax.ad_checkpoint as adc

    if name is None:
        return None
    policies = {
        "scan_out": adc.checkpoint_policies.save_only_these_names(
            "scan_out"),
        "dots": adc.checkpoint_policies.dots_saveable,
        "scan_out+dots": adc.checkpoint_policies.save_from_both_policies(
            adc.checkpoint_policies.save_only_these_names("scan_out"),
            adc.checkpoint_policies.dots_saveable),
    }
    if name not in policies:
        raise ValueError(f"unknown remat_policy {name!r}; "
                         f"one of {sorted(policies)} or None")
    return policies[name]

class ZigMa(nn.Module):
    """The full denoiser.  Forward signature matches the reference:
    ``model(x, t, y)`` with x (B, C, H, W) images or (B, T, C, H, W) video
    latents, t (B,) in [0, 1], y optional labels (B,) / text features
    (B, n_ctx, d_context)  (model_zigma.py:911-989)."""

    in_channels: int
    embed_dim: int
    depth: int
    img_dim: int
    patch_size: int = 1
    has_text: bool = False
    num_classes: int = -1
    # CFG label drop rate (reference hardcodes 0.0 alongside its vestigial
    # forward_with_cfg, model_zigma.py:672; >0 allocates the null-class row
    # that makes class-conditional CFG trainable here)
    class_dropout_prob: float = 0.0
    d_context: int = 0
    n_context_token: int = 0
    norm_epsilon: float = 1e-5
    rms_norm: bool = True
    residual_in_fp32: bool = True
    drop_path_rate: float = 0.1  # stochastic depth (model_zigma.py:552,676)
    scan_type: str = "v2"
    video_frames: int = 0
    tpe: bool = False
    use_pe: int = 0
    use_checkpoint: bool = False
    # selective rematerialization (only with use_checkpoint):
    #   None        -> full-block remat (the reference's torch.utils.checkpoint
    #                  semantics, model_zigma.py:953-955)
    #   'scan_out'  -> save the named selective-scan outputs; the backward's
    #                  rematerialized forward skips re-running the scan kernel
    #                  (~50 MB/layer bf16 at the flagship shape)
    #   'dots'      -> save matmul results (jax dots_saveable)
    #   'scan_out+dots' -> both
    remat_policy: Optional[str] = None
    ssm_cfg: Optional[dict] = None
    path_seed: int = 0
    dtype: Any = jnp.float32
    scan_backend: str = "auto"
    scan_chunk: int = 128
    # scan-over-layers: the block body appears ONCE in the compiled program
    # (24x smaller HLO / faster compiles for the flagship); per-layer
    # permutations become rows of a stacked (depth, L) gather table.  None =
    # auto (on for uniform image stacks; off for video / per-layer-PE /
    # parallelN, which need per-layer structure).  Param layout differs
    # (stacked 'blocks' vs 'blocks_{i}'); the converter handles both.
    scan_layers: Optional[bool] = None

    @property
    def num_patches(self) -> int:
        return (self.img_dim // self.patch_size) ** 2

    @property
    def effective_scan_layers(self) -> bool:
        """Resolved scan-over-layers decision (also used by the checkpoint
        converter to pick the matching param layout).  Auto: on for uniform
        image stacks deep enough for the compile-size win to matter."""
        if self.scan_layers is not None:
            return self.scan_layers
        uniform = (not self.scan_type.startswith(("video_", "zzvideo_",
                                                  "parallelN"))
                   and self.use_pe != 3)
        return uniform and self.depth >= 8

    def _layer_paths(self):
        patch_side = self.img_dim // self.patch_size
        return build_layer_paths(
            self.scan_type, self.depth, patch_side,
            video_frames=self.video_frames, seed=self.path_seed)

    @nn.nowrap
    def _scan_block_kwargs(self) -> dict:
        """Constructor kwargs for the uniform ZigMaBlock used by the
        scan-over-layers branch (one block definition, per-layer params
        stacked on axis 0 under ``params['params']['blocks']``).  Shared
        with ``parallel.pipeline``, whose per-stage apply must match this
        param layout exactly."""
        parallel_perms = None
        if self.scan_type.startswith("parallelN"):
            parallel_perms = parallel_scan_perms(
                self.scan_type, self.img_dim // self.patch_size)
        mixer_cfg = dict(
            scan_type=self.scan_type,
            video_frames=self.video_frames, st=None,
            parallel_perms=parallel_perms,
            scan_backend=self.scan_backend, scan_chunk=self.scan_chunk,
            **(self.ssm_cfg or {}))
        return dict(
            mixer_cfg=mixer_cfg,
            dim=self.embed_dim, has_text=self.has_text,
            rms_norm=self.rms_norm, norm_epsilon=self.norm_epsilon,
            residual_in_fp32=self.residual_in_fp32, n_layer=self.depth,
            dtype=self.dtype)

    @nn.nowrap
    def scan_block_def(self) -> "ZigMaBlock":
        """Unbound block module matching the stacked scan-over-layers
        param layout — the per-stage workhorse for pipeline parallelism
        (``parallel.pipeline.zigma_pipelined_apply``)."""
        return ZigMaBlock(**self._scan_block_kwargs())

    @nn.compact
    def __call__(self, x, t, y=None, train: bool = False,
                 _stage: str = "all", _blocks_in=None):
        # _stage/_blocks_in: pipeline-parallel seams (parallel/pipeline.py).
        # "prepare" stops before the block stack and returns its inputs;
        # "finalize" takes the stack's outputs and runs the head.  "all"
        # (every other caller) is the full reference forward.
        if _stage == "finalize":
            h, residual = _blocks_in
            return self._finalize(
                h, residual, use_dp=train and self.drop_path_rate > 0)
        B = x.shape[0]
        h = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype,
                       name="x_embedder")(x)
        _, L, _ = h.shape

        t_emb = TimestepEmbedder(self.embed_dim, dtype=self.dtype,
                                 name="t_embedder")(
            (t * 1000.0).astype(jnp.float32))
        if self.has_text:
            y_emb = nn.Dense(self.embed_dim, dtype=self.dtype,
                             kernel_init=torch_linear_init(),
                             name="y_embedder")(y)
            c = t_emb + jnp.mean(y_emb, axis=1)
        elif self.num_classes > 0:
            c = t_emb + LabelEmbedder(self.num_classes, self.embed_dim,
                                      dropout_prob=self.class_dropout_prob,
                                      name="y_embedder")(y, train=train)
        else:
            c = t_emb

        n_pe = self.num_patches * max(self.video_frames, 1)
        if self.use_pe == 1:
            pe = get_2d_sincos_pos_embed(
                self.embed_dim, int(self.num_patches ** 0.5))
            if self.video_frames > 0:
                pe = np.tile(pe, (self.video_frames, 1))
            h = h + jnp.asarray(pe, self.dtype)[None]
        elif self.use_pe == 2:
            pe = self.param("pos_embed", nn.initializers.zeros,
                            (1, n_pe, self.embed_dim), jnp.float32)
            h = h + pe.astype(self.dtype)

        if self.video_frames > 0 and self.tpe:
            tpe = self.param("temporal_pos_embedding", nn.initializers.zeros,
                             (1, self.video_frames, self.embed_dim), jnp.float32)
            h = (h.reshape(B, self.video_frames, -1, self.embed_dim)
                 + tpe.astype(self.dtype)[:, :, None]).reshape(B, L, self.embed_dim)

        if _stage == "prepare":
            res0 = jnp.zeros(
                h.shape, jnp.float32 if self.residual_in_fp32 else h.dtype)
            return h, res0, c, (y_emb if self.has_text else None)

        paths, paths_rev, st_order = self._layer_paths()
        parallel_perms = None
        if self.scan_type.startswith("parallelN"):
            parallel_perms = parallel_scan_perms(
                self.scan_type, self.img_dim // self.patch_size)

        scan_layers = self.effective_scan_layers

        text = y_emb if self.has_text else None
        block_kw = dict(
            dim=self.embed_dim, has_text=self.has_text,
            rms_norm=self.rms_norm, norm_epsilon=self.norm_epsilon,
            residual_in_fp32=self.residual_in_fp32, n_layer=self.depth,
            dtype=self.dtype)

        # stochastic depth schedule (model_zigma.py:676-681): block 0 gets
        # 0.0, block i gets linspace(0, rate, depth)[i-1]; active only in
        # training
        use_dp = train and self.drop_path_rate > 0
        inter_dpr = np.concatenate(
            [[0.0], np.linspace(0, self.drop_path_rate, self.depth)])[
                :self.depth]

        if scan_layers:
            has_perms = paths[0] is not None
            # use_pe=3 (per-layer PEs, real params here unlike the
            # reference's unregistered aliases, model_zigma.py:644-651):
            # one stacked (depth, 1, n_pe, D) param sliced per scan step
            pe_layers = None
            if self.use_pe == 3:
                pe_layers = self.param(
                    "pos_embed_layers", nn.initializers.zeros,
                    (self.depth, 1, n_pe, self.embed_dim), jnp.float32)

            def body(block, carry, scanned):
                h, residual = carry
                pe_i = None
                if pe_layers is not None:
                    pe_i, scanned = scanned[0], scanned[1:]
                if use_dp:
                    perm, perm_rev, dpr = scanned
                else:
                    perm, perm_rev = scanned
                    dpr = None
                if not has_perms:
                    perm = perm_rev = None
                if pe_i is not None:
                    h = h + pe_i.astype(h.dtype)
                h, residual = block(h, residual, c, text, perm, perm_rev,
                                    dpr)
                return (h, residual), None

            block_cls = ZigMaBlock
            if self.use_checkpoint:
                block_cls = nn.remat(ZigMaBlock, static_argnums=(),
                                     policy=_remat_policy(self.remat_policy))
            scanned_blocks = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=0,
                length=self.depth,
            )
            if has_perms:
                xs = (jnp.asarray(np.stack(paths), jnp.int32),
                      jnp.asarray(np.stack(paths_rev), jnp.int32))
            else:  # v1/v2: no permutation; dummy per-layer input
                xs = (jnp.zeros((self.depth, 0), jnp.int32),) * 2
            if use_dp:
                xs = xs + (jnp.asarray(inter_dpr, jnp.float32),)
            if pe_layers is not None:
                xs = (pe_layers,) + xs
            block = block_cls(**self._scan_block_kwargs(), name="blocks")
            # residual=0 (not None): the scan carry structure must be fixed;
            # add_norm(x, ..., residual=0) == add_norm(x, ..., None)
            res0 = jnp.zeros(
                h.shape,
                jnp.float32 if self.residual_in_fp32 else h.dtype)
            (h, residual), _ = scanned_blocks(block, (h, res0), xs)
        else:
            block_cls = ZigMaBlock
            if self.use_checkpoint:
                block_cls = nn.remat(ZigMaBlock, static_argnums=(),
                                     policy=_remat_policy(self.remat_policy))

            residual = None
            for i in range(self.depth):
                if self.use_pe == 3:
                    pe_i = self.param(f"pos_embed_{i}", nn.initializers.zeros,
                                      (1, n_pe, self.embed_dim), jnp.float32)
                    h = h + pe_i.astype(self.dtype)
                mixer_cfg = dict(
                    scan_type=self.scan_type, layer_idx=i,
                    perm=paths[i], perm_rev=paths_rev[i],
                    video_frames=self.video_frames,
                    st=st_order[i] if st_order is not None else None,
                    parallel_perms=parallel_perms,
                    scan_backend=self.scan_backend, scan_chunk=self.scan_chunk,
                    **(self.ssm_cfg or {}))
                h, residual = block_cls(
                    mixer_cfg=mixer_cfg, **block_kw,
                    name=f"blocks_{i}")(
                        h, residual, c, text, None, None,
                        float(inter_dpr[i]) if use_dp else None)

        return self._finalize(h, residual, use_dp)

    def _finalize(self, h, residual, use_dp: bool):
        """Final add-norm (prenorm=False) + head (model_zigma.py:963-988);
        the reference also drop-paths the last hidden state here.  Called
        from ``__call__`` (so param creation stays inside the compact
        context) — directly at the end of the full forward, or via
        ``_stage="finalize"`` after a pipeline-parallel block stack."""
        if use_dp:
            h = drop_path(h, self.drop_path_rate, self.make_rng("dropout"))
        normf_w = self.param("norm_f_weight", nn.initializers.ones,
                             (self.embed_dim,), jnp.float32)
        normf_b = (None if self.rms_norm else
                   self.param("norm_f_bias", nn.initializers.zeros,
                              (self.embed_dim,), jnp.float32))
        h = add_norm(h, normf_w, normf_b, residual,
                     kind="rms" if self.rms_norm else "layer",
                     eps=self.norm_epsilon, prenorm=False,
                     residual_in_fp32=self.residual_in_fp32)
        h = FinalLayer(self.patch_size, self.in_channels, dtype=self.dtype,
                       name="final_layer")(h)
        if self.video_frames > 0:
            return self._unpatchify_video(h)
        return self._unpatchify(h)

    def forward_with_cfg(self, x, t, y, cfg_scale: float, y_null=None,
                         cfg_channels: Optional[int] = None):
        """Classifier-free guidance forward.

        The reference's version is vestigial (raises NotImplementedError,
        model_zigma.py:992-993); this implements the standard batched
        cond/uncond formulation its dead code sketched, including the
        DiT-style option of guiding only the first ``cfg_channels`` channels
        (model_zigma.py:1000-1010 applies it to 3 of 4).

        y_null: unconditional conditioning.  Defaults: the null-class label
        (index num_classes) for class models, zeros for feature
        conditioning.
        """
        if y_null is None:
            if self.num_classes > 0 and jnp.issubdtype(y.dtype, jnp.integer):
                if self.class_dropout_prob <= 0:
                    # same trap LabelEmbedder.force_drop_ids guards: with no
                    # null row in the table, index num_classes would silently
                    # clamp onto the last real class
                    raise ValueError(
                        "forward_with_cfg needs a null-class embedding row: "
                        "the model was built with class_dropout_prob <= 0, "
                        "so label index num_classes does not exist; pass "
                        "y_null explicitly or train with dropout_prob > 0")
                y_null = jnp.full_like(y, self.num_classes)
            else:
                y_null = jnp.zeros_like(y)
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        y2 = jnp.concatenate([y, y_null], axis=0)
        out = self(x2, t2, y2)
        cond, uncond = jnp.split(out, 2, axis=0)
        guided = uncond + cfg_scale * (cond - uncond)
        # channel axis is -3 for both image (B, C, H, W) and video
        # (B, T, C, H, W) outputs
        if cfg_channels is not None and cfg_channels < out.shape[-3]:
            guided = jnp.concatenate(
                [jnp.take(guided, jnp.arange(cfg_channels), axis=-3),
                 jnp.take(cond, jnp.arange(cfg_channels, out.shape[-3]),
                          axis=-3)], axis=-3)
        return guided

    def _unpatchify(self, x):
        """(B, L, p*p*C) -> (B, C, H, W)  (model_zigma.py:874-887)."""
        c, p = self.in_channels, self.patch_size
        hw = int(x.shape[1] ** 0.5)
        x = x.reshape(x.shape[0], hw, hw, p, p, c)
        x = jnp.einsum("nhwpqc->nchpwq", x)
        return x.reshape(x.shape[0], c, hw * p, hw * p)

    def _unpatchify_video(self, x):
        """(B, T*L, p*p*C) -> (B, T, C, H, W)  (model_zigma.py:889-902)."""
        c, p, T = self.in_channels, self.patch_size, self.video_frames
        hw = int((x.shape[1] // T) ** 0.5)
        x = x.reshape(x.shape[0], T, hw, hw, p, p, c)
        x = jnp.einsum("nthwpqc->ntchpwq", x)
        return x.reshape(x.shape[0], T, c, hw * p, hw * p)


# ---------------------------------------------------------------------------
# Size presets (model_zigma.py:1070-1137)
# ---------------------------------------------------------------------------

ZIGMA_PRESETS = {
    "zigma_s_1": dict(patch_size=1, embed_dim=368, depth=24),
    "zigma_s_2": dict(patch_size=2, embed_dim=368, depth=24),
    "zigma_s_4": dict(patch_size=4, embed_dim=368, depth=24),
    "zigma_b_1": dict(patch_size=1, embed_dim=768, depth=24),
    "zigma_b_2": dict(patch_size=2, embed_dim=768, depth=24),
    "zigma_b_4": dict(patch_size=4, embed_dim=768, depth=24),
    "zigma_m_2": dict(patch_size=2, embed_dim=768, depth=48),
    "zigma_m_4": dict(patch_size=4, embed_dim=768, depth=48),
    "zigma_l_1": dict(patch_size=1, embed_dim=1024, depth=48),
    "zigma_l_2": dict(patch_size=2, embed_dim=1024, depth=48),
    "zigma_l_4": dict(patch_size=4, embed_dim=1024, depth=48),
    "zigma_h_1": dict(patch_size=1, embed_dim=1536, depth=48),
    "zigma_h_2": dict(patch_size=2, embed_dim=1536, depth=48),
    "zigma_h_4": dict(patch_size=4, embed_dim=1536, depth=48),
}


def zigma_model(preset: str, **kwargs) -> ZigMa:
    """Build a ZigMa from a size preset, e.g. ``zigma_model("zigma_b_1", ...)``."""
    cfg = dict(ZIGMA_PRESETS[preset])
    cfg.update(kwargs)
    return ZigMa(**cfg)


def zigma_flops(batch: int, seq: int, embed_dim: int, depth: int,
                d_state: int = 16, expand: int = 2,
                bidirectional: bool = False) -> int:
    """Analytic FLOPs of the Mamba stack: GEMMs + the reference's scan rule
    9*B*L*D*N (model_zigma.py:1140-1170)."""
    d_inner = expand * embed_dim
    dt_rank = math.ceil(embed_dim / 16)
    ndir = 2 if bidirectional else 1
    per_layer = 0
    per_layer += 2 * batch * seq * embed_dim * 2 * d_inner            # in_proj
    per_layer += ndir * 2 * batch * seq * d_inner * (dt_rank + 2 * d_state)  # x_proj
    per_layer += ndir * 2 * batch * seq * dt_rank * d_inner           # dt_proj
    per_layer += ndir * 9 * batch * seq * d_inner * d_state           # scan
    per_layer += 2 * batch * seq * d_inner * embed_dim                # out_proj
    return per_layer * depth
