"""Inference-time parameter casting.

Flax keeps master params in fp32 and casts them to the module compute
dtype at every use site (``nn.Dense(dtype=...)``, ``.astype(self.dtype)``
in the mixer).  Under ``jit`` with scan-over-layers those casts are real
HBM work repeated every call: the stacked (depth, 768, 3072) in_proj /
(depth, 768, 2304) adaLN converts alone measured ~1 ms per flagship
forward on v5e.  For sampling/serving the cast can be hoisted: convert
the weight tree ONCE at load time and the in-graph converts become
no-ops.

``cast_params_for_inference`` casts exactly the leaves whose use sites
consume them in the compute dtype, and keeps fp32 the leaves the scan
path consumes in fp32 (the reference keeps the same split on CUDA:
A_log/D/dt_bias stay fp32 next to its fp16/bf16 GEMM weights,
mamba_simple.py parameter dtypes):

  * ``A_log``     — A = -exp(A_log) is computed in fp32 inside the kernel
  * ``D``         — the fp32 skip coefficient in (y + u*D)
  * ``dt_proj_bias`` — added to delta in fp32 before softplus
  * norm scales/biases — ``add_norm`` upcasts to fp32; keeping the param
    fp32 preserves the residual_in_fp32 contract bit-for-bit
  * positional embeddings — added onto the (possibly fp32) stream
  * embedder subtrees (timestep/label/patch/text) — feed the fp32
    conditioning path; they are tiny, so the per-call convert is free

This is a pure hoist for every cast leaf: the forward computes the exact
same bf16 values with pre-cast params as with fp32 params (the in-graph
``convert`` produced the same bf16 numbers every call).

The classifier is an EXHAUSTIVE rule table, not a substring match: every
fp32 leaf must land on a known-keep or known-cast rule, and an
unrecognized name raises instead of being silently cast (a silently
mis-cast fp32-contract leaf would break the bitwise tests only for the
variant that owns it — fail closed instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cast_params_for_inference"]

# Modules whose whole subtree feeds the fp32 conditioning path.
_KEEP_MODULES = frozenset({"t_embedder", "y_embedder", "x_embedder"})

# fp32-contract leaves by exact name ("dt_bias" is the Mamba-2 SSD
# branch's delta bias, models/mamba2.py — same fp32 contract as Mamba-1's
# "dt_proj_bias").
_KEEP_LEAF = frozenset({"A_log", "D", "dt_proj_bias", "dt_bias",
                        "temporal_pos_embedding", "embedding"})

# fp32-contract leaves by prefix: pos_embed / pos_embed_<i> (use_pe=3
# allocates one per layer) and every norm scale/bias
# (norm_weight, norm_bias, norm_f_weight, norm_f_bias, norm_msa_*).
_KEEP_LEAF_PREFIX = ("pos_embed", "norm")

# leaf names a norm SUBMODULE may own (flax LayerNorm/RMSNorm use
# scale/bias; torch-style converters use weight/bias).  The norm-prefixed
# path-component keep rule below applies only to these — any other leaf
# under a norm-prefixed module raises instead of being silently kept
# (a module merely NAMED "norm_mlp" holding GEMM kernels must not skip
# the inference cast).
_NORM_MODULE_LEAVES = frozenset({"scale", "bias", "weight"})

# compute-dtype scan-branch leaves by exact name.
_CAST_LEAF = frozenset({"conv1d_weight", "conv1d_bias",
                        "x_proj_kernel", "dt_proj_kernel"})

# generic Dense/conv leaves; every remaining module that owns these
# (adaLN, mixer in/out_proj, msa to_q/k/v/out, final_layer.linear)
# consumes them in the compute dtype.
_CAST_GENERIC = frozenset({"kernel", "bias"})


def _classify(path_names, leaf_name):
    """-> "keep" | "cast"; raises on an unrecognized fp32 leaf."""
    if any(n in _KEEP_MODULES for n in path_names):
        return "keep"
    # keep rules by LEAF name (A_log, D, pos_embed*, norm_weight, ...)
    if (leaf_name in _KEEP_LEAF
            or any(leaf_name.startswith(p) for p in _KEEP_LEAF_PREFIX)):
        return "keep"
    # a norm implemented as a SUBMODULE (e.g. ".../norm/bias") must keep
    # its generically-named leaves fp32 — otherwise the generic
    # kernel/bias cast rule below would silently violate the fp32 norm
    # contract.  This path-component rule is restricted to norm-prefixed
    # modules holding norm-style leaves; anything else under such a
    # module fails closed (ADVICE r3: a module merely named "norm_mlp"
    # must not silently skip the cast for its GEMM weights).
    if any(n.startswith("norm") for n in path_names[:-1]):
        if leaf_name in _NORM_MODULE_LEAVES:
            return "keep"
        raise ValueError(
            f"cast_params_for_inference: leaf {'/'.join(path_names)!r} "
            f"sits under a norm-prefixed module but is not a norm-style "
            f"leaf ({sorted(_NORM_MODULE_LEAVES)}) — classify it "
            f"explicitly in the rule table")
    if leaf_name in _CAST_LEAF or leaf_name in _CAST_GENERIC:
        return "cast"
    raise ValueError(
        f"cast_params_for_inference: unrecognized fp32 param leaf "
        f"{'/'.join(path_names)!r} — add it to the keep/cast rule table "
        f"in zigma_tpu/utils/inference.py (failing closed instead of "
        f"guessing its dtype contract)")


def cast_params_for_inference(params, dtype=jnp.bfloat16):
    """Pre-cast float32 weight leaves to ``dtype`` for inference.

    Leaves the scan path consumes in fp32 (A_log, D, dt_bias, norms,
    positional embeddings, embedder subtrees) are left untouched, so the
    result computes bit-identical outputs to the original tree for any
    model whose compute dtype is ``dtype``.  Non-float leaves and
    non-fp32 floats pass through unchanged.  Raises on an fp32 leaf the
    rule table does not know (see module docstring).
    """

    def cast(path, leaf):
        if not (hasattr(leaf, "dtype") and leaf.dtype == jnp.float32):
            return leaf
        names = [getattr(k, "key", getattr(k, "name", str(k)))
                 for k in path]
        verdict = _classify(names, names[-1] if names else "")
        return leaf.astype(dtype) if verdict == "cast" else leaf

    return jax.tree_util.tree_map_with_path(cast, params)
