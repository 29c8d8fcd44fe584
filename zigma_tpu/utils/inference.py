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
  * embedder tables (timestep/label/patch) — feed the fp32 conditioning
    path; they are tiny, so the per-call convert is already free

This is a pure hoist for every cast leaf: the forward computes the exact
same bf16 values with pre-cast params as with fp32 params (the in-graph
``convert`` produced the same bf16 numbers every call).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cast_params_for_inference"]

# path fragments whose leaves are consumed in fp32 (see module docstring)
_KEEP_FP32 = ("A_log", "dt_proj_bias", "norm", "pos_embed",
              "temporal_pos_embedding", "embed")


def _keep_fp32(path_names, leaf_name):
    if leaf_name == "D":
        return True
    joined = "/".join(path_names)
    return any(frag in joined for frag in _KEEP_FP32)


def cast_params_for_inference(params, dtype=jnp.bfloat16):
    """Pre-cast float32 weight leaves to ``dtype`` for inference.

    Leaves the scan path consumes in fp32 (A_log, D, dt_bias, norms,
    positional embeddings, embedder tables) are left untouched, so the
    result computes bit-identical outputs to the original tree for any
    model whose compute dtype is ``dtype``.  Non-float leaves and
    non-fp32 floats pass through unchanged.
    """

    def cast(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", str(k)))
                 for k in path]
        if (hasattr(leaf, "dtype") and leaf.dtype == jnp.float32
                and not _keep_fp32(names, names[-1] if names else "")):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(cast, params)
