"""Device-mesh and sharding helpers.

The reference's only parallelism is DDP data-parallel over NCCL via HF
Accelerate (reference: train_acc.py:121-123,249; README.md:111-131).  The
TPU-native equivalent is a ``jax.sharding.Mesh`` with the batch sharded over
the ``data`` axis; XLA inserts the gradient ``psum`` over ICI automatically
when the jitted train step averages a data-sharded loss.

Beyond parity we expose an optional ``model`` (tensor-parallel) axis: ZigMa's
hot GEMMs (in_proj / x_proj / dt_proj / out_proj) are Megatron-style
column/row shardable, and the selective scan / conv are depthwise (d_inner is
embarrassingly shardable).  ``zigma_param_sharding`` encodes those rules.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "zigma_param_sharding"]


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Create a ('data', 'model') mesh.  data=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def shard_batch(batch, mesh: Mesh, axis: int = 0):
    """Place a host batch with dim ``axis`` sharded over 'data'.

    axis: which dim is the batch dim — 0 for a plain batch, 1 for the
    chained-train-step layout (leading dim = steps-per-dispatch, replicated;
    dim 1 = batch, sharded).

    Single-process: a plain sharded device_put.  Multi-process: each host's
    array is its LOCAL slice of the global batch, so assemble a global
    array (global batch = n_processes * local batch, matching DDP
    semantics) instead of letting device_put misread the local array as the
    whole global batch."""
    spec = P(*([None] * axis + ["data"]))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, spec), batch)
    sharding = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, opt state) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


# ---------------------------------------------------------------------------
# Tensor-parallel partition rules for ZigMa parameters
# ---------------------------------------------------------------------------

# (regex over '/'-joined param path, PartitionSpec factory by ndim)
# Megatron pairing: in_proj/x_proj/dt-kernel column-parallel (shard d_inner /
# the output dim), out_proj row-parallel (shard the input dim) => one psum
# per mixer, inserted automatically by XLA from these shardings.
_TP_RULES = [
    (r".*in_proj/kernel$", P(None, "model")),
    (r".*x_proj_kernel$", P("model", None)),
    (r".*dt_proj_kernel$", P(None, "model")),
    (r".*dt_proj_bias$", P("model")),
    (r".*conv1d_weight$", P("model", None)),
    (r".*conv1d_bias$", P("model")),
    (r".*A_log$", P("model", None)),
    (r".*/D$", P("model")),
    (r".*out_proj/kernel$", P("model", None)),
    # cross-attention heads over model axis
    (r".*to_[qkv]/kernel$", P(None, "model")),
    (r".*to_out/kernel$", P("model", None)),
]


def zigma_param_sharding(params, mesh: Mesh):
    """NamedShardings for a ZigMa param tree: TP rules above, replicated
    otherwise.  With mesh model=1 everything degenerates to replication
    (pure DP = reference parity)."""

    def spec_for(path, x):
        name = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path)
        if mesh.shape.get("model", 1) > 1:
            for pattern, spec in _TP_RULES:
                if re.match(pattern, name):
                    extra = x.ndim - len(spec)
                    if extra > 0:  # stacked scan-over-layers leading axis
                        spec = P(*([None] * extra), *spec)
                    return spec
        return P()

    def map_fn(path, x):
        return NamedSharding(mesh, spec_for(path, x))

    return jax.tree_util.tree_map_with_path(map_fn, params)
