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

__all__ = ["make_mesh", "shard_batch", "replicate", "zigma_param_sharding",
           "train_state_sharding", "shard_train_state"]


def make_mesh(data: int = -1, model: int = 1, pipe: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Create a ('data', 'model'[, 'pipe']) mesh.  data=-1 uses all
    remaining devices.  The 'pipe' axis (pipeline parallelism,
    parallel/pipeline.py) is innermost so stage-to-stage ppermute hops
    ride adjacent ICI links; it is only added when pipe > 1 so existing
    two-axis meshes are unchanged."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % (model * pipe) == 0, \
            f"{n} devices not divisible by model={model} x pipe={pipe}"
        data = n // (model * pipe)
    assert data * model * pipe == n, \
        f"mesh {data}x{model}x{pipe} != {n} devices"
    if pipe > 1:
        return Mesh(np.asarray(devices).reshape(data, model, pipe),
                    ("data", "model", "pipe"))
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
    # scan-branch params are scoped to the Mamba-1 branch modules
    # (scan / scan_b / scan_bN): the Mamba-2 SSD branch (ssd / ssd_b)
    # reuses some leaf NAMES at different ranks/meanings — e.g. its
    # A_log is (nheads,) or stacked (depth, nheads), where a bare
    # `.*A_log$` rule would shard the LAYER axis over 'model' (wrong
    # semantics, and a divisibility crash when depth % tp != 0).
    # Mamba-2 recurrence params simply replicate; its in/out_proj (the
    # memory/compute that matters) still shard via the generic rules.
    (r".*/scan[^/]*/x_proj_kernel$", P("model", None)),
    (r".*/scan[^/]*/dt_proj_kernel$", P(None, "model")),
    (r".*/scan[^/]*/dt_proj_bias$", P("model")),
    (r".*/scan[^/]*/conv1d_weight$", P("model", None)),
    (r".*/scan[^/]*/conv1d_bias$", P("model")),
    (r".*/scan[^/]*/A_log$", P("model", None)),
    (r".*/scan[^/]*/D$", P("model")),
    (r".*out_proj/kernel$", P("model", None)),
    # cross-attention heads over model axis
    (r".*to_[qkv]/kernel$", P(None, "model")),
    (r".*to_out/kernel$", P("model", None)),
]


def _path_name(path) -> str:
    return "/".join(p.key if hasattr(p, "key") else str(p) for p in path)


def _tp_spec(name: str, ndim: int, mesh: Mesh):
    """TP PartitionSpec for a param path, or None when no rule applies
    (also when the mesh has no model axis to shard over)."""
    if mesh.shape.get("model", 1) > 1:
        for pattern, spec in _TP_RULES:
            if re.match(pattern, name):
                extra = ndim - len(spec)
                if extra < 0:
                    # rank mismatch: the rule was written for the Mamba-1
                    # param shapes (e.g. A_log (d_inner, d_state)); a
                    # lower-rank homonym (Mamba-2's scalar-decay A_log is
                    # (nheads,)) replicates instead of crashing NamedSharding
                    return None
                if extra > 0:  # stacked scan-over-layers leading axis
                    spec = P(*([None] * extra), *spec)
                return spec
    return None


def zigma_param_sharding(params, mesh: Mesh):
    """NamedShardings for a ZigMa param tree: TP rules above, replicated
    otherwise.  With mesh model=1 everything degenerates to replication
    (pure DP = reference parity)."""

    def map_fn(path, x):
        spec = _tp_spec(_path_name(path), x.ndim, mesh)
        return NamedSharding(mesh, spec if spec is not None else P())

    return jax.tree_util.tree_map_with_path(map_fn, params)


# ---------------------------------------------------------------------------
# FSDP: ZeRO-3-style parameter/EMA/optimizer-state sharding over 'data'
# ---------------------------------------------------------------------------


def _fsdp_add_data(shape, base_spec, n: int):
    """Extend ``base_spec`` with 'data' on the largest still-unsharded dim
    divisible by the data-axis size.  Leaves with no such dim keep
    ``base_spec`` (replicated over 'data')."""
    spec = list(base_spec) + [None] * (len(shape) - len(base_spec))
    for d in sorted(range(len(shape)), key=lambda d: -shape[d]):
        if spec[d] is None and shape[d] >= n and shape[d] % n == 0:
            spec[d] = "data"
            break
    return P(*spec)


def train_state_sharding(state, mesh: Mesh, fsdp: bool = False,
                         fsdp_min_size: int = 65536):
    """NamedShardings for a FULL TrainState pytree (params, EMA params,
    optimizer moments, scalars).

    Default: TP rules for matched params (no-op at mesh model=1),
    replicated otherwise — reference-parity DDP, every chip holds the
    whole state.

    fsdp=True (beyond parity, no reference equivalent): additionally
    shard every leaf of at least ``fsdp_min_size`` elements over the
    'data' axis on its largest divisible dim — ZeRO-3 semantics.  The
    optimizer moments mirror the param tree (their tree paths end with
    the param path, so the TP regexes still match), which is where the
    memory actually is: AdamW+EMA keeps 4 fp32 copies of the model, and
    sharding them divides per-chip state memory by the data-axis size.
    XLA inserts the all-gathers (params, forward/backward) and
    reduce-scatters (grads) over ICI from the shardings alone — there is
    no wrapper class, no hand-written collective, and the train step
    function is byte-identical to the DDP one.

    With a 'pipe' axis in the mesh (pipeline parallelism), the stacked
    scan-over-layers block leaves (path containing 'blocks', leading
    depth axis) shard that axis over 'pipe' — matching the shard_map
    in_specs of parallel.pipeline, so each stage's weights, EMA, and
    moments live only on that stage.
    """
    n = mesh.shape.get("data", 1)
    n_pipe = mesh.shape.get("pipe", 1)

    def map_fn(path, x):
        name = _path_name(path)
        spec = _tp_spec(name, x.ndim, mesh)
        if spec is None:
            spec = P()
        if (n_pipe > 1 and re.search(r"(^|/)blocks($|/)", name)
                and x.ndim >= 1 and x.shape[0] % n_pipe == 0):
            rest = list(spec)[1:] if len(spec) > 0 else []
            spec = P("pipe", *rest)
        if fsdp and n > 1 and x.size >= max(int(fsdp_min_size), 1):
            spec = _fsdp_add_data(x.shape, spec, n)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(map_fn, state)


def shard_train_state(state, mesh: Mesh, fsdp: bool = False,
                      fsdp_min_size: int = 65536):
    """device_put a TrainState per ``train_state_sharding``.  With
    fsdp=False and mesh model=1 this is exactly ``replicate``."""
    sh = train_state_sharding(state, mesh, fsdp=fsdp,
                              fsdp_min_size=fsdp_min_size)
    return jax.tree.map(jax.device_put, state, sh)
