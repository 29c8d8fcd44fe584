"""Pipeline parallelism for the ZigMa block stack.

Beyond reference parity: the reference trains DDP-only via accelerate
(SURVEY.md §2.4 — no tensor, pipeline, or sequence parallelism exists
there).  On a TPU pod slice, pipelining the depth axis over a 'pipe' mesh
axis is the standard way to fit models whose layers don't fit one chip's
HBM and to scale past the data axis; this module implements it the
TPU-native way:

* **Weight-stationary GPipe schedule.**  The stacked scan-over-layers
  block params (leading ``depth`` axis, ``params['params']['blocks']``)
  are sharded over 'pipe' on axis 0 — each stage permanently owns
  ``depth / n_stages`` contiguous layers and its weights never move.
  Activations are split into ``n_microbatches`` microbatches that flow
  stage-to-stage around a ``lax.ppermute`` ring (one (b_mb, L, D)
  hidden + residual + conditioning per hop — kilobytes-to-megabytes on
  the ICI, vs gigabytes if weights moved instead).
* **Everything from shardings + collectives.**  The schedule is a single
  ``lax.scan`` over ``n_microbatches + n_stages - 1`` ticks inside one
  ``shard_map``; XLA sees static shapes and a fixed ring permutation.
  There is no scheduler thread, no send/recv framework — the fill/drain
  bubble (``(S-1)/(M+S-1)`` of ticks) is the only overhead, amortised by
  raising ``n_microbatches``.
* **Composes with data parallelism.**  Activations stay sharded over the
  'data' mesh axis inside the pipeline (the block has no cross-batch
  ops), so a ('data', 'pipe') mesh runs DP x PP with grads reduced by
  the surrounding ``jax.grad`` + sharding machinery as usual.

Differentiable end-to-end: the backward of ``ppermute`` is the reverse
ring, the backward of the tick scan replays the schedule in reverse —
exactly the hand-scheduled 1F1B-style backward, derived by AD instead of
written by hand.

No reference counterpart; closest public analogue is the pipelining
recipe in the JAX scaling playbook.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_blocks", "zigma_pipelined_apply"]


def pipeline_blocks(block, stacked_params, h, res, c, text, perms, perms_rev,
                    *, mesh: Mesh, axis_name: str = "pipe",
                    n_microbatches: Optional[int] = None,
                    data_axis: Optional[str] = "data", remat: bool = False):
    """Run a stacked uniform block stack as a GPipe pipeline over
    ``axis_name``.

    block          unbound module whose ``apply({'params': p}, h, res, c,
                   text, perm, perm_rev, dpr)`` -> (h, res) matches one
                   slice of ``stacked_params`` (``ZigMa.scan_block_def``).
    stacked_params pytree with leading ``depth`` axis on every leaf.
    h, res         (B, L, D) block-stack carry inputs.
    c              (B, D) conditioning; rotates with its microbatch.
    text           optional (B, n_ctx, D) cross-attn context, or None.
    perms, perms_rev  (depth, L) int32 per-layer permutations; pass
                   L=0 arrays when the scan type has none.
    n_microbatches defaults to the stage count (bubble ~1/2; raise it to
                   amortise — production wants M >= 4*S).
    remat          rematerialise each layer in the backward (the
                   pipeline analogue of ZigMa.use_checkpoint).

    Returns (h, res) for the full batch, replicated over 'pipe' and
    sharded over ``data_axis`` like the inputs.
    """
    S = mesh.shape[axis_name]
    depth = perms.shape[0]
    if depth % S != 0:
        raise ValueError(f"depth {depth} not divisible by pipeline "
                         f"stages {S}")
    B = h.shape[0]
    M = int(n_microbatches) if n_microbatches else S
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by n_microbatches {M}")
    n_data = mesh.shape.get(data_axis, 1) if data_axis else 1
    if (B // M) % n_data != 0:
        raise ValueError(
            f"microbatch size {B // M} (batch {B} / {M} microbatches) not "
            f"divisible by the '{data_axis}' mesh axis ({n_data} shards)")
    has_perms = perms.shape[1] > 0
    has_text = text is not None

    def to_mb(a):
        return a.reshape(M, B // M, *a.shape[1:])

    state_in = {"h": to_mb(h), "r": to_mb(res), "c": to_mb(c)}
    if has_text:
        state_in["tx"] = to_mb(text)

    # batch axis (axis 1 of the (M, b, ...) microbatch arrays) stays
    # sharded over the data axis; everything is replicated over 'pipe'
    # except the params/perms, which shard their depth axis
    dspec = (data_axis,) if data_axis and data_axis in mesh.shape else ()
    mb_spec = P(None, *dspec)
    state_specs = {k: mb_spec for k in state_in}

    # the jit matters even under an outer jit (it's inlined there): eager
    # calls of remat'd layers inside shard_map are unsupported upstream
    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis_name), state_specs, P(axis_name), P(axis_name)),
             out_specs=(mb_spec, mb_spec), check_vma=False)
    def run(local_params, mbs, perms_l, perms_rev_l):
        stage = lax.axis_index(axis_name)

        def layer(carry, sl):
            p_i, pm, pmr = sl
            hh, rr, cc, tt = carry
            hh, rr = block.apply(
                {"params": p_i}, hh, rr, cc, tt,
                pm if has_perms else None, pmr if has_perms else None, None)
            return (hh, rr, cc, tt), None

        if remat:
            layer = jax.checkpoint(layer, prevent_cse=False)

        zero = jax.tree.map(lambda a: jnp.zeros(a.shape[1:], a.dtype), mbs)
        outs0 = (jnp.zeros_like(mbs["h"]), jnp.zeros_like(mbs["r"]))

        def tick(carry, t):
            state, outs = carry
            # stage 0 ingests microbatch t during the fill+steady phase
            mb = jnp.minimum(t, M - 1)
            inj = jax.tree.map(lambda a: lax.dynamic_index_in_dim(
                a, mb, 0, keepdims=False), mbs)
            first = (stage == 0) & (t < M)
            state = jax.tree.map(
                lambda cur, new: jnp.where(first, new, cur), state, inj)
            # every stage applies its local layers to its current microbatch
            tt = state.get("tx")
            (hh, rr, _, _), _ = lax.scan(
                layer, (state["h"], state["r"], state["c"], tt),
                (local_params, perms_l, perms_rev_l))
            state = dict(state, h=hh, r=rr)
            # the last stage banks finished microbatch t-(S-1)
            oi = jnp.clip(t - (S - 1), 0, M - 1)
            write = (stage == S - 1) & (t >= S - 1)

            def put(o, s):
                cur = lax.dynamic_index_in_dim(o, oi, 0, keepdims=False)
                return lax.dynamic_update_index_in_dim(
                    o, jnp.where(write, s, cur), oi, 0)

            outs = (put(outs[0], hh), put(outs[1], rr))
            # rotate every in-flight microbatch one stage down the ring
            ring = [(i, (i + 1) % S) for i in range(S)]
            state = jax.tree.map(
                lambda a: lax.ppermute(a, axis_name, ring), state)
            return (state, outs), None

        (_, outs), _ = lax.scan(tick, (zero, outs0), jnp.arange(M + S - 1))
        # results live on the last stage only; one masked psum replicates
        # them over 'pipe' (size of a single batch's activations)
        last = stage == S - 1
        return tuple(
            lax.psum(jnp.where(last, o, jnp.zeros_like(o)), axis_name)
            for o in outs)

    h_out, r_out = run(stacked_params, state_in, perms, perms_rev)
    unmb = lambda a: a.reshape(B, *a.shape[2:])
    return unmb(h_out), unmb(r_out)


def zigma_pipelined_apply(model, params, x, t, y=None, *, mesh: Mesh,
                          axis_name: str = "pipe",
                          n_microbatches: Optional[int] = None,
                          data_axis: Optional[str] = "data",
                          train: bool = False, rngs=None,
                          remat: Optional[bool] = None):
    """Pipeline-parallel ZigMa forward: ``model.apply`` split at the
    block stack (``_stage`` seams in ``ZigMa.__call__``), the stack run
    by :func:`pipeline_blocks` over ``axis_name``.

    Numerically identical to the plain scan-over-layers forward — same
    blocks, same layer order, batch-independent math — so parity is
    exact up to reduction-order noise.

    Requires the scan-over-layers param layout (stacked 'blocks');
    per-layer-PE (use_pe=3) and stochastic depth are out of scope (the
    reference trains images with drop_path on one device; under PP pass
    drop_path_rate=0 or train=False).
    """
    if not model.effective_scan_layers:
        raise ValueError("pipeline parallelism needs the scan-over-layers "
                         "param layout; build the model with "
                         "scan_layers=True")
    if model.use_pe == 3:
        raise ValueError("use_pe=3 (per-layer PEs) is not supported under "
                         "pipeline parallelism")
    if train and model.drop_path_rate > 0:
        raise ValueError("stochastic depth is not supported under pipeline "
                         "parallelism; set drop_path_rate=0")
    if remat is None:
        remat = model.use_checkpoint

    h, res0, c, text = model.apply(params, x, t, y, train=train, rngs=rngs,
                                   _stage="prepare")
    paths, paths_rev, _ = model._layer_paths()
    if paths[0] is not None:
        perms = jnp.asarray(np.stack(paths), jnp.int32)
        perms_rev = jnp.asarray(np.stack(paths_rev), jnp.int32)
    else:
        perms = perms_rev = jnp.zeros((model.depth, 0), jnp.int32)

    h, res = pipeline_blocks(
        model.scan_block_def(), params["params"]["blocks"], h, res0, c, text,
        perms, perms_rev, mesh=mesh, axis_name=axis_name,
        n_microbatches=n_microbatches, data_axis=data_axis, remat=remat)
    return model.apply(params, x, t, y, train=train, rngs=rngs,
                       _stage="finalize", _blocks_in=(h, res))
