"""Full training-step attribution at the flagship config (round 3).

The sampling step is fully attributed (experiments/sampling_step_anatomy.py,
docs/DESIGN.md §8); this does the same for TRAINING: decompose the jitted
train step (AdamW + EMA, bf16 activations, full-block remat) into

  forward (loss only) -> +backward (value_and_grad) -> +optimizer/EMA (full)

and a depth-12 vs depth-24 slope for the per-layer cost.  Big pieces are
timed by per-call scalar sync (relay RTT ~40 ms is small vs ~400 ms steps
and is reported alongside); the small optimizer/EMA piece is timed by
in-jit chaining (k=2 vs k=8 fori_loop differential) where the RTT cancels.

Writes experiments/results/train_step_anatomy.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BS = 16


def _model(depth):
    from zigma_tpu.models import ZigMa
    return ZigMa(in_channels=4, embed_dim=768, depth=depth, img_dim=32,
                 patch_size=1, scan_type="zigzagN8", use_pe=2,
                 dtype=jnp.bfloat16, use_checkpoint=True)


def _timed_calls(fn, n=6):
    """Median-free simple mean over n synced calls (each call syncs on a
    scalar transfer); first call must already be compiled."""
    start = time.perf_counter()
    for i in range(n):
        out = fn(i)
    _ = float(out)
    return (time.perf_counter() - start) / n * 1e3


def main():
    from zigma_tpu.train import (TrainState, create_optimizer,
                                 create_train_step, make_diffusion_loss_fn)
    from zigma_tpu.transport import create_transport

    transport = create_transport("Linear", "velocity")
    optimizer = create_optimizer()
    data = {"x": jax.random.normal(jax.random.PRNGKey(1), (BS, 4, 32, 32))}
    rng = jax.random.PRNGKey(2)
    res = {"config": f"zigzag8_b1 flagship, batch {BS}, bf16, remat, AdamW+EMA"}

    # -- full step at depth 24 and 12 (slope) -------------------------------
    states = {}
    for depth in (24, 12):
        model = _model(depth)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((BS, 4, 32, 32)), jnp.zeros((BS,)))
        state = TrainState.create(params, optimizer)
        loss_fn = make_diffusion_loss_fn(model, transport)
        step_fn = create_train_step(loss_fn, optimizer)
        state, m = step_fn(state, rng, data)
        float(jax.device_get(m["loss"]))  # compile + warmup

        box = {"s": state}

        def call(i, step_fn=step_fn, box=box):
            box["s"], m = step_fn(box["s"], jax.random.fold_in(rng, i), data)
            return jax.device_get(m["loss"])

        res[f"full_step_ms_depth{depth}"] = round(_timed_calls(call), 2)
        if depth == 24:
            states[24] = (model, params, state, loss_fn)
        print(json.dumps({f"full_step_ms_depth{depth}":
                          res[f"full_step_ms_depth{depth}"]}), flush=True)

    model, params, state, loss_fn = states[24]

    # -- value_and_grad only (no optimizer/EMA) ------------------------------
    @jax.jit
    def grad_only(params, k):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, k, data)
        # consume the grads with a cheap reduction so nothing is elided
        gn = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda g: jnp.sum(jnp.abs(g[..., :1])), grads))
        return loss + 0.0 * gn

    float(grad_only(params, rng))
    res["grad_only_ms_depth24"] = round(_timed_calls(
        lambda i: grad_only(params, jax.random.fold_in(rng, i))), 2)
    print(json.dumps({"grad_only_ms": res["grad_only_ms_depth24"]}),
          flush=True)

    # -- forward (loss) only --------------------------------------------------
    fwd = jax.jit(lambda p, k: loss_fn(p, k, data))
    float(fwd(params, rng))
    res["forward_ms_depth24"] = round(_timed_calls(
        lambda i: fwd(params, jax.random.fold_in(rng, i))), 2)
    print(json.dumps({"forward_ms": res["forward_ms_depth24"]}), flush=True)

    # optimizer + EMA cost comes out of the full-vs-grad-only SUBTRACTION
    # (both pay the same per-call relay RTT, so it cancels).  An in-jit
    # fori_loop differential was tried first and measured ~0: unless the
    # scalar output consumes EVERY leaf of params/ema/opt_state, XLA
    # dead-code-eliminates the untouched per-leaf update chains (each leaf's
    # m/v/p/ema chain is independent) — a trap, not a measurement.

    d24, d12 = res["full_step_ms_depth24"], res["full_step_ms_depth12"]
    res["per_layer_ms"] = round((d24 - d12) / 12, 3)
    res["intercept_ms"] = round(d24 - 24 * res["per_layer_ms"], 2)
    res["backward_ms"] = round(res["grad_only_ms_depth24"]
                               - res["forward_ms_depth24"], 2)
    res["opt_ema_ms"] = round(d24 - res["grad_only_ms_depth24"], 2)
    res["imgs_per_sec"] = round(BS / (d24 / 1e3), 2)

    os.makedirs("experiments/results", exist_ok=True)
    with open("experiments/results/train_step_anatomy.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
