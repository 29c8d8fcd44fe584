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
        # consume EVERY grad element: a sliced consumption (g[..., :1]) was
        # tried first and let XLA narrow the weight-grad einsums to the
        # consumed column, understating the backward by ~25 ms — the same
        # full reduction the real step pays via optax.global_norm
        gn = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda g: jnp.sum(jnp.abs(g.astype(jnp.float32))),
                         grads))
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

    # -- device-true step time: k steps chained IN-JIT -----------------------
    # The per-call full-step number above includes ~38 ms of relay/dispatch
    # overhead for returning the ~2.2 GB state pytree (the scalar-returning
    # measurements pay far less).  Chaining steps inside one jit removes the
    # per-step output handling entirely.  DCE trap: the scalar output must
    # consume EVERY leaf of params/ema/opt_state, otherwise XLA eliminates
    # the untouched per-leaf update chains (each leaf's m/v/p/ema chain is
    # independent) and the loop measures ~0.
    import optax
    from zigma_tpu.train.state import update_ema

    def tree_sum(t):
        return sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                   for x in jax.tree.leaves(t))

    def chain(k):
        @jax.jit
        def f(state):
            def body(i, s):
                _, grads = jax.value_and_grad(loss_fn)(
                    s.params, jax.random.fold_in(rng, i), data)
                updates, opt_state = optimizer.update(grads, s.opt_state,
                                                      s.params)
                p = optax.apply_updates(s.params, updates)
                ema = update_ema(s.ema_params, p, 0.9999)
                return s.replace(step=s.step + 1, params=p, ema_params=ema,
                                 opt_state=opt_state)
            s = jax.lax.fori_loop(0, k, body, state)
            return tree_sum(s.params) + tree_sum(s.ema_params) \
                + tree_sum(s.opt_state)
        return f

    def median3(fn, *a):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(fn(*a))
            ts.append(time.perf_counter() - t0)
        assert v == v
        ts.sort()
        return ts[1]

    f2, f8 = chain(2), chain(8)
    float(f2(state)); float(f8(state))
    t2, t8 = median3(f2, state), median3(f8, state)
    res["in_jit_step_ms_depth24"] = round((t8 - t2) / 6 * 1e3, 2)
    print(json.dumps({"in_jit_step_ms": res["in_jit_step_ms_depth24"]}),
          flush=True)

    d24, d12 = res["full_step_ms_depth24"], res["full_step_ms_depth12"]
    res["per_layer_ms"] = round((d24 - d12) / 12, 3)
    res["intercept_ms"] = round(d24 - 24 * res["per_layer_ms"], 2)
    res["backward_ms"] = round(res["grad_only_ms_depth24"]
                               - res["forward_ms_depth24"], 2)
    # full - grad_only mixes the optimizer/EMA with the EXTRA per-call
    # dispatch overhead of returning the state pytree (vs a scalar); the
    # clean optimizer cost is in_jit_step - (grad_only - scalar-RTT) and an
    # independent SGD-vs-AdamW full-step A/B measured the optimizer delta
    # at ~7 ms — see docs/DESIGN.md §8
    res["opt_ema_plus_state_return_ms"] = round(
        d24 - res["grad_only_ms_depth24"], 2)
    res["per_call_dispatch_overhead_ms"] = round(
        d24 - res["in_jit_step_ms_depth24"], 2)
    res["imgs_per_sec_per_call"] = round(BS / (d24 / 1e3), 2)
    res["imgs_per_sec_in_jit"] = round(
        BS / (res["in_jit_step_ms_depth24"] / 1e3), 2)

    os.makedirs("experiments/results", exist_ok=True)
    with open("experiments/results/train_step_anatomy.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
