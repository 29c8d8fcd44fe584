"""Attribute every millisecond of a 50-step ODE sampling step (VERDICT r2 #2).

Measurement rule (learned the hard way): through the axon relay every
host-synced call pays a ~40 ms round trip, so per-call timings are useless
— EVERYTHING here is amortized inside one jit over 50 iterations and
divided by 50.  Three programs, all at the exact bench configuration
(flagship zigzag8_b1, batch 16, bf16 inference cast):

  1. the real 50-step Euler sampler, depth 24   -> step_ms (the bench)
  2. the real 50-step Euler sampler, depth 12   -> depth slope + intercept
  3. a 50-iteration chained FORWARD-only scan (x <- model(x, t_i), no
     integrator state/axpy/trajectory stack), depth 24 -> integrator cost

which compose with the per-layer component table of docs/DESIGN.md §8
(kernel / GEMMs / gate / gathers / norms, from differential in-jit timing
and the round-2 device trace): step = intercept + depth x per_layer, and
integrator overhead = (1) - (3).

Writes experiments/results/sampling_step_anatomy.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, STEPS = 16, 50


def build(depth):
    from zigma_tpu.models import ZigMa
    from zigma_tpu.utils.inference import cast_params_for_inference

    model = ZigMa(in_channels=4, embed_dim=768, depth=depth, img_dim=32,
                  patch_size=1, scan_type="zigzagN8", use_pe=2,
                  dtype=jnp.bfloat16)
    x0 = jnp.zeros((BATCH, 4, 32, 32), jnp.float32)
    t0 = jnp.zeros((BATCH,), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, t0)
    params = cast_params_for_inference(params, jnp.bfloat16)
    return model, params


def time_amortized(fn, params, iters=3):
    """Wall time per call of an already-jitted fn, scalar-transfer synced."""
    float(fn(params, 0))  # warmup/compile
    start = time.perf_counter()
    for i in range(1, iters + 1):
        float(fn(params, i))
    return (time.perf_counter() - start) / iters


def main():
    from zigma_tpu.transport import Sampler, create_transport

    transport = create_transport("Linear", "velocity")
    sampler = Sampler(transport)
    sample_fn = sampler.sample_ode(sampling_method="euler", num_steps=STEPS)
    out = {"config": "zigzag8_b1 flagship, batch 16, bf16 inference cast",
           "method": "all numbers amortized over 50 in-jit iterations"}

    # --- the real sampler at depth 24 and 12 ---------------------------
    step_ms = {}
    for depth in (24, 12):
        model, params = build(depth)

        @jax.jit
        def generate_sum(params, i, model=model):
            z = jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(1), i),
                (BATCH, 4, 32, 32))
            model_fn = lambda x, t: model.apply(params, x, t)
            return jnp.float32(jnp.sum(sample_fn(z, model_fn)[-1]))

        step_ms[depth] = time_amortized(generate_sum, params) * 1e3 / STEPS
    per_layer = (step_ms[24] - step_ms[12]) / 12.0
    out["sampler_step_ms"] = {str(k): round(v, 3) for k, v in step_ms.items()}
    out["per_layer_ms"] = round(per_layer, 4)
    out["intercept_ms"] = round(step_ms[24] - 24 * per_layer, 3)
    out["img_per_s"] = round(BATCH / (step_ms[24] * STEPS / 1e3), 4)

    # --- forward-only chained scan, depth 24 (no integrator) -----------
    model, params = build(24)

    @jax.jit
    def forward_chain(params, i):
        z = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(1), i),
                              (BATCH, 4, 32, 32))

        def body(x, t):
            v = model.apply(params, x, jnp.full((BATCH,), t))
            return v.astype(jnp.float32), None

        x, _ = jax.lax.scan(body, z, jnp.linspace(0.0, 1.0, STEPS))
        return jnp.float32(jnp.sum(x))

    fwd_ms = time_amortized(forward_chain, params) * 1e3 / STEPS
    out["forward_only_ms"] = round(fwd_ms, 3)
    out["integrator_overhead_ms"] = round(step_ms[24] - fwd_ms, 3)
    out["integrator_overhead_pct"] = round(
        100 * (step_ms[24] - fwd_ms) / step_ms[24], 2)

    os.makedirs("experiments/results", exist_ok=True)
    with open("experiments/results/sampling_step_anatomy.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
