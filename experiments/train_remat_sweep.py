"""Remat-axis sweep of the flagship train step at the bs-16 optimum (round 4).

DESIGN.md §9 records two remat data points, both at the OLD bs-20 default:
selective policies lose to full-block remat (1.70/1.58 vs 1.77 steps/s) and
no-remat OOMs.  Round 3 moved the training optimum to bs=16 (gather cliff at
b>=20) — 20% less activation memory — so the remat axis deserves a re-sweep
at the shipped batch: if no-remat fits in v5e's 16 GB it skips the ~76 ms
re-forward inside the ~293 ms backward (train_step_anatomy.json), worth up
to ~25% training throughput.

Measures the full jitted train step (AdamW + EMA + clip, bf16 activations)
at bs16 x {full remat, scan_out, scan_out+dots, no remat}, plus no-remat at
bs8 as the fallback point if bs16 OOMs.  Same methodology as
train_batch_sweep.py (amortized in-jit steps, scalar sync).  OOMs are
caught and recorded, not fatal.

Writes experiments/results/train_remat_sweep.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_case(tag, bs, use_checkpoint, remat_policy):
    from zigma_tpu.models import ZigMa
    from zigma_tpu.train import (TrainState, create_optimizer,
                                 create_train_step, make_diffusion_loss_fn)
    from zigma_tpu.transport import create_transport

    model = ZigMa(in_channels=4, embed_dim=768, depth=24, img_dim=32,
                  patch_size=1, scan_type="zigzagN8", use_pe=2,
                  dtype=jnp.bfloat16, use_checkpoint=use_checkpoint,
                  remat_policy=remat_policy)
    optimizer = create_optimizer()
    x0 = jnp.zeros((bs, 4, 32, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((bs,)))
    state = TrainState.create(params, optimizer)
    step_fn = create_train_step(
        make_diffusion_loss_fn(model, create_transport("Linear", "velocity")),
        optimizer)
    data = {"x": jax.random.normal(jax.random.PRNGKey(1), (bs, 4, 32, 32))}
    rng = jax.random.PRNGKey(2)
    state, m = step_fn(state, rng, data)             # compile + warmup
    float(jax.device_get(m["loss"]))
    n = 6
    start = time.perf_counter()
    for i in range(n):
        state, m = step_fn(state, jax.random.fold_in(rng, i), data)
        loss = float(jax.device_get(m["loss"]))      # scalar sync
    dt = (time.perf_counter() - start) / n
    return {"steps_per_sec": round(1.0 / dt, 4),
            "imgs_per_sec": round(bs / dt, 4),
            "loss": round(loss, 4), "ok": True}


def main():
    cases = [
        ("bs16_full_remat", 16, True, None),
        ("bs16_scan_out", 16, True, "scan_out"),
        ("bs16_scan_out_dots", 16, True, "scan_out+dots"),
        ("bs16_no_remat", 16, False, None),
        ("bs8_no_remat", 8, False, None),
    ]
    res = {}
    for tag, bs, ckpt, policy in cases:
        try:
            res[tag] = run_case(tag, bs, ckpt, policy)
        except Exception as e:  # RESOURCE_EXHAUSTED etc. — record, continue
            res[tag] = {"ok": False,
                        "error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(json.dumps({tag: res[tag]}), flush=True)

    os.makedirs("experiments/results", exist_ok=True)
    with open("experiments/results/train_remat_sweep.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
