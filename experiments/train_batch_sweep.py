"""Training batch sweep at the flagship config (round 3).

The round-3 sampling batch sweep showed the scan-path gathers start
materializing at batch >= 20 (4.29 img/s at b=16 vs 3.95 at b=20) — and the
README's training row was measured at bs=20.  If the same cliff applies to
the train step, bs=16 may beat bs=20 in images/sec.  Measures the full
jitted train step (AdamW + EMA + clip, bf16 activations, use_checkpoint)
at bs {12, 16, 20, 24}, amortized over several in-jit steps via a scalar
sync per step (the step itself is one jit; per-call relay RTT ~40 ms is
<2% of a ~500 ms step, unlike the kernel timings).

Writes experiments/results/train_batch_sweep.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from zigma_tpu.models import ZigMa
    from zigma_tpu.train import (TrainState, create_optimizer,
                                 create_train_step, make_diffusion_loss_fn)
    from zigma_tpu.transport import create_transport

    model = ZigMa(in_channels=4, embed_dim=768, depth=24, img_dim=32,
                  patch_size=1, scan_type="zigzagN8", use_pe=2,
                  dtype=jnp.bfloat16, use_checkpoint=True)
    transport = create_transport("Linear", "velocity")
    optimizer = create_optimizer()

    res = {}
    for bs in (12, 16, 20, 24):
        x0 = jnp.zeros((bs, 4, 32, 32), jnp.float32)
        t0 = jnp.zeros((bs,), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x0, t0)
        state = TrainState.create(params, optimizer)
        step_fn = create_train_step(
            make_diffusion_loss_fn(model, transport), optimizer)
        data = {"x": jax.random.normal(jax.random.PRNGKey(1),
                                       (bs, 4, 32, 32))}
        rng = jax.random.PRNGKey(2)
        state, m = step_fn(state, rng, data)             # compile + warmup
        float(jax.device_get(m["loss"]))
        n = 6
        start = time.perf_counter()
        for i in range(n):
            state, m = step_fn(state, jax.random.fold_in(rng, i), data)
            loss = float(jax.device_get(m["loss"]))      # scalar sync
        dt = (time.perf_counter() - start) / n
        res[f"bs{bs}"] = {"steps_per_sec": round(1.0 / dt, 4),
                          "imgs_per_sec": round(bs / dt, 4),
                          "loss": round(loss, 4)}
        print(json.dumps({f"bs{bs}": res[f"bs{bs}"]}), flush=True)

    os.makedirs("experiments/results", exist_ok=True)
    with open("experiments/results/train_batch_sweep.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
