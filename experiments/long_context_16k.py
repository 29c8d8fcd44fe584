"""16k-token long-context demonstration on real TPU hardware.

SURVEY §7.3 hard part 4: the patch-1 1024^2 regime — 128x128 latents at
patch size 1 give L = 16384 tokens through the scan (d_inner 1536, 128
sequence chunks through the Pallas kernel's sequential grid, mirroring the
chunked-prefix scheme of the reference CUDA kernel,
csrc/selective_scan/selective_scan.cpp:307-313).  This is the largest
sequence the reference's configs reach and was previously designed-for but
unexercised (round-1 max demonstrated: 4096 tokens).

Runs, on the real chip:
  1. training steps (full AdamW + EMA + grad-clip step, bf16 activations,
     use_checkpoint + the 'scan_out' remat policy) — records steps/s and
     the compiled step's memory analysis (HBM);
  2. a 50-step Euler ODE sample from the EMA weights — records img/s.

Writes results/long_context_16k.json.  Timing uses scalar-transfer sync
(block_until_ready does not block through the axon relay).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def mem_mb(compiled) -> dict:
    try:
        ma = compiled.memory_analysis()
        return {
            "argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
            "output_mb": round(ma.output_size_in_bytes / 2**20, 1),
            "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
            "code_mb": round(ma.generated_code_size_in_bytes / 2**20, 1),
        }
    except Exception as e:  # memory_analysis is backend-dependent
        return {"unavailable": str(e)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--sample-steps", type=int, default=50)
    ap.add_argument("--sample-batch", type=int, default=1)
    args = ap.parse_args()

    from zigma_tpu.models import ZigMa
    from zigma_tpu.train import (TrainState, create_optimizer,
                                 create_train_step, make_diffusion_loss_fn)
    from zigma_tpu.transport import Sampler, create_transport

    model = ZigMa(
        in_channels=4, embed_dim=768, depth=24, img_dim=128, patch_size=1,
        scan_type="zigzagN8", use_pe=2, dtype=jnp.bfloat16,
        use_checkpoint=True, remat_policy="scan_out",
    )
    L = model.num_patches
    assert L == 16384, L
    B = args.batch
    x0 = jnp.zeros((B, 4, 128, 128), jnp.float32)
    t0 = jnp.zeros((B,), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, t0)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"L={L} tokens, {n_params / 1e6:.1f}M params, batch={B}",
          flush=True)

    transport = create_transport("Linear", "velocity")
    optimizer = create_optimizer()
    state = TrainState.create(params, optimizer)
    step_fn = create_train_step(
        make_diffusion_loss_fn(model, transport), optimizer)

    data = {"x": jax.random.normal(jax.random.PRNGKey(1), (B, 4, 128, 128))}
    rng = jax.random.PRNGKey(2)
    lowered = step_fn.lower(state, rng, data)
    print("train step lowered; compiling...", flush=True)
    compiled = lowered.compile()
    train_mem = mem_mb(compiled)
    print("train memory:", train_mem, flush=True)

    state, metrics = compiled(state, rng, data)  # warmup execution
    loss0 = float(jax.device_get(metrics["loss"]))
    print(f"warmup loss={loss0:.4f}", flush=True)
    assert jnp.isfinite(loss0)

    start = time.perf_counter()
    for i in range(args.steps):
        state, metrics = compiled(state, jax.random.fold_in(rng, i), data)
        loss = float(jax.device_get(metrics["loss"]))  # scalar sync
    train_elapsed = time.perf_counter() - start
    steps_per_sec = args.steps / train_elapsed
    print(f"{args.steps} steps in {train_elapsed:.2f}s -> "
          f"{steps_per_sec:.3f} steps/s (last loss {loss:.4f})", flush=True)

    # ---- 50-step ODE sampling from the EMA weights ----
    SB = args.sample_batch
    sampler = Sampler(transport)
    sample_fn = sampler.sample_ode(sampling_method="euler",
                                   num_steps=args.sample_steps)

    @jax.jit
    def generate_sum(ema, i):
        z = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(3), i),
                              (SB, 4, 128, 128))
        model_fn = lambda x, t: model.apply(ema, x, t)
        return jnp.float32(jnp.sum(sample_fn(z, model_fn)[-1]))

    slow = generate_sum.lower(state.ema_params, 0)
    print("sampler lowered; compiling...", flush=True)
    scompiled = slow.compile()
    sample_mem = mem_mb(scompiled)
    print("sample memory:", sample_mem, flush=True)
    s = float(scompiled(state.ema_params, 0))  # warmup
    assert jnp.isfinite(s), s
    n_iters = 2
    start = time.perf_counter()
    for i in range(1, n_iters + 1):
        s = float(scompiled(state.ema_params, i))
    sample_elapsed = time.perf_counter() - start
    imgs_per_sec = SB * n_iters / sample_elapsed
    print(f"sampling: {imgs_per_sec:.3f} img/s "
          f"({args.sample_steps}-step ODE, batch {SB})", flush=True)

    out = {
        "L_tokens": L,
        "model": "zigzag8_b1_pe2 @ patch1 1024^2 latents (128x128x4)",
        "params_m": round(n_params / 1e6, 1),
        "backend": jax.default_backend(),
        "train": {
            "batch": B,
            "steps_per_sec": round(steps_per_sec, 4),
            "imgs_per_sec": round(steps_per_sec * B, 4),
            "last_loss": round(loss, 4),
            "remat": "use_checkpoint + scan_out",
            "memory": train_mem,
        },
        "sample": {
            "batch": SB,
            "num_steps": args.sample_steps,
            "imgs_per_sec": round(imgs_per_sec, 4),
            "memory": sample_mem,
        },
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "long_context_16k.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
