"""Round-3 perf harvest experiments (VERDICT r2 #2 candidates).

Each experiment is amortized in-jit (the axon relay adds ~40 ms to every
host-synced call, see sampling_step_anatomy.py) and targets one candidate:

  group   — re-sweep the kernel's recurrence loop group under the
            d-block-innermost grid (the round-2 sweep that picked group=4
            ran on the older chunk-innermost grid)
  resid   — end-to-end 50-step sampling with the residual stream in bf16
            instead of fp32 (the fp32 residual add+norm stream is ~0.3
            ms/layer of pure HBM traffic); also reports the numeric delta
            of the final latents vs the fp32-residual baseline
  batch   — sampling batch {12, 16, 20, 24} around the measured b=16
            optimum (round-2 only measured 16 vs 32/64)

Usage: python experiments/perf_harvest_r3.py [group|resid|batch ...]
Writes experiments/results/perf_harvest_r3.json (merging keys).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "perf_harvest_r3.json")


def save(key, value):
    out = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            out = json.load(f)
    out[key] = value
    with open(RESULTS, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({key: value}, indent=1), flush=True)


def sweep_group():
    from zigma_tpu.ops.scan_pallas import scan_core_fwd_pallas

    B, L, D, N = 16, 1024, 1536, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    dtype = jnp.bfloat16
    u = jax.random.normal(ks[0], (B, L, D), dtype)
    delta = jax.random.normal(ks[1], (B, L, D), dtype) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (D, N)) * 0.5)
    Bv = jax.random.normal(ks[3], (B, L, N), dtype)
    Cv = jax.random.normal(ks[4], (B, L, N), dtype)
    Dskip = jax.random.normal(ks[5], (D,))
    z = jax.random.normal(ks[6], (B, L, D), dtype)
    bias = jnp.full((D,), 0.05, jnp.float32)

    res = {}
    CHAIN = 24  # amortize the ~40 ms relay RTT over a layer-stack's worth
    for group in (2, 4, 8):
        kern = functools.partial(scan_core_fwd_pallas, softplus=True,
                                 group=group)

        @jax.jit
        def chain(u0):
            def body(uc, _):
                y, _, _ = kern(uc, delta, bias, A, Bv, Cv)
                return y.astype(uc.dtype), None
            y, _ = jax.lax.scan(body, u0, None, length=CHAIN)
            return jnp.float32(jnp.sum(y))

        float(chain(u))
        reps = 5
        start = time.perf_counter()
        for _ in range(reps):
            float(chain(u))
        per_call = (time.perf_counter() - start) / (reps * CHAIN)
        res[f"group{group}_ms"] = round(per_call * 1e3, 3)
    save("group_sweep_fwd_flagship_bf16", res)


def _bench_model(model_kwargs, batch=16, num_steps=50, iters=3,
                 return_latents=False):
    from zigma_tpu.models import ZigMa
    from zigma_tpu.transport import Sampler, create_transport
    from zigma_tpu.utils.inference import cast_params_for_inference

    model = ZigMa(in_channels=4, embed_dim=768, depth=24, img_dim=32,
                  patch_size=1, scan_type="zigzagN8", use_pe=2,
                  dtype=jnp.bfloat16, **model_kwargs)
    x0 = jnp.zeros((batch, 4, 32, 32), jnp.float32)
    t0 = jnp.zeros((batch,), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, t0)
    params = cast_params_for_inference(params, jnp.bfloat16)
    transport = create_transport("Linear", "velocity")
    sample_fn = Sampler(transport).sample_ode(sampling_method="euler",
                                              num_steps=num_steps)

    @jax.jit
    def generate(params, i):
        z = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(1), i),
                              (batch, 4, 32, 32))
        model_fn = lambda x, t: model.apply(params, x, t)
        return sample_fn(z, model_fn)[-1]

    lat = jax.device_get(generate(params, 0))  # warmup + latents
    start = time.perf_counter()
    for i in range(1, iters + 1):
        float(jnp.sum(generate(params, i)))
    per_sec = batch * iters / (time.perf_counter() - start)
    return (per_sec, lat) if return_latents else per_sec


def sweep_resid():
    import numpy as np

    base_ips, base_lat = _bench_model({}, return_latents=True)
    bf16_ips, bf16_lat = _bench_model({"residual_in_fp32": False},
                                      return_latents=True)
    delta = np.abs(np.asarray(base_lat, np.float32)
                   - np.asarray(bf16_lat, np.float32))
    scale = float(np.sqrt(np.mean(np.asarray(base_lat, np.float32) ** 2)))
    save("residual_bf16_sampling", {
        "baseline_img_s": round(base_ips, 4),
        "bf16_residual_img_s": round(bf16_ips, 4),
        "speedup": round(bf16_ips / base_ips, 4),
        "final_latent_max_abs_delta": round(float(delta.max()), 6),
        "final_latent_rms_delta_ratio":
            float(f"{float(np.sqrt(np.mean(delta**2))) / scale:.3g}"),
    })


def sweep_batch():
    res = {}
    for b in (12, 16, 20, 24):
        ips = _bench_model({}, batch=b)
        res[f"batch{b}_img_s"] = round(ips, 4)
    save("batch_sweep_sampling", res)


if __name__ == "__main__":
    which = sys.argv[1:] or ["group", "resid", "batch"]
    if "group" in which:
        sweep_group()
    if "resid" in which:
        sweep_resid()
    if "batch" in which:
        sweep_batch()
