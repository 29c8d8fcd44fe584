"""Batch sweep of the long-sequence / video sampling rows (round 4).

The flagship 256^2 row was batch-swept in round 3 (bs16 optimum, gather
cliff at b>=20 — DESIGN.md §9); the envelope rows never were: 1024^2-p2
ships bs2, 1024^2-p1 bs1, video bs1.  At 4096-16384 tokens the
gather-materialization and VMEM-residency tradeoffs differ from the
1024-token flagship, so the per-sample optimum may not be the shipped
batch.  Sweeps each row over feasible batches and reports
samples/sec (per-batch dispatch, scalar-synced, amortized over 2 draws
after warmup — same methodology as bench.py's rows).

Writes experiments/results/envelope_batch_sweep.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_case(tag, model_kwargs, shape, batch):
    from zigma_tpu.models import ZigMa
    from zigma_tpu.transport import Sampler, create_transport
    from zigma_tpu.utils.inference import cast_params_for_inference

    kw = {**dict(in_channels=4, embed_dim=768, depth=24, img_dim=32,
                 patch_size=1, scan_type="zigzagN8", use_pe=2,
                 dtype=jnp.bfloat16), **model_kwargs}
    model = ZigMa(**kw)
    x0 = jnp.zeros((batch,) + shape, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((batch,)))
    params = cast_params_for_inference(params, jnp.bfloat16)
    sampler = Sampler(create_transport("Linear", "velocity"))
    sample_fn = sampler.sample_ode(sampling_method="euler", num_steps=50)

    @jax.jit
    def generate_sum(params, i):
        z = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(1), i),
                              (batch,) + shape)
        return jnp.float32(jnp.sum(
            sample_fn(z, lambda x, t: model.apply(params, x, t))[-1]))

    s = float(generate_sum(params, 0))  # warmup/compile
    ok = math.isfinite(s)
    n = 2
    start = time.perf_counter()
    for i in range(1, n + 1):
        ok &= math.isfinite(float(generate_sum(params, i)))
    per_sec = batch * n / (time.perf_counter() - start)
    rec = {"tag": tag, "batch": batch, "samples_per_sec": round(per_sec, 4),
           "ok": bool(ok)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    cases = [
        ("1024^2 p2 (4096 tok)", dict(img_dim=128, patch_size=2),
         (4, 128, 128), [1, 2, 4, 8]),
        ("1024^2 p1 (16384 tok)", dict(img_dim=128, patch_size=1),
         (4, 128, 128), [1, 2]),
        ("video zzvideo_sst (16x16^2)",
         dict(img_dim=16, patch_size=1, scan_type="zzvideo_sst",
              video_frames=16), (16, 4, 16, 16), [1, 2, 4]),
    ]
    out = []
    for tag, kw, shape, batches in cases:
        for b in batches:
            try:
                out.append(run_case(tag, kw, shape, b))
            except Exception as e:  # OOM etc: record, keep sweeping
                out.append({"tag": tag, "batch": b, "error": str(e)[:200]})
                print(json.dumps(out[-1]), flush=True)

    os.makedirs(os.path.join(REPO, "experiments", "results"), exist_ok=True)
    with open(os.path.join(REPO, "experiments", "results",
                           "envelope_batch_sweep.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
