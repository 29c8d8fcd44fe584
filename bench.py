"""Headline benchmark: 50-step ODE sampling throughput, 256^2 latents.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline: the BASELINE.json north-star target of 4 images/sec/chip on v5e
for 50-step ODE sampling of 256^2 latents (4x32x32) with the flagship
zigzag8_b1_pe2 model (embed_dim=768, depth=24, patch=1, zigzagN8).
``vs_baseline`` is value / 4.0 (>1 beats the target).

Timing note: on the axon-relayed chip ``block_until_ready`` does not block,
so each timed call returns a scalar (sum of the sampled batch) and is synced
by transferring that scalar to the host; the RNG key is derived in-jit from
the iteration index so no per-call data upload is needed.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from zigma_tpu.models import ZigMa
    from zigma_tpu.transport import Sampler, create_transport

    batch = 16
    num_steps = 50

    model = ZigMa(
        in_channels=4, embed_dim=768, depth=24, img_dim=32, patch_size=1,
        scan_type="zigzagN8", use_pe=2, dtype=jnp.bfloat16,
    )
    x0 = jnp.zeros((batch, 4, 32, 32), jnp.float32)
    t0 = jnp.zeros((batch,), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, t0)

    transport = create_transport("Linear", "velocity")
    sampler = Sampler(transport)
    sample_fn = sampler.sample_ode(sampling_method="euler",
                                   num_steps=num_steps)

    @jax.jit
    def generate_sum(params, i):
        # params as an ARGUMENT: closing over them would bake ~500 MB of
        # constants into the HLO (breaks remote-compile payload limits)
        z = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(1), i),
                              (batch, 4, 32, 32))
        model_fn = lambda x, t: model.apply(params, x, t)
        return jnp.float32(jnp.sum(sample_fn(z, model_fn)[-1]))

    float(generate_sum(params, 0))  # warmup / compile

    n_iters = 3
    start = time.perf_counter()
    for i in range(1, n_iters + 1):
        s = float(generate_sum(params, i))  # scalar transfer = real sync
    elapsed = time.perf_counter() - start

    # the jitted sampler is unsharded: exactly ONE chip does the work,
    # regardless of how many devices the host exposes
    imgs_per_sec_per_chip = batch * n_iters / elapsed
    baseline = 4.0  # BASELINE.json north-star target (img/s/chip, v5e)
    print(json.dumps({
        "metric": "images/sec/chip, 50-step ODE, 256^2 latents, zigzag8_b1",
        "value": round(imgs_per_sec_per_chip, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / baseline, 4),
    }))


if __name__ == "__main__":
    main()
