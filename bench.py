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
import sys
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


def kernel_check():
    """On-hardware Pallas kernel correctness: fwd + every cotangent vs the
    chunked jnp backend at the flagship shape, fp32 and bf16.

    The CI suite runs the kernel in interpret mode on CPU only; this mode
    exercises the REAL Mosaic compile path on the chip and asserts the
    tests/test_scan_pallas.py tolerances (which mirror the reference's
    dis_mamba/tests/ops/test_selective_scan.py:45-47).  Prints one JSON
    line per dtype plus a final verdict line.
    """
    from zigma_tpu.ops.scan_pallas import selective_scan_pallas
    from zigma_tpu.ops.selective_scan import selective_scan

    B, L, D, N = 16, 1024, 1536, 16  # the flagship 256^2 scan shape
    results = {}
    ok_all = True
    for dtype, rtol, atol, gr, ga in [
            (jnp.float32, 2e-3, 6e-4, 2e-3, 2e-3),
            (jnp.bfloat16, 3e-2, 5e-2, 3e-2, 5e-2)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 7)
        u = jax.random.normal(ks[0], (B, L, D), dtype)
        delta = jax.random.normal(ks[1], (B, L, D), dtype) * 0.5
        A = -jnp.exp(jax.random.normal(ks[2], (D, N)) * 0.5)
        Bv = jax.random.normal(ks[3], (B, L, N), dtype)
        Cv = jax.random.normal(ks[4], (B, L, N), dtype)
        Dskip = jax.random.normal(ks[5], (D,))
        z = jax.random.normal(ks[6], (B, L, D), dtype)
        bias = jnp.full((D,), 0.05, jnp.float32)

        def loss(fn):
            def f(u, delta, A, Bv, Cv, Dskip, z):
                y = fn(u, delta, A, Bv, Cv, Dskip, z=z, delta_bias=bias,
                       delta_softplus=True)
                return jnp.sum(y.astype(jnp.float32) ** 2) / y.size
            return f

        chunked = lambda *a, **kw: selective_scan(*a, backend="chunked", **kw)
        args = (u, delta, A, Bv, Cv, Dskip, z)
        y_pal = jax.jit(lambda *a: selective_scan_pallas(
            *a[:5], a[5], z=a[6], delta_bias=bias, delta_softplus=True))(*args)
        y_ref = jax.jit(lambda *a: chunked(
            *a[:5], a[5], z=a[6], delta_bias=bias, delta_softplus=True))(*args)
        g_pal = jax.jit(jax.grad(loss(selective_scan_pallas),
                                 argnums=tuple(range(7))))(*args)
        g_ref = jax.jit(jax.grad(loss(chunked),
                                 argnums=tuple(range(7))))(*args)

        entry = {}
        names = ["y", "du", "ddelta", "dA", "dB", "dC", "dD", "dz"]
        pairs = [(y_pal, y_ref)] + list(zip(g_pal, g_ref))
        for name, (a, b) in zip(names, pairs):
            a32 = jnp.asarray(a, jnp.float32)
            b32 = jnp.asarray(b, jnp.float32)
            r, t = (rtol, atol) if name == "y" else (gr, ga)
            max_abs = float(jnp.max(jnp.abs(a32 - b32)))
            viol = float(jnp.max(jnp.abs(a32 - b32)
                                 - (t + r * jnp.abs(b32))))
            passed = viol <= 0.0
            ok_all &= passed
            entry[name] = {"max_abs_err": round(max_abs, 8),
                           "tol": f"rtol={r},atol={t}", "ok": passed}
        results[jnp.dtype(dtype).name] = entry
        print(json.dumps({"dtype": jnp.dtype(dtype).name, **{
            k: v["max_abs_err"] for k, v in entry.items()},
            "ok": all(v["ok"] for v in entry.values())}))

    print(json.dumps({
        "metric": "pallas_scan_on_hw_correctness",
        "shape": [B, L, D, N],
        "backend": jax.default_backend(),
        "ok": bool(ok_all),
        "results": results,
    }))
    return ok_all


if __name__ == "__main__":
    if "kernel" in sys.argv[1:]:
        sys.exit(0 if kernel_check() else 1)
    main()
