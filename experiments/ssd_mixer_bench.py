"""Mamba-2 SSD mixer vs the Mamba-1 Pallas scan on v5e hardware.

docs/DESIGN.md §8 closes the Mamba-1 perf story at its measured envelope
(every component at its roofline; the scan kernel at the VPU issue floor)
and names exactly one remaining lever: "Mamba-2-style scalar-decay heads
that move the recurrence onto the MXU".  Round 5 ships that lever
(ops/ssd.py + models/mamba2.py); this experiment measures what it buys at
the flagship shape.

Three measurements, all differential in-jit timing (k=2 vs k=16/32
fori_loop chains; the ~34 ms relay dispatch cancels — DESIGN.md §7):

1. isolated mixer forward: Mamba-1 (Pallas kernel path) vs Mamba-2
   (chunked SSD matmuls) at (b=16, L=1024, d_model=768) bf16, across
   d_state/headdim/chunk variants;
2. the same for forward+backward (training shape of the hot path);
3. end-to-end 50-step-ODE sampling throughput of the full ZigMa denoiser
   with ssm_cfg.ssm_version=2 vs the Mamba-1 flagship (the bench.py
   harness, same batch-16 optimum).

Writes experiments/results/ssd_mixer_bench.json.
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

from zigma_tpu.models import Mamba, Mamba2, ZigMa  # noqa: E402
from zigma_tpu.utils.inference import cast_params_for_inference  # noqa: E402

B, L, D_MODEL = 16, 1024, 768
RESULTS = os.path.join(REPO, "experiments", "results",
                       "ssd_mixer_bench.json")


def _chain_time(fn, x, k_small=2, k_big=16):
    """Per-call seconds: fn chained k times inside one jit."""

    def make(k):
        @jax.jit
        def f(x0):
            def body(i, xx):
                y = fn(xx)
                # renormalize so a 16-deep chain can't overflow bf16
                return (y / (jnp.sqrt(jnp.mean(
                    jnp.square(y.astype(jnp.float32)))) + 1e-3)).astype(
                        xx.dtype)
            return jnp.float32(jnp.sum(jax.lax.fori_loop(0, k, body, x0)))
        return f

    fs, fb = make(k_small), make(k_big)
    s = float(fs(x))
    assert math.isfinite(s), s
    float(fb(x))
    t0 = time.perf_counter(); float(fs(x)); ts = time.perf_counter() - t0
    t0 = time.perf_counter(); float(fb(x)); tb = time.perf_counter() - t0
    return max(tb - ts, 0.0) / (k_big - k_small)


def mixer_rows():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, D_MODEL),
                          jnp.bfloat16)
    rows = []
    cases = [
        ("mamba1 pallas (d_state 16)",
         Mamba(d_model=D_MODEL, d_state=16, scan_type="v1",
               scan_backend="auto", dtype=jnp.bfloat16)),
        ("mamba2 ssd (d_state 64, headdim 64, Q128)",
         Mamba2(d_model=D_MODEL, d_state=64, headdim=64, scan_type="v1",
                dtype=jnp.bfloat16, scan_chunk=128)),
        ("mamba2 ssd (d_state 64, headdim 64, Q256)",
         Mamba2(d_model=D_MODEL, d_state=64, headdim=64, scan_type="v1",
                dtype=jnp.bfloat16, scan_chunk=256)),
        ("mamba2 ssd (d_state 128, headdim 64, Q128)",
         Mamba2(d_model=D_MODEL, d_state=128, headdim=64, scan_type="v1",
                dtype=jnp.bfloat16, scan_chunk=128)),
        ("mamba2 ssd (d_state 64, headdim 128, Q128)",
         Mamba2(d_model=D_MODEL, d_state=64, headdim=128, scan_type="v1",
                dtype=jnp.bfloat16, scan_chunk=128)),
    ]
    for tag, m in cases:
        params = cast_params_for_inference(
            m.init(jax.random.PRNGKey(1), x), jnp.bfloat16)

        fwd = lambda xx: m.apply(params, xx)
        t_fwd = _chain_time(fwd, x)

        def fwd_bwd(xx):
            y, vjp = jax.vjp(lambda q: m.apply(params, q), xx)
            (gx,) = vjp(y)
            return gx
        t_bwd = _chain_time(fwd_bwd, x, k_big=8)

        row = {"case": tag, "fwd_ms": round(t_fwd * 1e3, 3),
               "fwd_bwd_ms": round(t_bwd * 1e3, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def sampling_rows():
    """End-to-end flagship sampling: Mamba-1 vs Mamba-2 mixer."""
    from zigma_tpu.transport import Sampler, create_transport

    flag = dict(in_channels=4, embed_dim=768, depth=24, img_dim=32,
                patch_size=1, scan_type="zigzagN8", use_pe=2,
                dtype=jnp.bfloat16)
    cases = [
        ("zigma flagship (mamba1)", flag),
        ("zigma2 (ssm_version 2, d_state 64, headdim 64)",
         {**flag, "ssm_cfg": dict(ssm_version=2, d_state=64, headdim=64)}),
    ]
    rows = []
    for tag, kw in cases:
        model = ZigMa(**kw)
        x0 = jnp.zeros((B, 4, 32, 32), jnp.float32)
        params = cast_params_for_inference(
            model.init(jax.random.PRNGKey(0), x0, jnp.zeros((B,))),
            jnp.bfloat16)
        sampler = Sampler(create_transport("Linear", "velocity"))
        sample_fn = sampler.sample_ode(sampling_method="euler", num_steps=50)

        @jax.jit
        def gen(params, i):
            z = jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(1), i),
                (B, 4, 32, 32))
            return jnp.float32(jnp.sum(
                sample_fn(z, lambda x, t: model.apply(params, x, t))[-1]))

        s = float(gen(params, 0))
        ok = math.isfinite(s)
        n_iters = 3
        t0 = time.perf_counter()
        for i in range(1, n_iters + 1):
            ok &= math.isfinite(float(gen(params, i)))
        dt = time.perf_counter() - t0
        n_params = sum(int(p.size) for p in jax.tree.leaves(params))
        row = {"case": tag, "img_per_sec": round(B * n_iters / dt, 4),
               "params_m": round(n_params / 1e6, 2), "ok": bool(ok)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main():
    out = {"device": str(jax.devices()[0]),
           "shape": dict(batch=B, L=L, d_model=D_MODEL),
           "mixer": mixer_rows(), "sampling": sampling_rows()}
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    # merge-preserve keys this script does not produce (the formulation
    # A/B record "ab_v3" and the training rows "training_bs16_chain8"
    # that DESIGN.md §11 cites) — a re-run must not delete cited evidence
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            prev = json.load(f)
        prev.update(out)
        out = prev
    with open(RESULTS, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", RESULTS)


if __name__ == "__main__":
    main()
