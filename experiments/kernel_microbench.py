"""Differential in-jit timing of the Pallas selective-scan kernel.

Through the axon relay ``block_until_ready`` does not block, so wall-clock
timing of a single dispatch is meaningless.  The only reliable method is
differential in-jit timing: run the op k=2 and k=32 times inside a
``lax.fori_loop`` (outputs chained to inputs so iterations can't be
elided), return a scalar, and take (t32 - t2) / 30.  Fixed per-dispatch
overhead (~34 ms through the relay) cancels in the difference.

Usage: python experiments/kernel_microbench.py [--fwd-only] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(fn, *args, reps: int = 3):
    """Median wall time of fn(*args) -> scalar, via scalar-transfer sync."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = float(fn(*args))  # scalar device->host transfer = sync point
        ts.append(time.perf_counter() - t0)
    assert jnp.isfinite(s), s
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--shape", default="16,1024,1536,16",
                    help="B,L,D,N (flagship 256^2 default)")
    ap.add_argument("--gate", default="none",
                    choices=["none", "jnp", "fused"],
                    help="D-skip + silu(z) gating: outside the kernel "
                         "(jnp, the default model path) or fused into the "
                         "kernel epilogue (re-measure after grid changes: "
                         "the fused variant lost 1.815 vs 1.572 ms when "
                         "the BC stream was still triple-fetched)")
    args = ap.parse_args()

    from zigma_tpu.ops.scan_pallas import selective_scan_pallas

    B, L, D, N = map(int, args.shape.split(","))
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    u = jax.random.normal(ks[0], (B, L, D), dtype)
    delta = jax.random.normal(ks[1], (B, L, D), dtype) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (D, N)) * 0.5)
    Bv = jax.random.normal(ks[3], (B, L, N), dtype)
    Cv = jax.random.normal(ks[4], (B, L, N), dtype)
    bias = jnp.full((D,), 0.05, jnp.float32)

    gate_kw = {}
    if args.gate != "none":
        ks2 = jax.random.split(jax.random.PRNGKey(1), 2)
        gate_kw = {"D": jax.random.normal(ks2[0], (D,)),
                   "z": jax.random.normal(ks2[1], (B, L, D), dtype),
                   "fuse_gate": args.gate == "fused"}

    def scan(u0):
        return selective_scan_pallas(u0, delta, A, Bv, Cv,
                                     delta_bias=bias, delta_softplus=True,
                                     **gate_kw)

    def chain_fwd(k):
        @jax.jit
        def f(u0):
            def body(i, u):
                return (0.1 * scan(u) + 1e-3).astype(u.dtype)
            return jnp.float32(jnp.sum(jax.lax.fori_loop(0, k, body, u0)))
        return f

    f2, f32x = chain_fwd(2), chain_fwd(32)
    f2(u); f32x(u)  # compile + warmup
    t2 = timed(f2, u)
    t32 = timed(f32x, u)
    fwd_ms = (t32 - t2) / 30 * 1e3
    out = {"shape": [B, L, D, N], "dtype": args.dtype, "gate": args.gate,
           "fwd_ms": round(fwd_ms, 4)}

    if not args.fwd_only:
        def chain_grad(k):
            def loss(u0):
                y = scan(u0)
                return jnp.float32(jnp.sum(y * y) / y.size)

            @jax.jit
            def f(u0):
                def body(i, u):
                    g = jax.grad(loss)(u)
                    return (u + 1e-6 * g.astype(u.dtype))
                return jnp.float32(jnp.sum(jax.lax.fori_loop(0, k, body, u0)))
            return f

        g2, g32 = chain_grad(2), chain_grad(32)
        g2(u); g32(u)
        t2 = timed(g2, u)
        t32 = timed(g32, u)
        out["fwd_bwd_ms"] = round((t32 - t2) / 30 * 1e3, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
