"""Complex64 (S4D-complex) selective-scan cost at reference-kernel shapes.

VERDICT r3 #8: the reference runs complex A/B/C natively in its fastest
CUDA kernel (`selective_scan.cpp:14-51`); here complex rides the chunked
custom-VJP backend as a real-pair structure-of-arrays lowering
(XLA:TPU's native complex backward SIGABRTs — DESIGN.md §10) while the
Pallas kernel is real-only.  This measures what that costs at the shapes
the reference kernel serves (d_state 64/128/256, its documented ceiling),
so the capability-table row carries a number instead of an asterisk.

Methodology: differential in-jit timing (k=2 vs k=32 fori_loop, outputs
chained; the ~34 ms relay dispatch overhead cancels) — see
kernel_microbench.py.  Complex operands are assembled INSIDE the jit from
real leaves (device_put of complex64 is unimplemented through the axon
relay).

Writes experiments/results/complex_scan_bench.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(fn, *args, reps: int = 3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = float(fn(*args))  # scalar device->host transfer = sync point
        ts.append(time.perf_counter() - t0)
    assert jnp.isfinite(s), s
    ts.sort()
    return ts[len(ts) // 2]


def measure(case, scan_of_u, u):
    """case -> {fwd_ms, fwd_bwd_ms} via the k=2/k=32 differential."""

    def chain_fwd(k):
        @jax.jit
        def f(u0):
            def body(i, uu):
                y = scan_of_u(uu).astype(uu.dtype)
                # renormalize the carry: the scan's per-iteration gain
                # (~sqrt(N), doubled for complex y=2Re<C,x>) overflows a
                # 32-deep chain otherwise; the rms reduce is identical
                # across cases and negligible vs the scan
                return y / (jnp.sqrt(jnp.mean(y * y)) + 1e-3) + 1e-3
            return jnp.float32(jnp.sum(jax.lax.fori_loop(0, k, body, u0)))
        return f

    def chain_grad(k):
        def loss(u0):
            y = scan_of_u(u0)
            return jnp.float32(jnp.sum(y * y) / y.size)

        @jax.jit
        def f(u0):
            def body(i, uu):
                return uu + 1e-6 * jax.grad(loss)(uu).astype(uu.dtype)
            return jnp.float32(jnp.sum(jax.lax.fori_loop(0, k, body, u0)))
        return f

    out = {}
    f2, f32 = chain_fwd(2), chain_fwd(32)
    f2(u); f32(u)  # compile + warmup
    out["fwd_ms"] = round((timed(f32, u) - timed(f2, u)) / 30 * 1e3, 4)
    g2, g32 = chain_grad(2), chain_grad(32)
    g2(u); g32(u)
    out["fwd_bwd_ms"] = round((timed(g32, u) - timed(g2, u)) / 30 * 1e3, 4)
    print(json.dumps({case: out}), flush=True)
    return out


def main():
    from zigma_tpu.ops.scan_pallas import selective_scan_pallas
    from zigma_tpu.ops.selective_scan import selective_scan

    B, L, D = 4, 1024, 768
    res = {"shape_BLD": [B, L, D]}
    for N in (64, 128, 256):
        ks = jax.random.split(jax.random.PRNGKey(N), 9)
        u = jax.random.normal(ks[0], (B, L, D))
        delta = jax.random.normal(ks[1], (B, L, D)) * 0.5
        Ar = -jnp.exp(jax.random.normal(ks[2], (D, N)) * 0.5)
        Ai = jax.random.normal(ks[3], (D, N))
        Br, Bi = (jax.random.normal(k, (B, L, N)) for k in (ks[4], ks[5]))
        Cr, Ci = (jax.random.normal(k, (B, L, N)) for k in (ks[6], ks[7]))
        bias = jnp.full((D,), 0.05, jnp.float32)
        cx = lambda r, i: (r + 1j * i).astype(jnp.complex64)

        def scan_cplx(uu):
            return selective_scan(
                uu, delta, cx(Ar, Ai), cx(Br, Bi), cx(Cr, Ci),
                delta_bias=bias, delta_softplus=True, backend="chunked")

        def scan_real_chunked(uu):
            return selective_scan(uu, delta, Ar, Br, Cr, delta_bias=bias,
                                  delta_softplus=True, backend="chunked")

        def scan_real_pallas(uu):
            return selective_scan_pallas(uu, delta, Ar, Br, Cr,
                                         delta_bias=bias,
                                         delta_softplus=True)

        res[f"N{N}"] = {
            "complex64_chunked": measure(f"N{N}:complex64_chunked",
                                         scan_cplx, u),
            "real_chunked": measure(f"N{N}:real_chunked",
                                    scan_real_chunked, u),
            "real_pallas": measure(f"N{N}:real_pallas",
                                   scan_real_pallas, u),
        }

    os.makedirs(os.path.join(REPO, "experiments", "results"), exist_ok=True)
    with open(os.path.join(REPO, "experiments", "results",
                           "complex_scan_bench.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
