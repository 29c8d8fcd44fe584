"""Autoregressive generation benchmark for the Mamba LM stack.

Counterpart of the reference's
dis_mamba/benchmarks/benchmark_generation_mamba_simple.py: measures
prefill + decode throughput of ``zigma_tpu.models.lm.generate`` (the whole
decode loop is one compiled ``lax.scan`` — the TPU analogue of the
reference's CUDA-graph capture).

Usage: python benchmarks/bench_lm_generation.py [--d-model 768] [--n-layer 24]
       [--prompt-len 128] [--gen-len 128] [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--d-model", type=int, default=768)
    ap.add_argument("--n-layer", type=int, default=24)
    ap.add_argument("--vocab", type=int, default=50277)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--gen-len", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from zigma_tpu.models.lm import MambaLMHeadModel, generate

    model = MambaLMHeadModel(
        d_model=args.d_model, n_layer=args.n_layer, vocab_size=args.vocab,
        rms_norm=True, pad_vocab_size_multiple=8, dtype=jnp.bfloat16)
    prompt = jnp.ones((args.batch, args.prompt_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"{n_params/1e6:.1f}M params")

    gen = jax.jit(lambda p, ids: generate(model, p, ids, args.gen_len))
    out = gen(params, prompt)
    _ = float(jnp.sum(out))  # compile + sync

    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        _ = float(jnp.sum(gen(params, prompt)))
    dt = (time.perf_counter() - t0) / n
    toks = args.batch * (args.prompt_len + args.gen_len)
    print(f"{dt*1e3:.0f} ms per call -> {toks/dt:.0f} tokens/sec "
          f"(batch {args.batch}, {args.prompt_len}+{args.gen_len} tokens)")


if __name__ == "__main__":
    main()
