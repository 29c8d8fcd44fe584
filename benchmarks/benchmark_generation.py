"""Mamba-LM generation throughput benchmark.

Counterpart of the reference's ``benchmarks/benchmark_generation_mamba_simple
.py`` (prompt -> N new tokens, reports wall time), rebuilt for the compiled
decode path: parallel-scan prefill + ``lax.scan`` token loop (the reference
uses CUDA-graph replay for the same purpose).

    python benchmarks/benchmark_generation.py \
        --d-model 768 --n-layer 24 --promptlen 128 --genlen 128 --batch 8

Timing uses a device-scalar sync (works through relays where
``block_until_ready`` is a no-op, see utils/profiling.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--d-model", type=int, default=768)
    ap.add_argument("--n-layer", type=int, default=24)
    ap.add_argument("--vocab-size", type=int, default=50277)
    ap.add_argument("--promptlen", type=int, default=128)
    ap.add_argument("--genlen", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="0 = greedy")
    args = ap.parse_args(argv)

    from zigma_tpu.models.lm import MambaLMHeadModel, generate

    model = MambaLMHeadModel(
        d_model=args.d_model, n_layer=args.n_layer,
        vocab_size=args.vocab_size, rms_norm=True, residual_in_fp32=True,
        pad_vocab_size_multiple=8, dtype=jnp.bfloat16)
    prompt = jnp.zeros((args.batch, args.promptlen), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    rng = None if args.temperature == 0 else jax.random.PRNGKey(1)

    def run(i):
        out = generate(model, params, prompt + i, args.genlen, rng=rng,
                       temperature=args.temperature or 1.0)
        return float(jnp.sum(out))  # scalar transfer = sync

    run(0)  # compile
    start = time.perf_counter()
    for i in range(1, args.repeats + 1):
        run(i)
    dt = (time.perf_counter() - start) / args.repeats
    new_tokens = args.batch * args.genlen
    print(f"model: d_model={args.d_model} n_layer={args.n_layer} "
          f"({n_params / 1e6:.1f}M params)")
    print(f"prompt {args.promptlen} + gen {args.genlen} x batch "
          f"{args.batch}: {dt * 1e3:.1f} ms "
          f"-> {new_tokens / dt:.1f} new tok/s "
          f"({args.batch * (args.promptlen + args.genlen) / dt:.1f} "
          f"total tok/s incl. prefill)")


if __name__ == "__main__":
    main()
