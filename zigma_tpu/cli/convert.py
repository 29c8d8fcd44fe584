"""Checkpoint conversion driver: reference ``.pt`` -> train-resumable orbax.

    python -m zigma_tpu.cli.convert --ckpt faceshq1024_0060000.pt \
        --out ./converted model=s1024_zigzag8_b2 [--which ema] [k=v ...]

The reference releases checkpoints as torch dicts
``{model, ema, opt, args, train_steps, best_fid}`` (train_acc.py:492-505).
``zigma_tpu.cli.sample`` already converts them on the fly; this CLI makes
the conversion a one-time step AND emits a checkpoint in the trainer's
orbax layout (TrainState with fresh optimizer state, ``params`` = ``ema`` =
the converted weights), so ``zigma_tpu.cli.train ckpt=<out>/0000000`` can
fine-tune directly from a reference release.

The model config (groups/overrides, same syntax as the train CLI) is used
to build the target parameter template; conversion is strict — any
missing/extra/mis-shaped parameter fails loudly rather than silently
fine-tuning from garbage.
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from zigma_tpu.config import load_config
from zigma_tpu.train import TrainState, create_optimizer, save_checkpoint

from .train import DEFAULT_CONFIG_DIR, build_model


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="reference .pt checkpoint")
    ap.add_argument("--out", required=True, help="output checkpoint directory")
    ap.add_argument("--which", default="ema", choices=["ema", "model"],
                    help="which weights to take from the .pt dict")
    ap.add_argument("--config-dir", default=DEFAULT_CONFIG_DIR)
    args, overrides = ap.parse_known_args(argv)

    cfg = load_config(args.config_dir, "default", overrides)
    model = build_model(cfg)

    # template init for shape/layout validation
    p = cfg.model.params
    shape = (1, p["in_channels"], p["img_dim"], p["img_dim"])
    if cfg.data.get("video_frames", 0) or p.get("video_frames", 0):
        vf = int(cfg.data.get("video_frames", 0) or p.get("video_frames"))
        shape = (1, vf, *shape[1:])
    x = jnp.zeros(shape, jnp.float32)
    t = jnp.zeros((1,))
    y = None
    if p.get("has_text") or cfg.data.get("has_text"):
        y = jnp.zeros((1, int(cfg.data.get("n_context_token", 77)),
                       int(cfg.data.get("d_context", 768))))
    elif cfg.data.get("num_classes", -1) > 0:
        y = jnp.zeros((1,), jnp.int32)
    template = model.init(jax.random.PRNGKey(0), x, t, y)

    from zigma_tpu.convert import convert_reference_checkpoint

    converted = convert_reference_checkpoint(
        args.ckpt, which=args.which,
        scan_layers=model.effective_scan_layers)

    # validate against the template tree: same structure, same shapes
    t_flat = jax.tree_util.tree_flatten_with_path(template)[0]
    c_flat = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(converted)[0]}
    errors = []
    for k, tv in t_flat:
        ks = jax.tree_util.keystr(k)
        cv = c_flat.pop(ks, None)
        if cv is None:
            errors.append(f"missing in .pt conversion: {ks}")
        elif tuple(np.shape(cv)) != tuple(tv.shape):
            errors.append(f"shape mismatch {ks}: "
                          f"{np.shape(cv)} vs model {tuple(tv.shape)}")
    errors += [f"unexpected converted param: {k}" for k in c_flat]
    if errors:
        raise SystemExit("conversion mismatch:\n  " + "\n  ".join(errors))

    params = jax.tree.map(jnp.asarray, converted)
    optimizer = create_optimizer(
        lr=float(cfg.optim.get("lr", 1e-4)),
        weight_decay=float(cfg.optim.get("wd", 0.0)),
        grad_clip=float(cfg.get("max_grad_norm", 2.0)))
    state = TrainState.create(params, optimizer)  # params == ema, step 0
    path = save_checkpoint(args.out, state)
    n = sum(v.size for v in jax.tree.leaves(params))
    print(f"converted {args.ckpt} [{args.which}] "
          f"({n / 1e6:.2f}M params) -> {path}")
    print(f"fine-tune with: zigma-train ckpt={path} "
          + " ".join(overrides))
    return path


if __name__ == "__main__":
    main()
