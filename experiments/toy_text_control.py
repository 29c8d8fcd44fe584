"""End-to-end TEXT-CONDITIONED (cross-attention) control experiment.

Fourth conditioning mode (after unconditional / video / class+CFG):
``has_text=True`` routes (77, d_context) caption features through the
y_embedder mean-pool into adaLN conditioning AND a per-block
cross-attention branch.  Here the "caption" encodes the blob's continuous
(cy, cx) position as Fourier features, so conditioning fidelity is
measured as a REGRESSION: the centroid of the generated blob must track
the conditioned position.

A model that ignores the text places blobs uniformly (~0.24 normalized
expected error vs random targets); a model that obeys it drives the error
toward the data floor.

Usage: python experiments/toy_text_control.py [--steps 4000]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import shutil
import sys
import tarfile
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZE = 32
N_TOKEN = 16     # keep cross-attn cheap; the reference uses 77
D_CONTEXT = 64


def position_caption(cy, cx, rng=None):
    """(cy, cx) in [0,1]^2 -> (N_TOKEN, D_CONTEXT) Fourier-feature tokens."""
    freqs = 2.0 ** np.arange(8)
    feats = []
    for v in (cy, cx):
        feats += [np.sin(np.pi * freqs * v), np.cos(np.pi * freqs * v)]
    vec = np.concatenate(feats)  # (32,)
    token = np.zeros(D_CONTEXT, np.float32)
    token[:vec.size] = vec
    return np.tile(token, (N_TOKEN, 1))


def make_image(rng, cy, cx, size=SIZE):
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64) / size
    c0, c1 = rng.uniform(0, 0.4, 3), rng.uniform(0.6, 1.0, 3)
    angle = rng.uniform(0, 2 * np.pi)
    g = (np.cos(angle) * xx + np.sin(angle) * yy + 1) / 2
    img = c0[None, None] * (1 - g[..., None]) + c1[None, None] * g[..., None]
    s = rng.uniform(0.06, 0.10)
    blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s**2)))
    img = img + blob[..., None] * rng.choice([-0.9, 0.9], 3)[None, None]
    chw = np.transpose(np.clip(img, 0, 1), (2, 0, 1))
    return (chw * 2 - 1).astype(np.float32)


def blob_centroid(imgs):
    """(N, 3, H, W) -> normalized (cy, cx) via high-pass energy centroid.

    edge-replicated laplacian (np.roll would wrap the borders and flood the
    energy map with seam artifacts that drag every centroid to the center),
    then centroid of energy above the 90th percentile (kills diffuse
    background residue)."""
    p = np.pad(imgs, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    hp = imgs - (p[..., 1:-1, 2:] + p[..., 1:-1, :-2]
                 + p[..., 2:, 1:-1] + p[..., :-2, 1:-1]) / 4
    e = (hp ** 2).sum(-3)                      # (N, H, W)
    thresh = np.quantile(e.reshape(e.shape[0], -1), 0.9, axis=-1)
    e = np.where(e >= thresh[:, None, None], e, 0.0)
    e = e / np.maximum(e.sum((-2, -1), keepdims=True), 1e-12)
    h = imgs.shape[-1]
    grid = (np.arange(h) + 0.5) / h
    cy = (e.sum(-1) * grid).sum(-1)
    cx = (e.sum(-2) * grid).sum(-1)
    return np.stack([cy, cx], axis=-1)         # (N, 2)


def write_shards(out_dir, n, shard_size=500, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    tar, idx = None, -1
    for i in range(n):
        if i % shard_size == 0:
            if tar is not None:
                tar.close()
            idx += 1
            tar = tarfile.open(
                os.path.join(out_dir, f"train-{idx:06d}.tar"), "w")
        cy, cx = rng.uniform(0.2, 0.8, 2)
        img_buf, cap_buf = io.BytesIO(), io.BytesIO()
        np.save(img_buf, make_image(rng, cy, cx))
        # (1 caption per image, reference layout (N_cap, T, C))
        np.save(cap_buf, position_caption(cy, cx)[None])
        for ext, data in ((f"img_feature{SIZE}.npy", img_buf.getvalue()),
                          ("caption_feature.npy", cap_buf.getvalue())):
            info = tarfile.TarInfo(f"{i:06d}.{ext}")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    tar.close()
    return idx + 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--n-images", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--n-sample", type=int, default=256)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="zigma_toytxt_")
    shard_dir = os.path.join(work, "shards")
    out_dir = os.path.join(REPO, "experiments", "results")
    os.makedirs(out_dir, exist_ok=True)

    t0 = time.time()
    print(f"[1/4] {args.n_images} position-captioned images -> shards",
          flush=True)
    n_shards = write_shards(shard_dir, args.n_images)

    cfg_dir = os.path.join(work, "configs")
    shutil.copytree(os.path.join(REPO, "configs"), cfg_dir,
                    dirs_exist_ok=True)  # reruns reuse --workdir
    with open(os.path.join(cfg_dir, "data", "toytxt.yaml"), "w") as f:
        f.write(f"""name: toytxt
train_steps: {args.steps}
video_frames: 0
batch_size: {args.batch_size}
image_size: {SIZE}
num_classes: -1
has_text: true
d_context: {D_CONTEXT}
n_context_token: {N_TOKEN}
sample_fid_n: 0
sample_fid_every: 1000000
sample_fid_bs: 4
tar_base: {shard_dir}
val_batch_size: 8
multinode: false
train:
  shards: 'train-{{000000..{n_shards - 1:06d}}}.tar'
  rename:
    latent: img_feature{SIZE}.npy
    caption_feature: caption_feature.npy
""")

    print(f"[2/4] training {args.steps} steps (cross-attention text cond)",
          flush=True)
    from zigma_tpu.cli.train import build_model, main as train_main
    from zigma_tpu.config import load_config

    overrides = [
        "data=toytxt",
        "model.params.in_channels=3", f"model.params.img_dim={SIZE}",
        "model.params.patch_size=2", "model.params.embed_dim=256",
        "model.params.depth=8", "model.params.scan_type=zigzagN8",
        "model.params.use_pe=2", "model.params.use_checkpoint=false",
        "is_latent=false", "log_every=200", "ckpt_every=1000000",
        "ema_rate=0.995", "optim.lr=3e-4",
        "sample_every=1000000", f"results_dir={os.path.join(work, 'runs')}",
    ]
    state = train_main([f"--config-dir={cfg_dir}"] + overrides)

    print("[3/4] position-controlled sampling (50-step Euler ODE)",
          flush=True)
    import jax
    import jax.numpy as jnp

    from zigma_tpu.transport import Sampler, create_transport

    cfg = load_config(cfg_dir, "default", overrides)
    model = build_model(cfg)
    sample_fn = Sampler(create_transport("Linear", "velocity")).sample_ode(
        sampling_method="euler", num_steps=50)

    @jax.jit
    def gen(params, key, y):
        z = jax.random.normal(key, (y.shape[0], 3, SIZE, SIZE))
        return sample_fn(z, lambda x, t: model.apply(params, x, t, y))[-1]

    rng = np.random.default_rng(77)
    targets = rng.uniform(0.2, 0.8, (args.n_sample, 2))
    fakes, n_done = [], 0
    while n_done < args.n_sample:
        nb = min(32, args.n_sample - n_done)
        y = jnp.asarray(np.stack([
            position_caption(cy, cx)
            for cy, cx in targets[n_done:n_done + nb]]))
        fakes.append(np.asarray(gen(
            state.ema_params, jax.random.PRNGKey(500 + n_done), y)))
        n_done += nb
    fakes = np.concatenate(fakes)

    print("[4/4] metrics", flush=True)
    got = blob_centroid(fakes)
    err = float(np.mean(np.linalg.norm(got - targets, axis=-1)))
    # floors/ceilings: the centroid estimator on real data; random placement
    reals = np.stack([make_image(rng, cy, cx) for cy, cx in targets[:256]])
    floor = float(np.mean(np.linalg.norm(
        blob_centroid(reals) - targets[:256], axis=-1)))
    rand = float(np.mean(np.linalg.norm(
        rng.uniform(0.2, 0.8, got.shape) - targets, axis=-1)))

    results = {
        "position_err_model": err,
        "position_err_floor": floor,
        "position_err_random": rand,
        "train_steps": args.steps,
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(results), flush=True)
    with open(os.path.join(out_dir, "toy_text_control.json"), "w") as f:
        json.dump(results, f, indent=2)

    from zigma_tpu.metrics.facade import to_uint8_images
    from PIL import Image

    u8 = np.transpose(to_uint8_images(fakes[:64]), (0, 2, 3, 1))
    grid = u8.reshape(8, 8, SIZE, SIZE, 3).transpose(0, 2, 1, 3, 4)
    Image.fromarray(grid.reshape(8 * SIZE, 8 * SIZE, 3)).save(
        os.path.join(out_dir, "toy_text_control_samples.png"))

    assert err < 0.5 * rand, \
        f"blob position not following the caption: err {err} vs random {rand}"
    return results


if __name__ == "__main__":
    main()
