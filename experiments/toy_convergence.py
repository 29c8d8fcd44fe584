"""End-to-end convergence experiment on real hardware.

Exercises the ENTIRE stack — procedural dataset -> ``prepare_data`` shard
writing -> webdataset pipeline (C++ tar fast path) -> pixel-space ZigMa
training with EMA -> 50-step ODE sampling -> patch-statistics FID — and
verifies the model actually LEARNS the data distribution: the FID of EMA
samples against held-out reals must land far below the FID of gaussian
noise and approach the real-vs-real sampling floor.

No pretrained weights are involved anywhere (pixel space, weight-free
patch-statistics features), so this runs in the zero-egress environment
on a single chip.  Results land in ``experiments/results/``.

Usage: python experiments/toy_convergence.py [--steps 4000] [--n-images 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_dataset(root: str, n: int, size: int = 32, seed: int = 0):
    """Procedural images with learnable structure: 1-3 colored gaussian
    blobs on a smooth two-color gradient background."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64) / size
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        c0, c1 = rng.uniform(0, 0.5, 3), rng.uniform(0.5, 1.0, 3)
        angle = rng.uniform(0, 2 * np.pi)
        t = (np.cos(angle) * xx + np.sin(angle) * yy + 1) / 2
        img = c0[None, None] * (1 - t[..., None]) + c1[None, None] * t[..., None]
        for _ in range(rng.integers(1, 4)):
            cy, cx = rng.uniform(0.2, 0.8, 2)
            s = rng.uniform(0.05, 0.2)
            blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s**2)))
            img += blob[..., None] * rng.uniform(-0.8, 0.8, 3)[None, None]
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(root, f"{i:06d}.png"))


def image_grid(arrs, path, cols=16):
    """uint8 (N, H, W, 3) -> one grid PNG."""
    from PIL import Image

    n, h, w, _ = arrs.shape
    rows = (n + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, a in enumerate(arrs):
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = a
    Image.fromarray(grid).save(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--n-images", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--n-sample", type=int, default=512)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="zigma_toy_")
    img_dir = os.path.join(work, "images")
    shard_dir = os.path.join(work, "shards")
    out_dir = os.path.join(REPO, "experiments", "results")
    os.makedirs(out_dir, exist_ok=True)

    t0 = time.time()
    print(f"[1/5] dataset: {args.n_images} procedural 32x32 images", flush=True)
    make_dataset(img_dir, args.n_images)

    print("[2/5] shard prep (identity codec, pixel space)", flush=True)
    from zigma_tpu.cli import prepare_data

    sys.argv = ["prepare_data", "--images", img_dir, "--out", shard_dir,
                "--image-size", "32", "--shard-size", "500",
                "--codec", "identity"]
    prepare_data.main()
    n_shards = len([f for f in os.listdir(shard_dir) if f.endswith(".tar")])

    # config dir: repo configs + a toy data group
    cfg_dir = os.path.join(work, "configs")
    shutil.copytree(os.path.join(REPO, "configs"), cfg_dir)
    with open(os.path.join(cfg_dir, "data", "toy.yaml"), "w") as f:
        f.write(f"""name: toy
train_steps: {args.steps}
sample_vis_n: 1
sample_vis_every: 1000000
video_frames: 0
batch_size: {args.batch_size}
image_size: 32
num_classes: -1
sample_fid_n: 0
sample_fid_every: 1000000
sample_fid_bs: 4
tar_base: {shard_dir}
val_batch_size: 8
multinode: false
train:
  shards: 'train-{{000000..{n_shards - 1:06d}}}.tar'
  rename:
    latent: img_feature32.npy
""")

    print(f"[3/5] training {args.steps} steps (pixel-space ZigMa-XS)",
          flush=True)
    from zigma_tpu.cli.train import build_model, main as train_main
    from zigma_tpu.config import load_config

    # ema_rate 0.9999 (the reference default, right for 400k-step runs) keeps
    # 0.9999^4000 ~ 67% of the random init after a 4000-step toy run — the EMA
    # would sample pure noise regardless of learning.  Use a half-life
    # appropriate for the run length.
    overrides = [
        "data=toy",
        "model.params.in_channels=3", "model.params.img_dim=32",
        "model.params.patch_size=2", "model.params.embed_dim=256",
        "model.params.depth=8", "model.params.scan_type=zigzagN8",
        "model.params.use_pe=2", "model.params.use_checkpoint=false",
        "is_latent=false", "log_every=200", "ckpt_every=1000000",
        "ema_rate=0.995",
        "sample_every=1000000", f"results_dir={os.path.join(work, 'runs')}",
    ]
    state = train_main([f"--config-dir={cfg_dir}"] + overrides)

    print("[4/5] sampling with the EMA weights (50-step Euler ODE)",
          flush=True)
    import jax
    import jax.numpy as jnp

    from zigma_tpu.transport import Sampler, create_transport

    cfg = load_config(cfg_dir, "default", overrides)
    model = build_model(cfg)
    sample_fn = Sampler(create_transport("Linear", "velocity")).sample_ode(
        sampling_method="euler", num_steps=50)

    @jax.jit
    def gen(params, key):
        z = jax.random.normal(key, (64, 3, 32, 32))
        return sample_fn(z, lambda x, t: model.apply(params, x, t))[-1]

    def batched_gen(params, seed0):
        out = []
        for i in range(args.n_sample // 64):
            out.append(np.asarray(gen(params, jax.random.PRNGKey(seed0 + i))))
        return np.concatenate(out)  # [-1, 1]

    fakes = batched_gen(state.ema_params, 100)
    fakes_raw = batched_gen(state.params, 100)

    # SDE path (Euler–Maruyama, sigma form + Mean last step — the
    # reference's shipped SDE config) from the same EMA weights
    sde_fn = Sampler(create_transport("Linear", "velocity")).sample_sde(
        sampling_method="Euler", diffusion_form="sigma",
        last_step="Mean", last_step_size=0.04, num_steps=50)

    @jax.jit
    def gen_sde(params, key):
        kz, ks = jax.random.split(key)
        z = jax.random.normal(kz, (64, 3, 32, 32))
        return sde_fn(ks, z, lambda x, t: model.apply(params, x, t))[-1]

    fakes_sde = np.concatenate([
        np.asarray(gen_sde(state.ema_params, jax.random.PRNGKey(300 + i)))
        for i in range(args.n_sample // 64)])

    print("[5/5] metrics (patch-statistics FID)", flush=True)
    from PIL import Image

    from zigma_tpu.metrics import MyMetric, patch_statistics_extractor
    from zigma_tpu.metrics.facade import to_uint8_images

    files = sorted(os.listdir(img_dir))
    reals = np.stack([
        np.asarray(Image.open(os.path.join(img_dir, f)))
        for f in files[:2 * args.n_sample]])          # (N, H, W, 3) uint8
    reals = np.transpose(reals, (0, 3, 1, 2))
    half = args.n_sample

    ex = patch_statistics_extractor()

    def fid(a, b):
        m = MyMetric(choices=["fid"], extractor=ex)
        m.update_real(a)
        m.update_fake(b)
        return m.compute(sync=False)["fid"]

    fake_u8 = to_uint8_images(fakes)
    noise_u8 = to_uint8_images(
        np.random.default_rng(7).uniform(-1, 1, fakes.shape))
    results = {
        "fid_model_vs_real": fid(reals[:half], fake_u8),
        "fid_raw_model_vs_real": fid(reals[:half], to_uint8_images(fakes_raw)),
        "fid_sde_model_vs_real": fid(reals[:half],
                                     to_uint8_images(fakes_sde)),
        "fid_noise_vs_real": fid(reals[:half], noise_u8),
        "fid_real_vs_real": fid(reals[:half], reals[half:half * 2]),
        "train_steps": args.steps,
        "n_train_images": args.n_images,
        "n_sampled": int(fakes.shape[0]),
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(results), flush=True)

    with open(os.path.join(out_dir, "toy_convergence.json"), "w") as f:
        json.dump(results, f, indent=2)
    image_grid(np.transpose(fake_u8[:128], (0, 2, 3, 1)),
               os.path.join(out_dir, "toy_samples.png"))
    image_grid(np.transpose(reals[:128], (0, 2, 3, 1)),
               os.path.join(out_dir, "toy_reals.png"))
    print(f"results + grids in {out_dir}", flush=True)

    assert results["fid_model_vs_real"] < 0.5 * results["fid_noise_vs_real"], \
        "model samples are no closer to the data than noise — not learning"
    assert results["fid_sde_model_vs_real"] < \
        0.5 * results["fid_noise_vs_real"], "SDE sampling path not learning"
    return results


if __name__ == "__main__":
    main()
