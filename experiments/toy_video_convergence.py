"""End-to-end VIDEO convergence experiment on real hardware.

The video analogue of ``toy_convergence.py``: procedural moving-blob clips
-> hand-written ``frame_feature256.npy`` webdataset shards -> video
pipeline (``is_video``) -> pixel-space ZigMa training with the factorized
spatial/temporal scan (``zzvideo_sst``) -> 50-step ODE sampling -> frame
patch-statistics FID + temporal-smoothness check.

Verifies the full video stack LEARNS: (a) per-frame sample FID far below
noise FID, and (b) samples move like the data — mean inter-frame distance
near the real value, far from noise's (a still/video-agnostic model fails
(b) even with good frames).

Pixel space, weight-free features: runs in the zero-egress environment on
one chip.  Results land in ``experiments/results/``.

Usage: python experiments/toy_video_convergence.py [--steps 3000]
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

T_FRAMES = 4
SIZE = 16


def make_video(rng, size=SIZE, t_frames=T_FRAMES):
    """One clip: a colored gaussian blob moving with constant velocity over
    a static two-color gradient. (t, 3, h, w) float32 in [-1, 1]."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64) / size
    c0, c1 = rng.uniform(0, 0.4, 3), rng.uniform(0.6, 1.0, 3)
    angle = rng.uniform(0, 2 * np.pi)
    g = (np.cos(angle) * xx + np.sin(angle) * yy + 1) / 2
    bg = c0[None, None] * (1 - g[..., None]) + c1[None, None] * g[..., None]
    cy, cx = rng.uniform(0.25, 0.75, 2)
    vy, vx = rng.uniform(-0.12, 0.12, 2)
    s = rng.uniform(0.08, 0.16)
    color = rng.uniform(-0.8, 0.8, 3)
    frames = []
    for t in range(t_frames):
        py, px = cy + vy * t, cx + vx * t
        blob = np.exp(-(((yy - py) ** 2 + (xx - px) ** 2) / (2 * s**2)))
        img = np.clip(bg + blob[..., None] * color[None, None], 0, 1)
        frames.append(np.transpose(img, (2, 0, 1)))
    return (np.stack(frames) * 2 - 1).astype(np.float32)  # (t, 3, h, w)


def write_shards(out_dir, n, shard_size=500, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    tar = None
    idx = -1
    for i in range(n):
        if i % shard_size == 0:
            if tar is not None:
                tar.close()
            idx += 1
            tar = tarfile.open(
                os.path.join(out_dir, f"train-{idx:06d}.tar"), "w")
        buf = io.BytesIO()
        np.save(buf, make_video(rng))
        data = buf.getvalue()
        info = tarfile.TarInfo(f"{i:06d}.frame_feature256.npy")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
    tar.close()
    return idx + 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--n-videos", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--n-sample", type=int, default=256)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="zigma_toyvid_")
    shard_dir = os.path.join(work, "shards")
    out_dir = os.path.join(REPO, "experiments", "results")
    os.makedirs(out_dir, exist_ok=True)

    t0 = time.time()
    print(f"[1/4] {args.n_videos} procedural {T_FRAMES}x{SIZE}x{SIZE} clips "
          f"-> shards", flush=True)
    n_shards = write_shards(shard_dir, args.n_videos)

    cfg_dir = os.path.join(work, "configs")
    shutil.copytree(os.path.join(REPO, "configs"), cfg_dir)
    with open(os.path.join(cfg_dir, "data", "toyvid.yaml"), "w") as f:
        f.write(f"""name: toyvid
train_steps: {args.steps}
video_frames: {T_FRAMES}
is_video: true
batch_size: {args.batch_size}
image_size: {SIZE}
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
    frame_feature256: frame_feature256.npy
""")

    print(f"[2/4] training {args.steps} steps (zzvideo_sst ZigMa-XS)",
          flush=True)
    from zigma_tpu.cli.train import build_model, main as train_main
    from zigma_tpu.config import load_config

    overrides = [
        "data=toyvid",
        "model.params.in_channels=3", f"model.params.img_dim={SIZE}",
        "model.params.patch_size=2", "model.params.embed_dim=256",
        "model.params.depth=8", "model.params.scan_type=zzvideo_sst",
        "model.params.use_pe=2", "model.params.tpe=true",
        "model.params.use_checkpoint=false",
        "is_latent=false", "log_every=200", "ckpt_every=1000000",
        "ema_rate=0.995",
        "sample_every=1000000", f"results_dir={os.path.join(work, 'runs')}",
    ]
    state = train_main([f"--config-dir={cfg_dir}"] + overrides)

    print("[3/4] sampling with the EMA weights (50-step Euler ODE)",
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
        z = jax.random.normal(key, (32, T_FRAMES, 3, SIZE, SIZE))
        return sample_fn(z, lambda x, t: model.apply(params, x, t))[-1]

    fakes = []
    for i in range(args.n_sample // 32):
        fakes.append(np.asarray(
            gen(state.ema_params, jax.random.PRNGKey(100 + i))))
    fakes = np.concatenate(fakes)  # (N, T, 3, H, W) in [-1, 1]

    print("[4/4] metrics", flush=True)
    from zigma_tpu.metrics import MyMetric, patch_statistics_extractor
    from zigma_tpu.metrics.facade import to_uint8_images

    rng = np.random.default_rng(123)
    reals = np.stack([make_video(rng) for _ in range(2 * args.n_sample)])
    noise = np.random.default_rng(7).uniform(
        -1, 1, fakes.shape).astype(np.float32)

    ex = patch_statistics_extractor()

    def frame_fid(a, b):
        m = MyMetric(choices=["fid"], extractor=ex)
        m.update_real(to_uint8_images(a.reshape(-1, 3, SIZE, SIZE)))
        m.update_fake(to_uint8_images(b.reshape(-1, 3, SIZE, SIZE)))
        return m.compute(sync=False)["fid"]

    def motion(v):
        """Mean abs inter-frame difference — how much the clips move."""
        return float(np.mean(np.abs(np.diff(v, axis=1))))

    half = args.n_sample
    results = {
        "frame_fid_model_vs_real": frame_fid(reals[:half], fakes),
        "frame_fid_noise_vs_real": frame_fid(reals[:half], noise),
        "frame_fid_real_vs_real": frame_fid(reals[:half], reals[half:]),
        "motion_real": motion(reals[:half]),
        "motion_model": motion(fakes),
        "motion_noise": motion(noise),
        "train_steps": args.steps,
        "n_train_videos": args.n_videos,
        "n_sampled": int(fakes.shape[0]),
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(results), flush=True)
    with open(os.path.join(out_dir, "toy_video_convergence.json"), "w") as f:
        json.dump(results, f, indent=2)

    # grid: first 16 clips, frames left-to-right
    from PIL import Image

    u8 = to_uint8_images(fakes[:16].reshape(-1, 3, SIZE, SIZE))
    u8 = np.transpose(u8, (0, 2, 3, 1)).reshape(16, T_FRAMES, SIZE, SIZE, 3)
    grid = u8.transpose(0, 2, 1, 3, 4).reshape(16 * SIZE, T_FRAMES * SIZE, 3)
    Image.fromarray(grid).save(
        os.path.join(out_dir, "toy_video_samples.png"))

    assert results["frame_fid_model_vs_real"] < \
        0.5 * results["frame_fid_noise_vs_real"], "frames no better than noise"
    err_model = abs(results["motion_model"] - results["motion_real"])
    err_noise = abs(results["motion_noise"] - results["motion_real"])
    assert err_model < 0.5 * err_noise, "sample motion no closer than noise"
    return results


if __name__ == "__main__":
    main()
