"""End-to-end CLASS-CONDITIONAL + CFG convergence experiment.

Third conditioning mode (after unconditional ``toy_convergence`` and video
``toy_video_convergence``): 4-class procedural dataset where the class
determines the blob's quadrant -> shards with ``cls_id`` members ->
class-conditional training with CFG label drop (class_dropout_prob=0.1,
exercising the null-class row) -> per-class CFG sampling via
``forward_with_cfg`` -> quadrant-classification accuracy of the samples.

A blob's quadrant is recovered from a sample as the argmax of per-quadrant
high-frequency energy (the background gradient is smooth; the blob is not),
so conditioning fidelity is measurable without any trained classifier.

Usage: python experiments/toy_class_cfg.py [--steps 3000]
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
QUADRANT_CENTERS = [(0.25, 0.25), (0.25, 0.75), (0.75, 0.25), (0.75, 0.75)]


def make_image(rng, cls, size=SIZE):
    """Class determines BOTH the background gradient orientation (a global,
    every-pixel signal — gives the conditioning pathway gradient signal at
    every noise level) and the blob quadrant (what we classify)."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64) / size
    c0, c1 = rng.uniform(0, 0.4, 3), rng.uniform(0.6, 1.0, 3)
    angle = cls * (np.pi / 2) + rng.uniform(-0.5, 0.5)
    g = (np.cos(angle) * xx + np.sin(angle) * yy + 1) / 2
    img = c0[None, None] * (1 - g[..., None]) + c1[None, None] * g[..., None]
    qy, qx = QUADRANT_CENTERS[cls]
    cy, cx = qy + rng.uniform(-0.1, 0.1), qx + rng.uniform(-0.1, 0.1)
    s = rng.uniform(0.06, 0.10)
    blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s**2)))
    img = img + blob[..., None] * rng.choice([-0.9, 0.9], 3)[None, None]
    chw = np.transpose(np.clip(img, 0, 1), (2, 0, 1))
    return (chw * 2 - 1).astype(np.float32)  # (3, h, w) in [-1, 1]


def classify_quadrant(imgs):
    """(N, 3, H, W) -> predicted class by per-quadrant high-freq energy."""
    h = imgs.shape[-1] // 2
    # remove the smooth background: laplacian-ish high-pass
    hp = imgs - (np.roll(imgs, 1, -1) + np.roll(imgs, -1, -1)
                 + np.roll(imgs, 1, -2) + np.roll(imgs, -1, -2)) / 4
    e = np.stack([
        (hp[..., :h, :h] ** 2).mean((-3, -2, -1)),
        (hp[..., :h, h:] ** 2).mean((-3, -2, -1)),
        (hp[..., h:, :h] ** 2).mean((-3, -2, -1)),
        (hp[..., h:, h:] ** 2).mean((-3, -2, -1)),
    ], axis=-1)
    return np.argmax(e, axis=-1)


def write_shards(out_dir, n, shard_size=500, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    tar, idx = None, -1
    classes = rng.integers(0, 4, n)
    for i in range(n):
        if i % shard_size == 0:
            if tar is not None:
                tar.close()
            idx += 1
            tar = tarfile.open(
                os.path.join(out_dir, f"train-{idx:06d}.tar"), "w")
        buf = io.BytesIO()
        np.save(buf, make_image(rng, int(classes[i])))
        for ext, data in ((f"img_feature{SIZE}.npy", buf.getvalue()),
                          ("cls_id.cls", str(int(classes[i])).encode())):
            info = tarfile.TarInfo(f"{i:06d}.{ext}")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    tar.close()
    return idx + 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--n-images", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--n-sample", type=int, default=256)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="zigma_toycls_")
    shard_dir = os.path.join(work, "shards")
    out_dir = os.path.join(REPO, "experiments", "results")
    os.makedirs(out_dir, exist_ok=True)

    t0 = time.time()
    print(f"[1/4] {args.n_images} 4-class quadrant images -> shards",
          flush=True)
    n_shards = write_shards(shard_dir, args.n_images)

    cfg_dir = os.path.join(work, "configs")
    shutil.copytree(os.path.join(REPO, "configs"), cfg_dir)
    with open(os.path.join(cfg_dir, "data", "toycls.yaml"), "w") as f:
        f.write(f"""name: toycls
train_steps: {args.steps}
video_frames: 0
batch_size: {args.batch_size}
image_size: {SIZE}
num_classes: 4
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
    cls_id: cls_id.cls
""")

    print(f"[2/4] training {args.steps} steps "
          f"(class-conditional, label drop 0.1)", flush=True)
    from zigma_tpu.cli.train import build_model, main as train_main
    from zigma_tpu.config import load_config

    overrides = [
        "data=toycls",
        "model.params.in_channels=3", f"model.params.img_dim={SIZE}",
        "model.params.patch_size=2", "model.params.embed_dim=256",
        "model.params.depth=8", "model.params.scan_type=zigzagN8",
        "model.params.use_pe=2", "model.params.use_checkpoint=false",
        "model.params.class_dropout_prob=0.1",
        "is_latent=false", "log_every=200", "ckpt_every=1000000",
        "ema_rate=0.995", "optim.lr=3e-4",
        "sample_every=1000000", f"results_dir={os.path.join(work, 'runs')}",
    ]
    state = train_main([f"--config-dir={cfg_dir}"] + overrides)

    print("[3/4] per-class CFG sampling (50-step Euler ODE)", flush=True)
    import jax
    import jax.numpy as jnp

    from zigma_tpu.models import ZigMa
    from zigma_tpu.transport import Sampler, create_transport

    cfg = load_config(cfg_dir, "default", overrides)
    model = build_model(cfg)
    sample_fn = Sampler(create_transport("Linear", "velocity")).sample_ode(
        sampling_method="euler", num_steps=50)

    @jax.jit
    def gen(params, key, y, cfg_scale):
        z = jax.random.normal(key, (y.shape[0], 3, SIZE, SIZE))
        fwd = lambda x, t: model.apply(params, x, t, y, cfg_scale,
                                       method=ZigMa.forward_with_cfg)
        return sample_fn(z, fwd)[-1]

    per_class = args.n_sample // 4
    accs = {}
    sample_grids = {}
    for cfg_scale in (1.0, 3.0):
        preds, wants, imgs = [], [], []
        for cls in range(4):
            n_done = 0
            while n_done < per_class:
                nb = min(32, per_class - n_done)
                y = jnp.full((nb,), cls, jnp.int32)
                out = np.asarray(gen(
                    state.ema_params,
                    jax.random.PRNGKey(1000 + cls * 100 + n_done),
                    y, cfg_scale))
                preds.append(classify_quadrant(out))
                wants.append(np.full((nb,), cls))
                imgs.append(out)
                n_done += nb
        preds = np.concatenate(preds)
        wants = np.concatenate(wants)
        accs[cfg_scale] = float((preds == wants).mean())
        sample_grids[cfg_scale] = np.concatenate(imgs)
        print(f"  cfg_scale={cfg_scale}: quadrant accuracy "
              f"{accs[cfg_scale]:.3f}", flush=True)

    print("[4/4] report", flush=True)
    # sanity floor: the quadrant classifier itself on real data
    rng = np.random.default_rng(5)
    real_cls = rng.integers(0, 4, 512)
    reals = np.stack([make_image(rng, int(c)) for c in real_cls])
    clf_acc = float((classify_quadrant(reals) == real_cls).mean())

    results = {
        "quadrant_acc_cfg1": accs[1.0],
        "quadrant_acc_cfg3": accs[3.0],
        "quadrant_acc_real_floor": clf_acc,
        "chance": 0.25,
        "train_steps": args.steps,
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(results), flush=True)
    with open(os.path.join(out_dir, "toy_class_cfg.json"), "w") as f:
        json.dump(results, f, indent=2)

    from zigma_tpu.metrics.facade import to_uint8_images
    from PIL import Image

    u8 = to_uint8_images(sample_grids[3.0][:64])
    u8 = np.transpose(u8, (0, 2, 3, 1))
    grid = u8.reshape(8, 8, SIZE, SIZE, 3).transpose(0, 2, 1, 3, 4)
    Image.fromarray(grid.reshape(8 * SIZE, 8 * SIZE, 3)).save(
        os.path.join(out_dir, "toy_class_cfg_samples.png"))

    assert accs[1.0] > 0.6, f"conditioning not learned: acc {accs[1.0]}"
    assert accs[3.0] >= accs[1.0] - 0.05, \
        "CFG guidance should not hurt conditioning fidelity"
    return results


if __name__ == "__main__":
    main()
