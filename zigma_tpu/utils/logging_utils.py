"""Rank-0 logging + metric sinks (wandb-optional).

Rebuild of the reference's observability layer
(reference: utils/train_utils.py:59-77 create_logger, wandb_utils.py,
train_acc.py:453-490 metric logging).  wandb is optional here (not
installed in zero-egress environments); metrics always also stream to a
JSONL file so runs are inspectable without any service.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional

import numpy as np

__all__ = ["create_logger", "MetricLogger", "array_to_image_grid",
           "write_video_grid"]


def create_logger(log_dir: Optional[str] = None,
                  name: str = "zigma") -> logging.Logger:
    """Rank-0: stdout + file handler; other ranks: null logger
    (utils/train_utils.py:59-77)."""
    import jax

    logger = logging.getLogger(name)
    logger.handlers.clear()
    logger.propagate = False  # avoid double-printing via a configured root
    if jax.process_index() == 0:
        logger.setLevel(logging.INFO)
        fmt = logging.Formatter(
            "[%(asctime)s] %(message)s", datefmt="%Y-%m-%d %H:%M:%S")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger


class MetricLogger:
    """JSONL metric stream + optional wandb mirror.

    Replaces the reference's direct wandb.log calls (train_acc.py:465-490);
    every record lands in ``{run_dir}/metrics.jsonl`` regardless.
    """

    def __init__(self, run_dir: str, use_wandb: bool = False,
                 wandb_kwargs: Optional[dict] = None):
        import jax

        self.is_main = jax.process_index() == 0
        self.run_dir = run_dir
        self._fh = None
        self._wandb = None
        if self.is_main:
            os.makedirs(run_dir, exist_ok=True)
            self._fh = open(os.path.join(run_dir, "metrics.jsonl"), "a")
            if use_wandb:
                try:
                    import wandb

                    self._wandb = wandb
                    wandb.init(**(wandb_kwargs or {}))
                except ImportError:
                    logging.getLogger("zigma").warning(
                        "wandb requested but not installed; JSONL only")

    def log(self, step: int, **metrics):
        if not self.is_main:
            return
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            rec[k] = (float(v) if isinstance(
                v, (int, float, np.floating, np.integer, np.bool_)) else v)
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_media(self, step: int, path: str, key: str = "samples"):
        """Mirror an on-disk visualization artifact to wandb when enabled —
        ``wandb.Video`` for animated files, ``wandb.Image`` otherwise (the
        reference's sample-grid / video logging, train_acc.py:608-631,
        wandb_utils.py:91-113).  The file on disk is already the primary
        artifact; without wandb this is a no-op."""
        if self._wandb is None or not self.is_main:
            return
        media = (self._wandb.Video(path)
                 if path.endswith((".gif", ".mp4", ".webm"))
                 else self._wandb.Image(path))
        self._wandb.log({key: media}, step=step)

    def close(self):
        if self._fh:
            self._fh.close()


def array_to_image_grid(x: np.ndarray, pad: int = 2) -> np.ndarray:
    """(B, C, H, W) in [-1, 1] -> one (H', W', 3) uint8 grid image
    (the reference's array2grid_pixel, wandb_utils.py:108-113)."""
    x = np.asarray(x)
    x = np.clip((x + 1) / 2, 0, 1)
    B, C, H, W = x.shape
    cols = int(np.ceil(np.sqrt(B)))
    rows = int(np.ceil(B / cols))
    grid = np.ones((rows * (H + pad) - pad, cols * (W + pad) - pad, 3))
    for i in range(B):
        r, c = divmod(i, cols)
        img = np.transpose(x[i], (1, 2, 0))
        if C == 1:
            img = np.repeat(img, 3, axis=-1)
        elif C > 3:
            img = img[..., :3]
        grid[r * (H + pad):r * (H + pad) + H,
             c * (W + pad):c * (W + pad) + W] = img
    return (grid * 255).astype(np.uint8)


def write_video_grid(videos: np.ndarray, path: str, fps: int = 4) -> str:
    """(B, T, C, H, W) in [-1, 1] -> one animated GIF: each GIF frame is
    the B-sample grid at that timestep.

    The reference logs ``wandb.Video`` grids for video runs
    (train_acc.py:608-631, wandb_utils.py:91-113); this is the
    dependency-free artifact equivalent (PIL GIF) for zero-egress runs —
    the MetricLogger wandb mirror can ship the same file when enabled.
    Returns ``path``.
    """
    from PIL import Image

    v = np.asarray(videos)
    if v.ndim != 5:
        raise ValueError(f"expected (B, T, C, H, W) videos, got {v.shape}")
    frames = [Image.fromarray(array_to_image_grid(v[:, t]))
              for t in range(v.shape[1])]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=max(int(1000 / fps), 1), loop=0)
    return path


def pos_embed_similarity_grid(pos_embed: np.ndarray, img_dim: int,
                              anchors: int = 16) -> np.ndarray:
    """Cosine-similarity maps of learned positional embeddings.

    The reference's PE visualization (wandb_utils.py:115-160) plots, for a
    grid of anchor tokens, the cosine similarity between the anchor's
    embedding and every other token's, reshaped to the (H, W) token grid —
    a frozen-sincos PE shows smooth distance falloff, a healthy learned PE
    should too.

    pos_embed: (L, D) with L == img_dim**2 (a leading length-1 axis is
    squeezed).  Returns an (H', W', 3) uint8 grid image of ``anchors`` maps.
    """
    pe = np.asarray(pos_embed, np.float32)
    if pe.ndim == 3 and pe.shape[0] == 1:
        pe = pe[0]
    L, _ = pe.shape
    if L != img_dim * img_dim:
        raise ValueError(f"pos_embed length {L} != {img_dim}^2")
    pe = pe / np.maximum(np.linalg.norm(pe, axis=-1, keepdims=True), 1e-8)
    side = int(np.ceil(np.sqrt(anchors)))
    # anchors evenly spread over the token grid
    coords = np.linspace(0, img_dim - 1, side).round().astype(int)
    maps = []
    for r in coords:
        for c in coords:
            sim = pe @ pe[r * img_dim + c]            # (L,) in [-1, 1]
            maps.append(sim.reshape(img_dim, img_dim))
    maps = np.stack(maps)[:, None]                    # (A, 1, H, W)
    return array_to_image_grid(maps)
