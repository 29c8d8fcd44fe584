"""MyMetric facade: choice-gated metric container with the reference's API.

API parity with the reference (reference: my_metrics.py:13-115):

    metric = MyMetric(choices=["fid", "kid"], extractor=...)
    metric.update_real(imgs_uint8)   # (B, C, H, W) uint8 or [0,255] float
    metric.update_fake(samples)
    result = metric.compute()        # {"fid": ..., "kid": ..., "kid_std": ...}
    metric.reset()

Distributed: ``compute(sync=True)`` all-gathers the feature statistics
across JAX processes via multihost_utils (the torchmetrics
``sync_on_compute=True`` equivalent, my_metrics.py:22).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from zigma_tpu.metrics.distributional import inception_score, kid, prdc
from zigma_tpu.metrics.frechet import RunningMoments, frechet_distance

__all__ = ["MyMetric", "VideoMetric", "to_uint8_images"]


def to_uint8_images(arr: np.ndarray) -> np.ndarray:
    """[-1, 1] float images -> uint8 [0, 255], the reference's conversion
    before every metric update (train_acc.py:45, sample_acc.py:319,384-385).
    The feature extractors' input contract is uint8/[0,255] (features.py)."""
    return np.clip(127.5 * np.asarray(arr, np.float32) + 128.0,
                   0, 255).astype(np.uint8)

_KNOWN = ("fid", "sfid", "kid", "is", "prdc", "fdd", "fvd")


class MyMetric:
    """Image-quality metric container.

    choices: subset of fid/sfid/kid/is/prdc/fdd (fvd via VideoMetric).
    extractor: (B, C, H, W) -> (B, F) feature callable (see features.py).
    logits_extractor: only needed for "is".
    """

    def __init__(self, choices: Sequence[str] = ("fid",),
                 extractor: Optional[Callable] = None,
                 logits_extractor: Optional[Callable] = None,
                 kid_subset_size: int = 50, prdc_k: int = 5,
                 max_stored: int = 50_000):
        unknown = set(choices) - set(_KNOWN)
        if unknown:
            raise ValueError(f"unknown metric choices: {unknown}")
        self.choices = list(choices)
        if extractor is None:
            from zigma_tpu.metrics.features import get_extractor

            extractor = get_extractor("inception")
        self.extractor = extractor
        self.logits_extractor = logits_extractor
        self.kid_subset_size = kid_subset_size
        self.prdc_k = prdc_k
        self.max_stored = max_stored
        self.reset()

    # -- accumulation -------------------------------------------------------

    def reset(self):
        self.real_feats: list = []
        self.fake_feats: list = []
        self.fake_logits: list = []
        self.n_real = 0
        self.n_fake = 0
        self.real_mom: Optional[RunningMoments] = None
        self.fake_mom: Optional[RunningMoments] = None

    def _feats(self, imgs):
        f = np.asarray(self.extractor(np.asarray(imgs)))
        assert f.ndim == 2, f.shape
        return f

    def _need_raw(self):
        return any(c in self.choices for c in ("kid", "prdc"))

    def update_real(self, imgs):
        f = self._feats(imgs)
        if self.real_mom is None:
            self.real_mom = RunningMoments(f.shape[1])
        self.real_mom.update(f)
        self.n_real += f.shape[0]
        if self._need_raw() and self.n_real <= self.max_stored:
            self.real_feats.append(f)

    def update_fake(self, imgs):
        f = self._feats(imgs)
        if self.fake_mom is None:
            self.fake_mom = RunningMoments(f.shape[1])
        self.fake_mom.update(f)
        self.n_fake += f.shape[0]
        if self._need_raw() and self.n_fake <= self.max_stored:
            self.fake_feats.append(f)
        if "is" in self.choices:
            if self.logits_extractor is None:
                raise RuntimeError("'is' requires a logits_extractor")
            self.fake_logits.append(np.asarray(self.logits_extractor(imgs)))

    # -- compute -------------------------------------------------------------

    def _gather(self, arrays: list, dim: Optional[int] = None) -> np.ndarray:
        import jax

        if arrays:
            local = np.concatenate(arrays, axis=0)
        else:
            # the empty placeholder must match the other processes' feature
            # dim or process_allgather rejects the mismatched shapes
            if dim is None:
                dim = (self.fake_mom or self.real_mom).dim if (
                    self.fake_mom or self.real_mom) else 1
            local = np.zeros((0, dim), np.float64)
        if jax.process_count() <= 1:
            return local
        from jax.experimental import multihost_utils

        return np.asarray(
            multihost_utils.process_allgather(local)).reshape(
                -1, local.shape[-1])

    def compute(self, sync: bool = True) -> dict:
        import jax

        real_mom, fake_mom = self.real_mom, self.fake_mom
        if sync and jax.process_count() > 1 and real_mom is not None:
            from jax.experimental import multihost_utils

            merged_r = RunningMoments(real_mom.dim)
            merged_f = RunningMoments(fake_mom.dim)
            for mom, merged in ((real_mom, merged_r), (fake_mom, merged_f)):
                st = {k: np.asarray(multihost_utils.process_allgather(v))
                      for k, v in mom.state().items()}
                merged.n = int(st["n"].sum())
                merged.sum = st["sum"].reshape(-1, mom.dim).sum(0)
                merged.outer = st["outer"].reshape(-1, mom.dim, mom.dim).sum(0)
            real_mom, fake_mom = merged_r, merged_f

        out = {}
        if any(c in self.choices for c in ("fid", "sfid", "fdd", "fvd")):
            mu_r, cov_r = real_mom.finalize()
            mu_f, cov_f = fake_mom.finalize()
            fd = frechet_distance(mu_r, cov_r, mu_f, cov_f)
            for c in ("fid", "sfid", "fdd", "fvd"):
                if c in self.choices:
                    out[c] = fd
        if "kid" in self.choices or "prdc" in self.choices:
            real = self._gather(self.real_feats) if sync else (
                np.concatenate(self.real_feats) if self.real_feats else
                np.zeros((0, 1)))
            fake = self._gather(self.fake_feats) if sync else (
                np.concatenate(self.fake_feats) if self.fake_feats else
                np.zeros((0, 1)))
            if "kid" in self.choices:
                m, s = kid(real, fake, subset_size=self.kid_subset_size)
                out["kid"], out["kid_std"] = m, s
            if "prdc" in self.choices:
                out.update(prdc(real, fake, nearest_k=self.prdc_k))
        if "is" in self.choices:
            if sync:
                dim = (self.fake_logits[0].shape[-1]
                       if self.fake_logits else None)
                logits = self._gather(self.fake_logits, dim=dim)
            else:
                logits = np.concatenate(self.fake_logits, axis=0)
            m, s = inception_score(logits)
            out["is"], out["is_std"] = m, s
        return out


class VideoMetric(MyMetric):
    """FVD-style container: videos (B, T, C, H, W) -> video features.

    The reference reshapes videos through a 224-resize then I3D
    (my_metrics.py:58-69); here the extractor owns that mapping:
    extractor(videos) -> (B, F); the inherited update/compute machinery is
    shape-agnostic.
    """

    def __init__(self, extractor: Callable, **kw):
        super().__init__(choices=["fvd"], extractor=extractor, **kw)
