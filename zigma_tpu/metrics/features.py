"""Pluggable feature extractors for the Fréchet/KID/PRDC metrics.

The reference depends on downloaded pretrained networks: InceptionV3
(torch-fidelity weights) for FID/sFID/KID/IS, DINOv2 ViT via torch.hub for
FDD, the StyleGAN-V I3D TorchScript model for FVD, and AlexNet/VGG LPIPS
(reference: utils/torchmetric_fdd.py:82-91, utils/torchmetric_fvd.py:169-186,
my_metrics.py:13-115).

This rebuild keeps the metric *math* exact and makes the feature network a
plug-in, because pretrained weights may not be present (and this build
environment has zero egress).  Resolution order:

1. An extractor callable you register/pass explicitly.
2. The native JAX networks (metrics/{inception,dinov2,i3d}_jax.py) fed from
   locally cached torch state dicts — feature extraction on the
   accelerator.
3. Cached TorchScript / torch.hub archives on host CPU.
4. Otherwise ``get_extractor`` raises with a clear message — FID computed
   with a *different* feature net is not comparable to published numbers,
   so silently substituting one would be worse than failing.

Input contract (IDENTICAL for every resolution path of a given name, the
torch fallbacks wrap the same preprocessing as the JAX nets):

- ``inception*`` / ``dinov2``: (B, C, H, W) uint8 or float in **[0, 255]**
  (the reference's torchmetrics contract, my_metrics.py:118-129).
- ``i3d``: (B, T, H, W, C) uint8 video in [0, 255]; resize/crop/scaling to
  the I3D input happens inside.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional

import numpy as np

__all__ = ["register_extractor", "get_extractor", "available_extractors",
           "patch_statistics_extractor", "video_patch_statistics_extractor"]

_REGISTRY: dict = {}


def register_extractor(name: str, fn: Callable[[np.ndarray], np.ndarray]):
    """Register a feature extractor: (B, C, H, W) uint8/float -> (B, F)."""
    _REGISTRY[name] = fn


def available_extractors():
    return sorted(_REGISTRY)


def patch_statistics_extractor(patch: int = 8):
    """Weight-free fallback features (mean/std over a patch grid).

    NOT comparable to Inception features — intended only for smoke tests
    and relative tracking during training when no pretrained weights exist.
    """

    def extract(imgs: np.ndarray) -> np.ndarray:
        x = np.asarray(imgs, np.float64)
        if x.ndim == 3:
            x = x[None]
        B, C, H, W = x.shape
        ph, pw = H // patch, W // patch
        x = x[:, :, : ph * patch, : pw * patch]
        x = x.reshape(B, C, ph, patch, pw, patch)
        mean = x.mean(axis=(3, 5)).reshape(B, -1)
        std = x.std(axis=(3, 5)).reshape(B, -1)
        return np.concatenate([mean, std], axis=1)

    return extract


def video_patch_statistics_extractor(patch: int = 8):
    """Weight-free video features: per-frame patch statistics pooled over
    time plus mean |temporal delta| (so motion differences register, which
    frame-pooled statistics alone would miss).

    Input: (B, T, H, W, C) videos (the VideoMetric extractor contract).
    NOT comparable to I3D FVD features — the degraded-tracking analogue of
    ``patch_statistics_extractor`` for video runs without cached weights.
    """
    frame_fn = patch_statistics_extractor(patch)

    def extract(videos: np.ndarray) -> np.ndarray:
        v = np.asarray(videos, np.float64)
        if v.ndim != 5:
            raise ValueError(
                f"expected (B, T, H, W, C) videos, got shape {v.shape}")
        B, T = v.shape[:2]
        # (B, T, H, W, C) -> (B*T, C, H, W) for the image extractor
        frames = v.transpose(0, 1, 4, 2, 3).reshape(
            B * T, v.shape[4], v.shape[2], v.shape[3])
        f = frame_fn(frames).reshape(B, T, -1)
        delta = (np.abs(np.diff(f, axis=1)).mean(axis=1) if T > 1
                 else np.zeros_like(f[:, 0]))
        return np.concatenate([f.mean(axis=1), delta], axis=1)

    return extract


# ---------------------------------------------------------------------------
# weight-cache probing (shared by every native-JAX path)
# ---------------------------------------------------------------------------


def _weight_candidates(env_var: str, match: Callable[[str], bool],
                       extra_roots: Iterable[str] = ()) -> Iterable[str]:
    """Yield candidate weight files: the env-var override first, then any
    matching file under the torch hub cache (and ``extra_roots``)."""
    explicit = os.environ.get(env_var)
    if explicit:
        yield explicit
    roots = list(extra_roots)
    try:
        import torch

        roots.append(torch.hub.get_dir())
    except Exception:
        pass
    for r in roots:
        if not os.path.isdir(r):
            continue
        for root, _, files in os.walk(r):
            for f in files:
                if match(f.lower()) and f.endswith((".pt", ".pth")):
                    yield os.path.join(root, f)


def _load_converted(env_var: str, match: Callable[[str], bool],
                    convert: Callable, extra_roots: Iterable[str] = ()):
    """torch.load each candidate and run it through ``convert``; the first
    one that converts cleanly wins.  TorchScript archives and unrelated
    checkpoints fail conversion and are skipped."""
    for cand in _weight_candidates(env_var, match, extra_roots):
        try:
            import torch

            sd = torch.load(cand, map_location="cpu", weights_only=True)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            return convert(sd)
        except Exception:
            continue
    return None


def _try_jax_inception(feature: str) -> Optional[Callable]:
    """Native JAX FID-InceptionV3 (runs on TPU) from a locally cached raw
    state dict.  feature: '2048' (FID/KID/PRDC), '768' (sFID),
    'logits_unbiased' (IS)."""
    from zigma_tpu.metrics import inception_jax

    params = _load_converted(
        "ZIGMA_INCEPTION_WEIGHTS", lambda f: "inception" in f,
        inception_jax.load_torch_state_dict,
        extra_roots=[os.path.expanduser("~/.cache/torch_fidelity")])
    if params is None:
        return None
    return inception_jax.inception_extractor(params, feature=feature)


def _try_jax_i3d() -> Optional[Callable]:
    """Native JAX InceptionI3d (FVD logits on TPU) from a locally cached
    raw state dict (``i3d_pretrained_400`` family) — the videogpt FVD
    flavor (shorter-side resize + crop + [-1, 1] preprocessing)."""
    from zigma_tpu.metrics import i3d_jax

    params = _load_converted("ZIGMA_I3D_WEIGHTS", lambda f: "i3d" in f,
                             i3d_jax.load_torch_state_dict)
    if params is None:
        return None
    return i3d_jax.i3d_extractor(params)


def _try_jax_i3d_styleganv() -> Optional[Callable]:
    """StyleGAN-V FVD flavor: weights from a locally cached
    ``i3d_torchscript.pt`` archive (the reference's gating detector,
    utils/torchmetric_fvd.py:169-186) + the gating preprocessing
    (aspect-distorting 224 resize, values left in [0, 255])."""
    from zigma_tpu.convert.torchscript_i3d import convert_torchscript_i3d
    from zigma_tpu.metrics import i3d_jax

    import os

    explicit = os.environ.get("ZIGMA_I3D_TORCHSCRIPT")
    for cand in _weight_candidates("ZIGMA_I3D_TORCHSCRIPT",
                                   lambda f: "i3d" in f):
        # cache-scan candidates must actually BE TorchScript archives:
        # the converter's torch.load fallback would happily convert the
        # videogpt raw state dict (i3d_pretrained_400.pt), silently pairing
        # videogpt weights with the styleganv gating preprocessing — the
        # exact flavor mix-up the detector pinning exists to prevent.  An
        # explicitly pointed-at file (env var) is trusted as styleganv.
        if cand != explicit:
            try:
                import torch

                cand = torch.jit.load(cand, map_location="cpu")
            except Exception:
                continue
        try:
            params = convert_torchscript_i3d(cand)
        except Exception:
            continue
        return i3d_jax.styleganv_extractor(params)
    return None


def _try_jax_dinov2() -> Optional[Callable]:
    """Native JAX DINOv2 ViT-L/14 (FDD features on TPU) from a locally
    cached state dict (``dinov2_vitl14_pretrain.pth`` family)."""
    from zigma_tpu.metrics import dinov2_jax

    params = _load_converted(
        "ZIGMA_DINOV2_WEIGHTS",
        lambda f: "dinov2" in f and "vitl14" in f,
        lambda sd: dinov2_jax.load_torch_state_dict(sd, arch="vitl14"))
    if params is None:
        return None
    return dinov2_jax.dinov2_extractor(params, arch="vitl14")


# ---------------------------------------------------------------------------
# host-torch fallbacks — SAME input contract as the JAX paths
# ---------------------------------------------------------------------------


def _try_torch_inception() -> Optional[Callable]:
    """torch-fidelity FID-Inception TorchScript archive on host CPU.
    Input: (B, C, H, W) uint8/[0,255] float (the archive vasserts uint8)."""
    try:
        import torch

        hub_dir = torch.hub.get_dir()
        candidates = []
        if os.path.isdir(hub_dir):
            for root, _, files in os.walk(hub_dir):
                candidates += [
                    os.path.join(root, f) for f in files
                    if "inception" in f.lower()
                    and f.endswith((".pt", ".pts", ".pth"))]
        for cand in candidates:
            try:
                net = torch.jit.load(cand).eval()
            except Exception:
                continue  # a raw state dict (.pth), not TorchScript

            def extract(imgs: np.ndarray) -> np.ndarray:
                with torch.no_grad():
                    t = torch.from_numpy(
                        np.asarray(imgs).astype(np.uint8))
                    return net(t).numpy()

            return extract
        return None
    except Exception:
        return None


def _try_torch_dinov2() -> Optional[Callable]:
    """torch.hub DINOv2 on host CPU, wrapped with the SAME preprocessing
    as the JAX path: bicubic resize to 224 + ImageNet normalization
    (reference: utils/torchmetric_fdd.py:93-105)."""
    try:
        import torch

        net = torch.hub.load("facebookresearch/dinov2", "dinov2_vitl14",
                             trust_repo=True, skip_validation=True,
                             verbose=False).eval()
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

        def extract(imgs: np.ndarray) -> np.ndarray:
            with torch.no_grad():
                t = torch.from_numpy(np.asarray(imgs)).float() / 255.0
                t = torch.nn.functional.interpolate(
                    t, size=(224, 224), mode="bicubic",
                    align_corners=False)
                return net((t - mean) / std).numpy()

        return extract
    except Exception:
        return None


def _try_torch_i3d() -> Optional[Callable]:
    """StyleGAN-V I3D TorchScript on host CPU, wrapped with the SAME
    uint8-video contract as the JAX path (fvd preprocessing inside;
    reference: utils/torchmetric_fvd.py:169-186)."""
    try:
        import torch

        hub_dir = torch.hub.get_dir()
        for root, _, files in os.walk(hub_dir):
            for f in files:
                if "i3d" in f.lower() and f.endswith((".pt", ".pts")):
                    net = torch.jit.load(os.path.join(root, f)).eval()

                    def extract(videos: np.ndarray) -> np.ndarray:
                        from zigma_tpu.metrics.i3d_jax import fvd_preprocess

                        x = np.asarray(fvd_preprocess(videos))
                        with torch.no_grad():
                            return net(torch.from_numpy(x)).numpy()

                    return extract
    except Exception:
        pass
    return None


def get_extractor(name: str = "inception") -> Callable:
    """Resolve a named extractor; see module docstring for the order and
    the per-name input contracts."""
    if name in _REGISTRY:
        return _REGISTRY[name]
    if name == "patch_stats":
        fn = patch_statistics_extractor()
        _REGISTRY[name] = fn
        return fn
    if name in ("inception", "inception_sfid", "inception_logits"):
        # native JAX net first (feature extraction on the accelerator),
        # then a cached TorchScript archive on host CPU
        feature = {"inception": "2048", "inception_sfid": "768",
                   "inception_logits": "logits_unbiased"}[name]
        fn = _try_jax_inception(feature)
        if fn is None and name == "inception":
            fn = _try_torch_inception()
        if fn is not None:
            _REGISTRY[name] = fn
            return fn
    if name == "dinov2":
        # FDD features (reference: utils/torchmetric_fdd.py:82-91)
        fn = _try_jax_dinov2() or _try_torch_dinov2()
        if fn is not None:
            _REGISTRY[name] = fn
            return fn
    if name == "i3d":
        # videogpt-flavor FVD features
        # (reference: video_metrics/fvd/videogpt/fvd.py:8-19)
        fn = _try_jax_i3d() or _try_torch_i3d()
        if fn is not None:
            _REGISTRY[name] = fn
            return fn
    if name == "i3d_styleganv":
        # the reference's GATING FVD detector: the StyleGAN-V TorchScript
        # archive + my_metrics.py:58-69 preprocessing
        # (reference: utils/torchmetric_fvd.py:169-186)
        fn = _try_jax_i3d_styleganv()
        if fn is not None:
            _REGISTRY[name] = fn
            return fn
    raise RuntimeError(
        f"feature extractor {name!r} is unavailable: no registered callable "
        f"and no local pretrained weights found. Register one with "
        f"zigma_tpu.metrics.register_extractor({name!r}, fn) — fn maps "
        f"(B, C, H, W) images to (B, F) features. For smoke tests use "
        f"'patch_stats' (weight-free, NOT comparable to published FID).")
