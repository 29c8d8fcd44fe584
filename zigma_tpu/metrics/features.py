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
2. Known local weight caches (torch hub / torch-fidelity / HF hub) loaded
   through torch (CPU) — bit-compatible with the reference's features.
3. Otherwise ``get_extractor`` raises with a clear message — FID computed
   with a *different* feature net is not comparable to published numbers,
   so silently substituting one would be worse than failing.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

__all__ = ["register_extractor", "get_extractor", "available_extractors",
           "patch_statistics_extractor"]

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


def _inception_weight_candidates():
    """Local paths that may hold the FID InceptionV3 weights
    (``pt_inception-2015-12-05`` family) as a raw torch state dict."""
    explicit = os.environ.get("ZIGMA_INCEPTION_WEIGHTS")
    if explicit:
        yield explicit
    roots = [os.path.expanduser("~/.cache/torch_fidelity")]
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
                if "inception" in f.lower() and f.endswith((".pth", ".pt")):
                    yield os.path.join(root, f)


def _try_jax_inception(feature: str) -> Optional[Callable]:
    """Native JAX FID-InceptionV3 (runs on TPU) from a locally cached raw
    state dict.  feature: '2048' (FID/KID/PRDC), '768' (sFID),
    'logits_unbiased' (IS)."""
    from zigma_tpu.metrics import inception_jax

    for cand in _inception_weight_candidates():
        try:
            import torch

            sd = torch.load(cand, map_location="cpu", weights_only=True)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            params = inception_jax.load_torch_state_dict(sd)
        except Exception:
            continue  # TorchScript archive / unrelated checkpoint
        return inception_jax.inception_extractor(params, feature=feature)
    return None


def _try_jax_i3d() -> Optional[Callable]:
    """Native JAX InceptionI3d (FVD logits on TPU) from a locally cached
    raw state dict (``i3d_pretrained_400`` family)."""
    from zigma_tpu.metrics import i3d_jax

    paths = []
    explicit = os.environ.get("ZIGMA_I3D_WEIGHTS")
    if explicit:
        paths.append(explicit)
    try:
        import torch

        hub = torch.hub.get_dir()
        if os.path.isdir(hub):
            for root, _, files in os.walk(hub):
                paths += [os.path.join(root, f) for f in files
                          if "i3d" in f.lower()
                          and f.endswith((".pt", ".pth"))]
    except Exception:
        pass
    for cand in paths:
        try:
            import torch

            sd = torch.load(cand, map_location="cpu", weights_only=True)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            params = i3d_jax.load_torch_state_dict(sd)
        except Exception:
            continue
        return i3d_jax.i3d_extractor(params)
    return None


def _try_jax_dinov2() -> Optional[Callable]:
    """Native JAX DINOv2 ViT-L/14 (FDD features on TPU) from a locally
    cached state dict (``dinov2_vitl14_pretrain.pth`` family)."""
    from zigma_tpu.metrics import dinov2_jax

    paths = []
    explicit = os.environ.get("ZIGMA_DINOV2_WEIGHTS")
    if explicit:
        paths.append(explicit)
    try:
        import torch

        hub = torch.hub.get_dir()
        if os.path.isdir(hub):
            for root, _, files in os.walk(hub):
                paths += [os.path.join(root, f) for f in files
                          if "dinov2" in f.lower() and "vitl14" in f.lower()
                          and f.endswith((".pt", ".pth"))]
    except Exception:
        pass
    for cand in paths:
        try:
            import torch

            sd = torch.load(cand, map_location="cpu", weights_only=True)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            params = dinov2_jax.load_torch_state_dict(sd, arch="vitl14")
        except Exception:
            continue
        return dinov2_jax.dinov2_extractor(params, arch="vitl14")
    return None


def _try_torch_inception() -> Optional[Callable]:
    """InceptionV3 (pool3, 2048-d) from a local torch-fidelity or
    torchvision cache, run on CPU torch.  Returns None if weights are not
    cached locally (zero-egress environments)."""
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
        # torchvision's InceptionV3 definition is not bundled; only
        # TorchScript archives are loadable — probe each candidate
        for cand in candidates:
            try:
                net = torch.jit.load(cand).eval()
            except Exception:
                continue  # a raw state dict (.pth), not TorchScript

            def extract(imgs: np.ndarray) -> np.ndarray:
                with torch.no_grad():
                    t = torch.from_numpy(np.asarray(imgs)).float()
                    return net(t).numpy()

            return extract
        return None
    except Exception:
        return None


def _try_torch_hub(repo: str, model: str) -> Optional[Callable]:
    """Load a torch.hub model strictly from the local cache."""
    try:
        import torch

        net = torch.hub.load(repo, model, trust_repo=True,
                             skip_validation=True, verbose=False)
        net = net.eval()

        def extract(imgs: np.ndarray) -> np.ndarray:
            with torch.no_grad():
                return net(torch.from_numpy(np.asarray(imgs)).float()).numpy()

        return extract
    except Exception:
        return None


def _try_torchscript_cache(tag: str) -> Optional[Callable]:
    """Find a TorchScript .pt in the torch hub cache whose name contains
    ``tag`` and wrap it as an extractor."""
    try:
        import torch

        hub_dir = torch.hub.get_dir()
        for root, _, files in os.walk(hub_dir):
            for f in files:
                if tag in f.lower() and f.endswith((".pt", ".pts")):
                    net = torch.jit.load(os.path.join(root, f)).eval()

                    def extract(x: np.ndarray) -> np.ndarray:
                        with torch.no_grad():
                            return net(torch.from_numpy(
                                np.asarray(x)).float()).numpy()

                    return extract
    except Exception:
        pass
    return None


def get_extractor(name: str = "inception") -> Callable:
    """Resolve a named extractor; see module docstring for the order."""
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
        # FDD features: native JAX DINOv2 ViT-L/14 from a cached state
        # dict first, then the torch.hub module on host CPU
        # (reference: utils/torchmetric_fdd.py:82-91)
        fn = _try_jax_dinov2()
        if fn is None:
            fn = _try_torch_hub("facebookresearch/dinov2", "dinov2_vitl14")
        if fn is not None:
            _REGISTRY[name] = fn
            return fn
    if name == "i3d":
        # FVD features: native JAX InceptionI3d from a cached raw state
        # dict (videogpt i3d_pretrained_400 layout) first, then the
        # StyleGAN-V TorchScript archive on host CPU
        # (reference: utils/torchmetric_fvd.py:169-186, fvd.py:8-19)
        fn = _try_jax_i3d()
        if fn is None:
            fn = _try_torchscript_cache("i3d")
        if fn is not None:
            _REGISTRY[name] = fn
            return fn
    raise RuntimeError(
        f"feature extractor {name!r} is unavailable: no registered callable "
        f"and no local pretrained weights found. Register one with "
        f"zigma_tpu.metrics.register_extractor({name!r}, fn) — fn maps "
        f"(B, C, H, W) images to (B, F) features. For smoke tests use "
        f"'patch_stats' (weight-free, NOT comparable to published FID).")
