"""Latent codec: SD-VAE encode/decode behind a uniform interface.

The reference treats the SD VAE as a frozen black box via diffusers
(reference: train_acc.py:229-241 — sd-vae-ft-ema, or the SD1.5 pipeline VAE
for text runs; decode at sample_acc.py:365 with the 0.18215 scale).  This
rebuild keeps that contract behind ``LatentCodec``:

- ``JAXVAECodec``: the native JAX AutoencoderKL (``data/vae_jax.py``) —
  encode/decode on the accelerator from a locally cached diffusers state
  dict; diffusers itself is not required (and is absent in this image).
- ``TorchVAECodec``: the exact reference VAE through diffusers on CPU torch,
  **only if diffusers and the weights are locally available** (zero-egress
  environments can't download; we fail loudly rather than silently swap
  models — decoded-pixel metrics are meaningless otherwise).
- ``IdentityCodec``: pass-through for pipelines that precompute latents in
  shards (the training path never needs the VAE: latents come from the
  dataset, train_acc.py:432).
"""

from __future__ import annotations


import numpy as np

__all__ = ["LatentCodec", "IdentityCodec", "TorchVAECodec", "JAXVAECodec",
           "get_codec", "decode_maybe_video", "LATENT_SCALE"]

LATENT_SCALE = 0.18215


class LatentCodec:
    def encode(self, images: np.ndarray) -> np.ndarray:  # (B,C,H,W) [-1,1]
        raise NotImplementedError

    def decode(self, latents: np.ndarray) -> np.ndarray:  # -> (B,C,H,W) [-1,1]
        raise NotImplementedError


def decode_maybe_video(codec: "LatentCodec", arr: np.ndarray) -> np.ndarray:
    """codec.decode that handles video batches: (B, T, C, H, W) latents
    are frame-folded through the 2-D VAE and refolded — the reference
    decodes video latents frame-wise (train_acc.py:345,365).  4-D image
    batches pass straight through ``codec.decode``."""
    arr = np.asarray(arr)
    if arr.ndim == 5:
        B, T = arr.shape[:2]
        dec = codec.decode(arr.reshape((-1,) + arr.shape[2:]))
        return dec.reshape((B, T) + dec.shape[1:])
    return codec.decode(arr)


class IdentityCodec(LatentCodec):
    def encode(self, images):
        return np.asarray(images)

    def decode(self, latents):
        return np.asarray(latents)


class TorchVAECodec(LatentCodec):
    """diffusers AutoencoderKL on CPU torch, local cache only.

    Works on RAW (unscaled) latents — the reference's shard contract
    (train_acc.py:432 multiplies by 0.18215 at train time; sample_acc.py:365
    divides before decode).  The 0.18215 scale lives at the train/sample
    layer, never here, so decoding shard latents and decoding
    already-descaled samples both go through the same call."""

    def __init__(self, model_id: str = "stabilityai/sd-vae-ft-ema"):
        try:
            from diffusers import AutoencoderKL
        except ImportError as e:
            raise RuntimeError(
                "diffusers is not installed; use IdentityCodec or install "
                "diffusers with a locally cached VAE") from e
        try:
            self.vae = AutoencoderKL.from_pretrained(
                model_id, local_files_only=True).eval()
        except Exception as e:
            raise RuntimeError(
                f"VAE weights for {model_id!r} not in the local HF cache "
                f"(this environment has no egress): {e}") from e

    def encode(self, images):
        import torch

        with torch.no_grad():
            t = torch.from_numpy(np.asarray(images, np.float32))
            return self.vae.encode(t).latent_dist.sample().numpy()

    def decode(self, latents):
        import torch

        with torch.no_grad():
            t = torch.from_numpy(np.asarray(latents, np.float32))
            return self.vae.decode(t).sample.clamp(-1, 1).numpy()


class JAXVAECodec(LatentCodec):
    """Native JAX AutoencoderKL (``data/vae_jax.py``) — encode/decode run
    on the accelerator.  Loads the diffusers-layout state dict from a local
    cache (``ZIGMA_VAE_WEIGHTS`` or the HF hub cache); diffusers itself is
    NOT required."""

    def __init__(self, model_id: str = "stabilityai/sd-vae-ft-ema",
                 sample_posterior: bool = True, seed: int = 0):
        from zigma_tpu.data import vae_jax

        sd = _find_vae_state_dict(model_id)
        if sd is None:
            raise RuntimeError(
                f"VAE weights for {model_id!r} not found locally (set "
                f"ZIGMA_VAE_WEIGHTS or cache the diffusers state dict; "
                f"this environment has no egress)")
        self.params = vae_jax.load_torch_state_dict(sd)
        self._encode, self._decode = vae_jax.vae_encode, vae_jax.vae_decode
        # encode() samples the posterior like the reference's
        # latent_dist.sample() shard prep (TorchVAECodec.encode above);
        # sample_posterior=False switches to the deterministic mean
        self.sample_posterior = sample_posterior
        self._n_encoded = 0
        self._seed = seed

    def encode(self, images):
        import jax
        import jax.numpy as jnp

        rng = None
        if self.sample_posterior:
            rng = jax.random.fold_in(jax.random.PRNGKey(self._seed),
                                     self._n_encoded)
            self._n_encoded += 1
        return np.asarray(self._encode(
            self.params, jnp.asarray(np.asarray(images, np.float32)),
            rng=rng))

    def decode(self, latents):
        import jax.numpy as jnp

        out = self._decode(
            self.params, jnp.asarray(np.asarray(latents, np.float32)))
        return np.clip(np.asarray(out), -1.0, 1.0)


def _find_vae_state_dict(model_id: str):
    """Probe local caches for a diffusers AutoencoderKL state dict."""
    import glob
    import os

    paths = []
    explicit = os.environ.get("ZIGMA_VAE_WEIGHTS")
    if explicit:
        paths.append(explicit)
    cache = os.environ.get(
        "HF_HOME", os.path.expanduser("~/.cache/huggingface"))
    tag = "models--" + model_id.replace("/", "--")
    for pat in (f"{cache}/hub/{tag}/**/diffusion_pytorch_model*",
                f"{cache}/hub/{tag}/**/*.safetensors",
                f"{cache}/hub/{tag}/**/*.bin"):
        paths += sorted(glob.glob(pat, recursive=True))
    for cand in paths:
        try:
            if cand.endswith(".safetensors"):
                from safetensors.numpy import load_file

                return load_file(cand)
            import torch

            sd = torch.load(cand, map_location="cpu", weights_only=True)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            return sd
        except Exception:
            continue
    return None


def get_codec(kind: str = "auto", **kw) -> LatentCodec:
    """'identity' | 'sd-vae' (native JAX, torch/diffusers fallback) |
    'auto' (sd-vae if locally cached else identity with a warning)."""

    def torch_codec():
        # TorchVAECodec takes only model_id — the JAX-only kwargs
        # (sample_posterior/seed/...) must not reach it, and a missing
        # torch/diffusers import must read as "unavailable", not TypeError
        return TorchVAECodec(**{k: v for k, v in kw.items()
                                if k == "model_id"})

    if kind == "identity":
        return IdentityCodec()
    if kind == "sd-vae":
        try:
            return JAXVAECodec(**kw)
        except RuntimeError:
            return torch_codec()
    try:
        return JAXVAECodec(**kw)
    except RuntimeError:
        pass
    try:
        return torch_codec()
    except (RuntimeError, ImportError):
        import logging

        logging.getLogger("zigma").warning(
            "no local SD-VAE weights; falling back to IdentityCodec "
            "(outputs stay in latent space)")
        return IdentityCodec()
