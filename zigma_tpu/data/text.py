"""Frozen CLIP text encoder for offline caption-feature preparation.

Rebuild of the reference's FrozenCLIPEmbedder
(reference: datasets/clip.py:13-48): HF CLIP ViT-L/14 text tower, frozen,
77 tokens -> (B, 77, 768).  The training loop consumes *precomputed*
``caption_clip_feature.npy`` shard entries (train_acc.py:287-396); this
encoder exists for preparing those shards.

Local-cache gated: zero-egress environments without cached weights get a
loud error, not a silent substitute.
"""

from __future__ import annotations

import numpy as np

__all__ = ["FrozenCLIPEmbedder", "FrozenCLIPEmbedderJAX"]


class FrozenCLIPEmbedderJAX:
    """Same contract as FrozenCLIPEmbedder but the transformer runs as the
    native JAX tower (``data/clip_jax.py``) — tokenization stays host-side.
    Weights come from the local HF cache through the state-dict converter."""

    def __init__(self, version: str = "openai/clip-vit-large-patch14",
                 max_length: int = 77):
        from transformers import CLIPTextModel, CLIPTokenizer

        from zigma_tpu.data import clip_jax

        try:
            self.tokenizer = CLIPTokenizer.from_pretrained(
                version, local_files_only=True)
            torch_model = CLIPTextModel.from_pretrained(
                version, local_files_only=True)
        except Exception as e:
            raise RuntimeError(
                f"CLIP weights for {version!r} not in the local HF cache "
                f"(no egress available): {e}") from e
        cfg = torch_model.config
        self.heads = cfg.num_attention_heads
        self.params = clip_jax.load_torch_state_dict(
            torch_model.state_dict(), cfg={"depth": cfg.num_hidden_layers})
        del torch_model
        self.max_length = max_length
        self._forward = clip_jax.clip_text_forward

    def __call__(self, texts: list[str]) -> np.ndarray:
        import jax.numpy as jnp

        batch = self.tokenizer(
            texts, truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np")
        out = self._forward(self.params,
                            jnp.asarray(batch["input_ids"], jnp.int32),
                            heads=self.heads)
        return np.asarray(out)


class FrozenCLIPEmbedder:
    def __init__(self, version: str = "openai/clip-vit-large-patch14",
                 max_length: int = 77):
        from transformers import CLIPTextModel, CLIPTokenizer

        try:
            self.tokenizer = CLIPTokenizer.from_pretrained(
                version, local_files_only=True)
            self.transformer = CLIPTextModel.from_pretrained(
                version, local_files_only=True).eval()
        except Exception as e:
            raise RuntimeError(
                f"CLIP weights for {version!r} not in the local HF cache "
                f"(no egress available): {e}") from e
        self.max_length = max_length
        for p in self.transformer.parameters():
            p.requires_grad = False

    def __call__(self, texts: list[str]) -> np.ndarray:
        import torch

        batch = self.tokenizer(
            texts, truncation=True, max_length=self.max_length,
            return_length=True, return_overflowing_tokens=False,
            padding="max_length", return_tensors="pt")
        with torch.no_grad():
            out = self.transformer(input_ids=batch["input_ids"])
        return out.last_hidden_state.numpy()
