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

__all__ = ["FrozenCLIPEmbedder"]


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
