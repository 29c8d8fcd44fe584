"""Native JAX CLIP text tower vs the installed transformers torch
implementation, instantiated with RANDOM weights from a small config —
an exact architecture-level parity test with no downloads
(reference encoder: datasets/clip.py:13-48)."""

import numpy as np
import pytest

import jax.numpy as jnp

from zigma_tpu.data import clip_jax


@pytest.fixture(scope="module")
def torch_model_and_cfg():
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(
        vocab_size=101, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu")
    import torch

    torch.manual_seed(0)
    model = CLIPTextModel(cfg).eval()
    return model, cfg


class TestParityVsTransformers:
    def test_last_hidden_state_matches(self, torch_model_and_cfg):
        import torch

        model, cfg = torch_model_and_cfg
        params = clip_jax.load_torch_state_dict(
            model.state_dict(),
            cfg={"depth": cfg.num_hidden_layers})
        ids = np.random.default_rng(1).integers(
            0, cfg.vocab_size, (2, 12), np.int64)
        with torch.no_grad():
            want = model(input_ids=torch.from_numpy(ids)
                         ).last_hidden_state.numpy()
        got = np.asarray(clip_jax.clip_text_forward(
            params, jnp.asarray(ids, jnp.int32),
            heads=cfg.num_attention_heads))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_full_context_length(self, torch_model_and_cfg):
        import torch

        model, cfg = torch_model_and_cfg
        params = clip_jax.load_torch_state_dict(
            model.state_dict(), cfg={"depth": cfg.num_hidden_layers})
        ids = np.random.default_rng(2).integers(
            0, cfg.vocab_size, (1, cfg.max_position_embeddings), np.int64)
        with torch.no_grad():
            want = model(input_ids=torch.from_numpy(ids)
                         ).last_hidden_state.numpy()
        got = np.asarray(clip_jax.clip_text_forward(
            params, jnp.asarray(ids, jnp.int32),
            heads=cfg.num_attention_heads))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestParams:
    def test_random_params_forward(self):
        cfg = {"vocab": 50, "dim": 16, "depth": 2, "heads": 2,
               "mlp": 32, "ctx": 8}
        params = clip_jax.random_params(seed=0, cfg=cfg)
        ids = jnp.asarray(np.random.default_rng(3).integers(
            0, 50, (2, 8)), jnp.int32)
        out = np.asarray(clip_jax.clip_text_forward(params, ids, heads=2))
        assert out.shape == (2, 8, 16)
        assert np.isfinite(out).all()

    def test_missing_keys_raise(self):
        with pytest.raises(KeyError, match="missing"):
            clip_jax.load_torch_state_dict(
                {"embeddings.token_embedding.weight":
                 np.zeros((10, 8), np.float32)}, cfg={"depth": 1})
