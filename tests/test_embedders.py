"""Embedder-edge tests: CFG label drop, caption embedder, cond FinalLayer,
sin-cos table regression."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zigma_tpu.models import (
    CaptionEmbedder,
    FinalLayer,
    LabelEmbedder,
    TimestepEmbedder,
    get_2d_sincos_pos_embed,
)


class TestLabelEmbedder:
    def test_cfg_drop_uses_null_class(self):
        m = LabelEmbedder(num_classes=4, hidden_size=8, dropout_prob=1.0)
        labels = jnp.array([0, 1, 2, 3])
        params = m.init({"params": jax.random.PRNGKey(0),
                         "label_drop": jax.random.PRNGKey(1)},
                        labels, train=True)
        # dropout_prob=1 -> every label becomes the null class (index 4)
        out = m.apply(params, labels, train=True,
                      rngs={"label_drop": jax.random.PRNGKey(2)})
        table = params["params"]["embedding"]["embedding"]
        np.testing.assert_allclose(out, jnp.tile(table[4], (4, 1)), atol=1e-6)

    def test_force_drop_ids(self):
        m = LabelEmbedder(num_classes=4, hidden_size=8, dropout_prob=0.5)
        labels = jnp.array([0, 1])
        params = m.init({"params": jax.random.PRNGKey(0),
                         "label_drop": jax.random.PRNGKey(1)},
                        labels, train=True)
        out = m.apply(params, labels, train=False,
                      force_drop_ids=jnp.array([1, 0]))
        table = params["params"]["embedding"]["embedding"]
        np.testing.assert_allclose(out[0], table[4], atol=1e-6)  # dropped
        np.testing.assert_allclose(out[1], table[1], atol=1e-6)  # kept

    def test_force_drop_without_cfg_raises(self):
        # dropout_prob=0 means no null-class row exists: asking for a drop
        # must fail loudly, not clamp onto the last real class
        m = LabelEmbedder(num_classes=4, hidden_size=8, dropout_prob=0.0)
        labels = jnp.array([0, 1])
        params = m.init(jax.random.PRNGKey(0), labels)
        with pytest.raises(ValueError, match="force_drop_ids"):
            m.apply(params, labels, force_drop_ids=jnp.array([1, 0]))

    def test_eval_no_drop(self):
        m = LabelEmbedder(num_classes=4, hidden_size=8, dropout_prob=0.9)
        labels = jnp.array([2])
        params = m.init({"params": jax.random.PRNGKey(0),
                         "label_drop": jax.random.PRNGKey(1)},
                        labels, train=True)
        out = m.apply(params, labels, train=False)
        table = params["params"]["embedding"]["embedding"]
        np.testing.assert_allclose(out[0], table[2], atol=1e-6)


class TestCaptionEmbedder:
    def test_shapes_and_drop(self):
        m = CaptionEmbedder(in_channels=16, hidden_size=8, uncond_prob=1.0,
                            token_num=5)
        cap = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
        params = m.init({"params": jax.random.PRNGKey(1),
                         "label_drop": jax.random.PRNGKey(2)},
                        cap, train=True)
        out = m.apply(params, cap, train=True,
                      rngs={"label_drop": jax.random.PRNGKey(3)})
        assert out.shape == (2, 5, 8)
        # uncond_prob=1: both rows equal (the shared null embedding)
        np.testing.assert_allclose(out[0], out[1], atol=1e-6)


class TestFinalLayerCond:
    def test_conditioned_variant(self):
        m = FinalLayer(patch_size=2, out_channels=4, cond=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 16))
        c = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
        params = m.init(jax.random.PRNGKey(2), x, c)
        out = m.apply(params, x, c)
        assert out.shape == (2, 9, 16)
        # adaLN is zero-init: conditioned output == unconditioned at init
        out_uncond = m.apply(params, x, None)
        np.testing.assert_allclose(out, out_uncond, atol=1e-6)


class TestSincos:
    def test_table_regression(self):
        """Golden values from the reference's numpy implementation
        (model_zigma.py:1019-1068)."""
        pe = get_2d_sincos_pos_embed(8, 2)
        assert pe.shape == (4, 8)
        # position (0,0): sin(0)=0, cos(0)=1 in both halves
        np.testing.assert_allclose(pe[0], [0, 0, 1, 1, 0, 0, 1, 1], atol=1e-12)
        # the h-half of position (h=0,w=1) equals the w-half of (h=1,w=0)
        np.testing.assert_allclose(pe[1][4:], pe[2][:4], atol=1e-12)

    def test_timestep_embedding_reference_formula(self):
        t = jnp.array([0.0, 1000.0])
        emb = TimestepEmbedder.timestep_embedding(t, 8)
        # t=0: cos->1, sin->0 layout [cos|sin]
        np.testing.assert_allclose(emb[0], [1, 1, 1, 1, 0, 0, 0, 0], atol=1e-6)
        assert jnp.isfinite(emb).all()
