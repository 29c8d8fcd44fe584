"""LM-side Mamba tests: MixerModel / MambaLMHeadModel / generation, plus CFG.

Mirrors the capability the reference vendors in
dis_mamba/mamba_ssm/models/mixer_seq_simple.py and utils/generation.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zigma_tpu.models import ZigMa
from zigma_tpu.models.lm import MambaLMHeadModel, MixerModel, generate


def _lm(vocab=32, d=32, n_layer=2, **kw):
    return MambaLMHeadModel(d_model=d, n_layer=n_layer, vocab_size=vocab,
                            ssm_cfg={"d_state": 8}, rms_norm=True, **kw)


class TestLM:
    def test_forward_shapes(self):
        m = _lm()
        ids = jnp.array([[1, 2, 3, 4], [5, 6, 7, 8]])
        params = m.init(jax.random.PRNGKey(0), ids)
        logits = m.apply(params, ids)
        assert logits.shape == (2, 4, 32)
        assert jnp.isfinite(logits).all()

    def test_vocab_padding(self):
        m = _lm(vocab=30, pad_vocab_size_multiple=8)
        ids = jnp.array([[1, 2]])
        params = m.init(jax.random.PRNGKey(0), ids)
        logits = m.apply(params, ids)
        assert logits.shape == (1, 2, 32)  # padded to 32

    def test_step_matches_parallel(self):
        """Token-by-token step() reproduces the parallel forward logits."""
        m = _lm()
        ids = jnp.array([[3, 1, 4, 1, 5, 9, 2, 6]])
        params = m.init(jax.random.PRNGKey(0), ids)
        logits_par = m.apply(params, ids)

        caches = m.init_caches(1)
        outs = []
        for i in range(ids.shape[1]):
            lg, caches = m.apply(params, ids[:, i : i + 1], caches,
                                 method=MambaLMHeadModel.step)
            outs.append(lg)
        logits_seq = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(logits_par),
                                   np.asarray(logits_seq),
                                   atol=2e-4, rtol=1e-3)

    def test_generate_greedy_deterministic(self):
        m = _lm()
        ids = jnp.array([[1, 2, 3]])
        params = m.init(jax.random.PRNGKey(0), ids)
        out1 = generate(m, params, ids, max_new_tokens=5)
        out2 = generate(m, params, ids, max_new_tokens=5)
        assert out1.shape == (1, 8)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        np.testing.assert_array_equal(np.asarray(out1[:, :3]),
                                      np.asarray(ids))

    def test_generate_sampled(self):
        m = _lm()
        ids = jnp.array([[1, 2], [3, 4]])
        params = m.init(jax.random.PRNGKey(0), ids)
        out = generate(m, params, ids, max_new_tokens=4,
                       rng=jax.random.PRNGKey(7), temperature=1.0, top_k=5)
        assert out.shape == (2, 6)
        assert (np.asarray(out) >= 0).all()
        assert (np.asarray(out) < 32).all()


class TestCFG:
    def test_cfg_scale_one_equals_cond(self):
        m = ZigMa(in_channels=4, embed_dim=32, depth=2, img_dim=8,
                  patch_size=2, has_text=True, d_context=16,
                  scan_type="zigzagN2", scan_backend="ref")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jnp.full((2,), 0.5)
        y = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
        params = m.init(jax.random.PRNGKey(2), x, t, y)
        cond = m.apply(params, x, t, y)
        guided = m.apply(params, x, t, y, 1.0,
                         method=ZigMa.forward_with_cfg)
        np.testing.assert_allclose(np.asarray(guided), np.asarray(cond),
                                   atol=1e-5)

    def test_cfg_channels_subset(self):
        m = ZigMa(in_channels=4, embed_dim=32, depth=2, img_dim=8,
                  patch_size=2, has_text=True, d_context=16,
                  scan_type="zigzagN2", scan_backend="ref")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jnp.full((2,), 0.5)
        y = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
        params = m.init(jax.random.PRNGKey(2), x, t, y)
        cond = m.apply(params, x, t, y)
        guided = m.apply(params, x, t, y, 4.0, None, 3,
                         method=ZigMa.forward_with_cfg)
        # channels >= cfg_channels are the raw conditional output
        np.testing.assert_allclose(np.asarray(guided[:, 3:]),
                                   np.asarray(cond[:, 3:]), atol=1e-5)


class TestPrefill:
    def test_prefill_cache_matches_steps(self):
        """Parallel-scan prefill produces the same cache and logits as
        stepping through the prompt token by token."""
        m = _lm()
        ids = jnp.array([[5, 3, 8, 1, 9, 2, 7, 4]])
        params = m.init(jax.random.PRNGKey(0), ids)

        logits_p, caches_p = m.apply(params, ids,
                                     method=MambaLMHeadModel.prefill)

        caches_s = m.init_caches(1)
        for i in range(ids.shape[1]):
            logits_s, caches_s = m.apply(params, ids[:, i : i + 1], caches_s,
                                         method=MambaLMHeadModel.step)
        np.testing.assert_allclose(np.asarray(logits_p),
                                   np.asarray(logits_s[:, 0]),
                                   atol=2e-4, rtol=1e-3)
        for (cp, sp), (cs, ss) in zip(caches_p, caches_s):
            np.testing.assert_allclose(np.asarray(cp), np.asarray(cs),
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(sp), np.asarray(ss),
                                       atol=1e-4, rtol=1e-3)
