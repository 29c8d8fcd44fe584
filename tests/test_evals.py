"""LM-eval scoring tests (reference: evals/lm_harness_eval.py — the harness
adapter; the scoring math itself is what these verify)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from zigma_tpu.evals import (
    MambaEvalLM,
    loglikelihood_batch,
    loglikelihood_rolling,
)
from zigma_tpu.models.lm import MambaLMHeadModel


@pytest.fixture(scope="module")
def lm():
    model = MambaLMHeadModel(d_model=32, n_layer=2, vocab_size=50,
                             ssm_cfg={"d_state": 4, "d_conv": 2})
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    return model, params


def _manual_score(model, params, row, mask):
    logits = np.asarray(model.apply(params, row[None]), np.float32)[0]
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    lp = np.asarray(lp)
    total, greedy = 0.0, True
    for t in range(len(row) - 1):
        if mask[t + 1]:
            total += lp[t, row[t + 1]]
            greedy &= int(lp[t].argmax()) == int(row[t + 1])
    return total, greedy


def test_loglikelihood_matches_manual(lm):
    model, params = lm
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 50, (3, 10)).astype(np.int32)
    masks = np.zeros((3, 10), bool)
    masks[0, 4:] = True   # continuation = last 6 tokens
    masks[1, 1:] = True   # everything after the first token
    masks[2, 9:] = True   # single-token continuation
    sums, greedy = loglikelihood_batch(model, params, rows, masks)
    for i in range(3):
        want, wg = _manual_score(model, params, rows[i], masks[i])
        np.testing.assert_allclose(float(sums[i]), want, rtol=1e-5)
        assert bool(greedy[i]) == wg


def test_right_padding_is_inert(lm):
    """Causality: tokens after the last scored position cannot affect the
    score — the harness pads batches to a common length."""
    model, params = lm
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 50, 8).astype(np.int32)
    mask = np.zeros(12, bool)
    mask[4:8] = True
    a = np.pad(ids, (0, 4))
    b = np.concatenate([ids, rng.integers(0, 50, 4).astype(np.int32)])
    sa, _ = loglikelihood_batch(model, params, a[None], mask[None])
    sb, _ = loglikelihood_batch(model, params, b[None], mask[None])
    np.testing.assert_allclose(float(sa[0]), float(sb[0]), rtol=1e-5)


def test_rolling_equals_full_when_window_covers(lm):
    model, params = lm
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 50, 9).astype(np.int32)
    mask = np.zeros(9, bool)
    mask[1:] = True  # every token with context, i.e. all but the first
    full, _ = loglikelihood_batch(model, params, ids[None], mask[None])
    rolled = loglikelihood_rolling(model, params, ids, window=9)
    np.testing.assert_allclose(rolled, float(full[0]), rtol=1e-5)


def test_rolling_strided_covers_every_token(lm):
    """Strided windows must score tokens 1..L-1 exactly once; with the
    window covering the whole text the totals agree exactly (each window
    re-consumes full context)."""
    model, params = lm
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 50, 12).astype(np.int32)
    a = loglikelihood_rolling(model, params, ids, window=12, stride=4)
    b = loglikelihood_rolling(model, params, ids, window=12)
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_rolling_scores_every_token_exactly_once():
    """Token coverage with small windows: a uniform-logits model gives
    every scored token logprob -log(V), so the rolling total must be
    exactly (L-1)·(-log V) for ANY window/stride — a window bookkeeping
    bug (e.g. the old stride==window default) drops tokens and shows up
    as a wrong multiple."""

    class Uniform:
        def apply(self, params, ids):
            import jax.numpy as jnp

            return jnp.zeros((*ids.shape, 50), jnp.float32)

    model, V, L = Uniform(), 50, 23
    ids = np.arange(L).astype(np.int32) % V
    expect = -(L - 1) * np.log(V)
    for window, stride in ((4, None), (4, 1), (4, 3), (8, 5), (23, None),
                           (64, None)):
        got = loglikelihood_rolling(model, {}, ids, window=window,
                                    stride=stride)
        np.testing.assert_allclose(got, expect, rtol=1e-5), (window, stride)


def test_rolling_rejects_bad_stride():
    class Uniform:
        def apply(self, params, ids):
            import jax.numpy as jnp

            return jnp.zeros((*ids.shape, 50), jnp.float32)

    ids = np.arange(10).astype(np.int32)
    with pytest.raises(ValueError, match="stride"):
        loglikelihood_rolling(Uniform(), {}, ids, window=4, stride=4)


def test_adapter_gated(lm):
    model, params = lm
    with pytest.raises(RuntimeError, match="lm_eval"):
        MambaEvalLM(model, params, tokenizer=None)
