"""LM evaluation: native loglikelihood scoring + lm-eval harness adapter.

The reference wraps its Mamba LM for EleutherAI's lm-evaluation-harness
(``evals/lm_harness_eval.py:15-45``, subclassing the harness's HFLM and
routing ``_model_generate``/loglikelihood through the CUDA model).  Here the
scoring math is framework-native jitted JAX (usable without the harness),
and ``MambaEvalLM`` adapts it to the harness's ``LM`` API when ``lm_eval``
is importable (it is not baked into this build — the adapter is gated and
fails loudly, like the other optional-dependency seams).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["loglikelihood_batch", "loglikelihood_rolling", "MambaEvalLM"]


# flax Modules with dict attrs (ssm_cfg) are unhashable, so the model can't
# be a static jit arg; cache one jitted closure per live model instead
_score_fns: dict = {}


def _get_score(model):
    entry = _score_fns.get(id(model))
    if entry is not None and entry[0] is model:
        return entry[1]

    @jax.jit
    def score(params, input_ids, cont_mask):
        logits = model.apply(params, input_ids)  # (B, L, V)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = input_ids[:, 1:]
        tok_lp = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        m = cont_mask[:, 1:].astype(jnp.float32)
        sums = (tok_lp * m).sum(-1)
        greedy = jnp.where(m > 0, lp.argmax(-1) == tgt, True).all(-1)
        return sums, greedy

    _score_fns[id(model)] = (model, score)  # hold model: id() stays unique
    return score


def loglikelihood_batch(model, params, input_ids, cont_mask):
    """Score continuations under teacher forcing.

    Args:
      model: a ``MambaLMHeadModel`` (or any flax module mapping
        (B, L) int32 -> (B, L, V) logits).
      params: its parameters.
      input_ids: (B, L) int32, each row ``[context; continuation; pad]``.
        Pad with any token id; padded positions must have ``cont_mask``
        False (causality makes left tokens independent of right padding).
      cont_mask: (B, L) bool, True exactly on continuation positions.

    Returns ``(logprob_sums (B,) float32, is_greedy (B,) bool)`` — the pair
    the harness's ``loglikelihood`` requests need.
    """
    return _get_score(model)(params, jnp.asarray(input_ids, jnp.int32),
                             jnp.asarray(cont_mask, bool))


def loglikelihood_rolling(model, params, token_ids, window: int,
                          stride: Optional[int] = None) -> float:
    """Full-text NLL via sliding windows (harness ``loglikelihood_rolling``).

    Each window scores only its last ``stride`` tokens (the rest is
    re-consumed context), so every token past the first window gets
    ``window - stride`` tokens of context.  O(L/stride) forward passes.

    ``stride`` must be < ``window``: a window's first token is context
    only (scoring position t needs token t-1 in the same window), so at
    least one slot per window is not scorable.  ``stride == window``
    would silently skip one token per window.
    """
    ids = np.asarray(token_ids, np.int32)
    stride = stride or window - 1
    if not 1 <= stride < window:
        raise ValueError(f"stride must be in [1, window-1], got {stride} "
                         f"for window {window}")
    total = 0.0
    pos = 0  # first unscored token (token 0 is never scored: no context)
    n = len(ids)
    while pos + 1 < n:
        end = min(pos + 1 + stride, n)
        start = max(0, end - window)
        chunk = ids[start:end]
        pad = window - len(chunk)
        row = np.pad(chunk, (0, pad))
        mask = np.zeros(window, bool)
        mask[pos + 1 - start : len(chunk)] = True
        s, _ = loglikelihood_batch(model, params, row[None], mask[None])
        total += float(s[0])
        pos = end - 1
    return total


class MambaEvalLM:
    """lm-evaluation-harness ``LM`` adapter around the native scorer.

    Mirrors the surface the reference registers (``lm_harness_eval.py``):
    ``loglikelihood``, ``loglikelihood_rolling``, ``generate_until``.
    Requires the ``lm_eval`` package (not in this build) and a HF tokenizer.
    """

    def __init__(self, model, params, tokenizer, batch_size: int = 8,
                 max_length: int = 2048):
        try:
            import lm_eval  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "lm_eval is not installed; use loglikelihood_batch / "
                "loglikelihood_rolling / models.lm.generate directly"
            ) from e
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.max_length = max_length

    def _encode_pair(self, context: str, continuation: str):
        ctx = self.tokenizer.encode(context) if context else []
        full = self.tokenizer.encode(context + continuation)
        # harness convention: continuation tokens = full minus context prefix
        return full, len(ctx)

    def loglikelihood(self, requests) -> list:
        out = []
        pairs = [self._encode_pair(r.args[0], r.args[1]) for r in requests]
        for i in range(0, len(pairs), self.batch_size):
            chunk = pairs[i : i + self.batch_size]
            L = max(len(ids) for ids, _ in chunk)
            L = min(L, self.max_length)
            rows, masks = [], []
            for ids, nctx in chunk:
                removed = max(0, len(ids) - L)
                ids = ids[-L:]
                nctx = max(0, nctx - removed)
                row = np.pad(np.asarray(ids, np.int32), (0, L - len(ids)))
                m = np.zeros(L, bool)
                m[nctx : len(ids)] = True
                rows.append(row)
                masks.append(m)
            s, g = loglikelihood_batch(self.model, self.params,
                                       np.stack(rows), np.stack(masks))
            out.extend((float(a), bool(b)) for a, b in zip(s, g))
        return out

    def loglikelihood_rolling(self, requests) -> list:
        return [
            loglikelihood_rolling(
                self.model, self.params,
                self.tokenizer.encode(r.args[0]), window=self.max_length)
            for r in requests
        ]

    def generate_until(self, requests) -> list:
        from zigma_tpu.models.lm import generate

        out = []
        for r in requests:
            text, kwargs = r.args[0], (r.args[1] if len(r.args) > 1 else {})
            ids = jnp.asarray([self.tokenizer.encode(text)], jnp.int32)
            max_new = int(kwargs.get("max_gen_toks", 128))
            full = generate(self.model, self.params, ids, max_new)
            gen = self.tokenizer.decode(np.asarray(full[0, ids.shape[1]:]))
            for stop in kwargs.get("until", []):
                gen = gen.split(stop)[0]
            out.append(gen)
        return out
