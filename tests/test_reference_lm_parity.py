"""LM-stack numerical parity vs the EXECUTED reference MambaLMHeadModel.

Same method as test_reference_model_parity: the reference torch LM runs on
CPU with its CUDA fast paths routed to its own golden refs, its REAL state
dict is converted, and our flax LM must agree at float32 machine precision
— on full-sequence logits AND on a greedy continuation decoded through our
step/cache path.  Skipped without /root/reference.
"""

import importlib

import numpy as np
import pytest

from test_reference_model_parity import _load_reference_zigma

pytestmark = pytest.mark.skipif(_load_reference_zigma() is None,
                                reason="reference model not importable")


@pytest.fixture(scope="module")
def ref_lm():
    import torch

    msq = importlib.import_module(
        "dis_mamba.mamba_ssm.models.mixer_seq_simple")
    torch.manual_seed(0)
    lm = msq.MambaLMHeadModel(
        d_model=64, n_layer=2, vocab_size=100,
        # v1: the HF-checkpoint topology (no _b branches); slow path only
        ssm_cfg={"use_fast_path": False, "scan_type": "v1"},
        rms_norm=True, fused_add_norm=False,
        pad_vocab_size_multiple=8, device="cpu")
    lm.eval()
    return lm


@pytest.fixture(scope="module")
def our_lm(ref_lm):
    import jax
    import jax.numpy as jnp
    import torch  # noqa: F401

    from zigma_tpu.convert.torch_mamba_lm import convert_mamba_lm_state_dict
    from zigma_tpu.models.lm import MambaLMHeadModel

    sd = {k: v.detach().cpu() for k, v in ref_lm.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_mamba_lm_state_dict(sd))
    model = MambaLMHeadModel(d_model=64, n_layer=2, vocab_size=100,
                             pad_vocab_size_multiple=8, rms_norm=True,
                             ssm_cfg={"scan_backend": "ref"})
    return model, params


def test_logits_match_reference(ref_lm, our_lm):
    import torch
    import jax.numpy as jnp

    model, params = our_lm
    ids = np.random.default_rng(0).integers(0, 100, (2, 17))
    with torch.no_grad():
        ref = ref_lm(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_greedy_decode_matches_reference(ref_lm, our_lm):
    """Our step/cache decode must reproduce the reference's greedy
    continuation (computed by repeated full-prefix forwards)."""
    import torch
    import jax

    from zigma_tpu.models.lm import generate

    model, params = our_lm
    prompt = np.random.default_rng(1).integers(0, 100, (1, 8))
    new_tokens = 12

    ids = torch.from_numpy(prompt)
    for _ in range(new_tokens):
        with torch.no_grad():
            nxt = ref_lm(ids).logits[:, -1, :100].argmax(-1)
        ids = torch.cat([ids, nxt[:, None]], dim=1)
    ref_seq = ids.numpy()[0]

    out = generate(model, params, np.asarray(prompt),
                   max_new_tokens=new_tokens, temperature=0.0,
                   rng=jax.random.PRNGKey(0))
    ours_seq = np.asarray(out)[0]
    np.testing.assert_array_equal(ours_seq[:len(ref_seq)], ref_seq)
