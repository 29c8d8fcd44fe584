"""Causal depthwise conv1d tests (pattern follows
dis_causal_conv1d/tests/test_causal_conv1d.py: odd lengths, widths 2-4,
update-vs-full-scan equivalence)."""

import numpy as np
import pytest
import jax.numpy as jnp

from zigma_tpu.ops.causal_conv1d import (
    causal_conv1d,
    causal_conv1d_update,
)
from zigma_tpu.ops.norms import add_norm, layer_norm, rms_norm


def _numpy_causal_conv(x, w, b, silu):
    B, L, D = x.shape
    W = w.shape[-1]
    xp = np.pad(x, ((0, 0), (W - 1, 0), (0, 0)))
    y = np.zeros((B, L, D))
    for t in range(L):
        window = xp[:, t : t + W, :]  # (B, W, D)
        y[:, t] = np.einsum("bwd,dw->bd", window, w)
    if b is not None:
        y = y + b
    if silu:
        y = y * (1.0 / (1.0 + np.exp(-y)))
    return y


@pytest.mark.parametrize("W", [2, 3, 4])
@pytest.mark.parametrize("L", [1, 8, 151])
def test_conv_matches_numpy(W, L):
    rng = np.random.default_rng(0)
    B, D = 2, 6
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    w = rng.standard_normal((D, W)).astype(np.float32)
    b = rng.standard_normal(D).astype(np.float32)
    got = causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                        activation=None)
    want = _numpy_causal_conv(x, w, b, silu=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_conv_silu():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 9, 4)).astype(np.float32)
    w = rng.standard_normal((4, 4)).astype(np.float32)
    got = causal_conv1d(jnp.asarray(x), jnp.asarray(w), None, activation="silu")
    lin = _numpy_causal_conv(x, w, None, silu=False)
    want = lin * (1 / (1 + np.exp(-lin)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("W", [2, 4])
def test_update_matches_full(W):
    rng = np.random.default_rng(2)
    B, L, D = 2, 11, 5
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((D, W)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(D).astype(np.float32))
    full = causal_conv1d(x, w, b, activation="silu")
    state = jnp.zeros((B, W, D), jnp.float32)
    outs = []
    for t in range(L):
        y, state = causal_conv1d_update(x[:, t], state, w, b, activation="silu")
        outs.append(y)
    got = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_update_rejects_unknown_activation():
    # decode must validate like the training path (no silent un-gated output)
    x = jnp.zeros((2, 5))
    state = jnp.zeros((2, 4, 5))
    w = jnp.zeros((5, 4))
    with pytest.raises(ValueError, match="activation"):
        causal_conv1d_update(x, state, w, activation="gelu")


def test_initial_state_continuation():
    """Chunked prefill: conv over [x1; x2] == conv(x1) then conv(x2, state)."""
    rng = np.random.default_rng(3)
    B, D, W = 2, 4, 4
    x = jnp.asarray(rng.standard_normal((B, 20, D)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((D, W)).astype(np.float32))
    full = causal_conv1d(x, w, None, activation=None)
    a = causal_conv1d(x[:, :12], w, None, activation=None)
    b = causal_conv1d(x[:, 12:], w, None, activation=None,
                      initial_state=x[:, 12 - (W - 1) : 12])
    got = jnp.concatenate([a, b], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


# ----------------------------- norms ---------------------------------------


def test_rms_norm_numpy():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, 7, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    got = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-5)
    want = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-5) * w
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_layer_norm_numpy():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((3, 7, 16)).astype(np.float32)
    got = layer_norm(jnp.asarray(x), eps=1e-6)
    mu = x.mean(-1, keepdims=True)
    want = (x - mu) / np.sqrt(((x - mu) ** 2).mean(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_add_norm_contract():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    w = jnp.ones(8)
    out, res = add_norm(x, w, residual=r, prenorm=True, kind="rms")
    np.testing.assert_allclose(np.asarray(res), np.asarray(x + r), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(rms_norm(x + r, w)), rtol=1e-6
    )
    assert res.dtype == jnp.float32


def test_update_matches_full_bf16_bitwise():
    """bf16 prefill and bf16 decode must be the SAME function: both compute
    in x.dtype, so the rolling-state step reproduces the parallel conv
    bit-for-bit (cache-consistency for bf16 decode)."""
    rng = np.random.default_rng(4)
    B, L, D, W = 2, 9, 5, 4
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((D, W)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(D), jnp.float32)
    full = causal_conv1d(x, w, b, activation="silu")
    state = jnp.zeros((B, W, D), jnp.bfloat16)
    outs = []
    for t in range(L):
        y, state = causal_conv1d_update(x[:, t], state, w, b,
                                        activation="silu")
        outs.append(y)
    got = jnp.stack(outs, axis=1)
    assert got.dtype == full.dtype == jnp.bfloat16
    assert bool(jnp.all(got == full))


def test_fp32_tap_accumulation_flag_is_exact():
    """accum_dtype=float32 on bf16 inputs must be bitwise the fp32 conv
    truncated once at the end — the reference CUDA kernel's accumulation
    discipline (causal_conv1d_fwd.cu)."""
    import jax.numpy as jnp
    import numpy as np

    from zigma_tpu.ops.causal_conv1d import causal_conv1d, causal_conv1d_update

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(8), jnp.float32)

    got = causal_conv1d(x, w, b, activation="silu", accum_dtype=jnp.float32)
    want = causal_conv1d(x.astype(jnp.float32), w, b,
                         activation="silu").astype(jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))

    # decode step under the same flag stays bitwise-consistent with the
    # parallel conv (the prefill/decode cache contract)
    state = jnp.zeros((2, 4, 8), jnp.bfloat16)
    outs = []
    for t in range(x.shape[1]):
        y, state = causal_conv1d_update(x[:, t], state, w, b,
                                        accum_dtype=jnp.float32)
        outs.append(y)
    step_out = jnp.stack(outs, axis=1)
    np.testing.assert_array_equal(np.asarray(step_out, np.float32),
                                  np.asarray(got, np.float32))


def test_bf16_tap_divergence_quantified_flagship_width():
    """Measure the end-to-end divergence of the x.dtype (bf16) conv-tap
    accumulation vs the reference's fp32 taps through a flagship-width
    bf16 ZigMa (embed 768, d_inner 1536, 24 layers via scan-over-layers).
    The fp32-forward parity tests never see this (they run fp32, where
    both modes coincide); the measured numbers live in docs/DESIGN.md
    ("bf16 conv accumulation").  The assertion pins the finding: the tap
    choice moves the output by LESS than bf16 itself does (it is inside
    the bf16 noise floor, so it cannot dominate the 1%-FID budget)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zigma_tpu.models import ZigMa

    kw = dict(in_channels=4, embed_dim=768, depth=24, img_dim=32,
              patch_size=2, scan_type="zigzagN8", use_pe=2,
              scan_layers=True, scan_backend="chunked")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 32, 32)), jnp.float32)
    t = jnp.asarray([0.4], jnp.float32)

    m_fast = ZigMa(dtype=jnp.bfloat16, **kw)
    params = m_fast.init(jax.random.PRNGKey(0), x, t)
    # perturb off the DiT zero-init: at init the adaLN gate is 0 and the
    # mixer path (where the conv lives) never reaches the output — the same
    # degeneracy that hid the slow-path permutation drop
    # (test_reference_model_parity._perturb_all_params)
    noise_rng = np.random.default_rng(1)
    params = jax.tree.map(
        lambda p: p + jnp.asarray(
            0.02 * noise_rng.standard_normal(p.shape), p.dtype), params)
    out_fast = np.asarray(m_fast.apply(params, x, t), np.float32)
    m_ref_taps = ZigMa(dtype=jnp.bfloat16, ssm_cfg={"conv_fp32_taps": True},
                       **kw)
    out_reftap = np.asarray(m_ref_taps.apply(params, x, t), np.float32)
    m_f32 = ZigMa(dtype=jnp.float32, **kw)
    out_f32 = np.asarray(m_f32.apply(params, x, t), np.float32)

    scale = np.abs(out_f32).mean()
    tap_div = np.abs(out_fast - out_reftap).mean() / scale
    bf16_err_fast = np.abs(out_fast - out_f32).mean() / scale
    bf16_err_reftap = np.abs(out_reftap - out_f32).mean() / scale
    print(f"bf16 conv-tap divergence: tap={tap_div:.2e} "
          f"bf16_fast={bf16_err_fast:.2e} bf16_fp32taps={bf16_err_reftap:.2e}")
    # the tap choice is inside the bf16 noise floor ...
    assert tap_div <= 1.5 * bf16_err_reftap
    # ... and does not worsen the distance to the fp32 truth materially
    assert bf16_err_fast <= 1.5 * bf16_err_reftap
