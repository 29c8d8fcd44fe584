"""Sequence-parallel selective scan: parity vs the single-device scan.

Runs under shard_map on the virtual 8-device CPU mesh (interpret-mode
Pallas).  This capability has no reference equivalent (SURVEY.md §2.4: the
reference has no context parallelism at all).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from functools import partial as _partial

# check_vma=False: pallas_call out_shapes don't carry vma annotations yet
shard_map = _partial(jax.shard_map, check_vma=False)

from zigma_tpu.ops.selective_scan import selective_scan_ref
from zigma_tpu.parallel.seq_parallel import selective_scan_seq_parallel


def _inputs(batch=2, L=256, D=128, N=16, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    u = jax.random.normal(ks[0], (batch, L, D))
    delta = jax.random.normal(ks[1], (batch, L, D)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (D, N)) * 0.5)
    B = jax.random.normal(ks[3], (batch, L, N))
    C = jax.random.normal(ks[4], (batch, L, N))
    Dskip = jax.random.normal(ks[5], (D,))
    bias = jnp.full((D,), 0.1, jnp.float32)
    return u, delta, A, B, C, Dskip, bias


@pytest.mark.parametrize("n_shards", [2, 8])
def test_seq_parallel_matches_ref(n_shards):
    u, delta, A, B, C, Dskip, bias = _inputs()
    mesh = Mesh(np.asarray(jax.devices()[:n_shards]), ("seq",))

    fn = shard_map(
        partial(selective_scan_seq_parallel, delta_softplus=True,
                axis_name="seq"),
        mesh=mesh,
        in_specs=(P(None, "seq", None), P(None, "seq", None), P(),
                  P(None, "seq", None), P(None, "seq", None), P(),
                  P(None, "seq", None), P()),
        out_specs=P(None, "seq", None),
    )
    y_sp = fn(u, delta, A, B, C, Dskip,
              jax.random.normal(jax.random.PRNGKey(9), u.shape), bias)
    z = jax.random.normal(jax.random.PRNGKey(9), u.shape)
    y_ref = selective_scan_ref(u, delta, A, B, C, Dskip, z=z,
                               delta_bias=bias, delta_softplus=True)
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-3)


def test_seq_parallel_grads_match():
    u, delta, A, B, C, Dskip, bias = _inputs(L=128, D=128)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("seq",))

    def sp_body(u, delta, A, B, C, Dskip, bias):
        return selective_scan_seq_parallel(
            u, delta, A, B, C, D=Dskip, z=None, delta_bias=bias,
            delta_softplus=True, axis_name="seq")

    sp = shard_map(
        sp_body,
        mesh=mesh,
        in_specs=(P(None, "seq", None), P(None, "seq", None), P(),
                  P(None, "seq", None), P(None, "seq", None), P(), P()),
        out_specs=P(None, "seq", None),
    )

    def loss_sp(u, delta, A, B, C):
        return jnp.sum(jnp.sin(sp(u, delta, A, B, C, Dskip, bias)))

    def loss_ref(u, delta, A, B, C):
        y = selective_scan_ref(u, delta, A, B, C, Dskip, z=None,
                               delta_bias=bias, delta_softplus=True)
        return jnp.sum(jnp.sin(y))

    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
    for name, a, b in zip("u delta A B C".split(), g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-3,
                                   err_msg=f"grad {name}")


class TestSSDSeqParallel:
    """Sequence-parallel Mamba-2 SSD scan (ssd_seq_parallel) vs the
    single-device golden model."""

    @staticmethod
    def _inputs(b=2, L=128, H=4, P=8, G=2, N=8, key=0):
        ks = jax.random.split(jax.random.PRNGKey(key), 7)
        x = jax.random.normal(ks[0], (b, L, H, P))
        dt = jax.random.normal(ks[1], (b, L, H)) * 0.5
        A = -jnp.exp(jax.random.normal(ks[2], (H,)))
        B = jax.random.normal(ks[3], (b, L, G, N))
        C = jax.random.normal(ks[4], (b, L, G, N))
        Dskip = jax.random.normal(ks[5], (H,))
        bias = jnp.full((H,), 0.1, jnp.float32)
        z = jax.random.normal(ks[6], (b, L, H, P))
        return x, dt, A, B, C, Dskip, bias, z

    @pytest.mark.parametrize("n_shards", [2, 8])
    def test_matches_ref(self, n_shards):
        from zigma_tpu.ops.ssd import ssd_scan_ref
        from zigma_tpu.parallel.seq_parallel import ssd_seq_parallel

        x, dt, A, B, C, Dskip, bias, z = self._inputs()
        mesh = Mesh(np.asarray(jax.devices()[:n_shards]), ("seq",))
        # STRICT vma typing (no check_vma=False): pins the carry-variance
        # fix in _ssd_chunked/ssd_scan_ref -- a literal-zeros lax.scan
        # carry under shard_map used to be a trace-time type error
        fn = jax.shard_map(
            partial(ssd_seq_parallel, dt_softplus=True, axis_name="seq",
                    chunk=16),
            mesh=mesh,
            in_specs=(P(None, "seq"), P(None, "seq"), P(),
                      P(None, "seq"), P(None, "seq"), P(),
                      P(None, "seq"), P()),
            out_specs=P(None, "seq"),
        )
        y_sp = fn(x, dt, A, B, C, Dskip, z, bias)
        y_ref = ssd_scan_ref(x, dt, A, B, C, D=Dskip, z=z, dt_bias=bias,
                             dt_softplus=True)
        np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref),
                                   rtol=2e-3, atol=2e-3)

    def test_grads_match(self):
        from zigma_tpu.ops.ssd import ssd_scan_ref
        from zigma_tpu.parallel.seq_parallel import ssd_seq_parallel

        x, dt, A, B, C, Dskip, bias, _ = self._inputs(L=64)
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("seq",))

        def sp_body(x, dt, A, B, C, Dskip, bias):
            return ssd_seq_parallel(
                x, dt, A, B, C, D=Dskip, z=None, dt_bias=bias,
                dt_softplus=True, axis_name="seq", chunk=16)

        sp = jax.shard_map(
            sp_body,
            mesh=mesh,
            in_specs=(P(None, "seq"), P(None, "seq"), P(),
                      P(None, "seq"), P(None, "seq"), P(), P()),
            out_specs=P(None, "seq"),
        )

        def loss_sp(x, dt, B, C):
            return jnp.sum(jnp.sin(sp(x, dt, A, B, C, Dskip, bias)))

        def loss_ref(x, dt, B, C):
            return jnp.sum(jnp.sin(ssd_scan_ref(
                x, dt, A, B, C, D=Dskip, dt_bias=bias, dt_softplus=True)))

        g_sp = jax.grad(loss_sp, argnums=(0, 1, 2, 3))(x, dt, B, C)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, dt, B, C)
        for a, b_, name in zip(g_sp, g_ref, "x dt B C".split()):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3,
                err_msg=f"grad wrt {name}")
