"""SSD (Mamba-2) op and Mamba2 mixer tests.

Beyond reference parity (the reference has no Mamba-2 anywhere); the test
strategy mirrors the kernel-layer pattern SURVEY.md §4 mandates for every
fast path: a sequential golden model (``ssd_scan_ref``) vs the fast
chunked matmul form, forward AND gradients, plus decode/prefill
consistency — the same two-implementation discipline as
``test_selective_scan.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zigma_tpu.models import Mamba2, Mamba2Cache, ZigMa
from zigma_tpu.ops.paths import reverse_permutation, zigzag_path
from zigma_tpu.ops.ssd import ssd_scan, ssd_scan_ref, ssd_state_update


def _inputs(key=0, b=2, L=96, H=6, P=8, G=2, N=16, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(key), 8)
    x = jax.random.normal(ks[0], (b, L, H, P), dtype)
    dt = jax.random.normal(ks[1], (b, L, H)) * 0.5   # raw: softplus'd below
    A = -jnp.exp(jax.random.normal(ks[2], (H,)))
    B = jax.random.normal(ks[3], (b, L, G, N), dtype)
    C = jax.random.normal(ks[4], (b, L, G, N), dtype)
    D = jax.random.normal(ks[5], (H,))
    z = jax.random.normal(ks[6], (b, L, H, P), dtype)
    dtb = jax.random.normal(ks[7], (H,)) * 0.3
    return x, dt, A, B, C, D, z, dtb


class TestSSDParity:
    @pytest.mark.parametrize("with_d", [False, True])
    @pytest.mark.parametrize("with_z", [False, True])
    def test_chunked_matches_ref(self, with_d, with_z):
        x, dt, A, B, C, D, z, dtb = _inputs()
        kw = dict(dt_bias=dtb, dt_softplus=True)
        if with_d:
            kw["D"] = D
        if with_z:
            kw["z"] = z
        y_ref = ssd_scan_ref(x, dt, A, B, C, **kw)
        y = ssd_scan(x, dt, A, B, C, chunk=32, **kw)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("G", [1, 3, 6])
    def test_groups(self, G):
        """B/C groups broadcast to H/G heads each (multi-value analogy)."""
        x, dt, A, *_ , dtb = _inputs(G=G)
        ks = jax.random.split(jax.random.PRNGKey(9), 2)
        B = jax.random.normal(ks[0], (2, 96, G, 16))
        C = jax.random.normal(ks[1], (2, 96, G, 16))
        y_ref = ssd_scan_ref(x, dt, A, B, C, dt_bias=dtb, dt_softplus=True)
        y = ssd_scan(x, dt, A, B, C, dt_bias=dtb, dt_softplus=True, chunk=32)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("chunk", [16, 32, 96, 128])
    def test_chunk_invariance(self, chunk):
        """Any chunk size (incl. chunk > L -> full padding) is exact."""
        x, dt, A, B, C, D, z, dtb = _inputs(L=96)
        y_ref = ssd_scan_ref(x, dt, A, B, C, D=D, dt_bias=dtb,
                             dt_softplus=True)
        y = ssd_scan(x, dt, A, B, C, D=D, dt_bias=dtb, dt_softplus=True,
                     chunk=chunk)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-4, rtol=1e-4)

    def test_d_per_headdim(self):
        """(H, P)-shaped skip (the D_has_hdim variant)."""
        x, dt, A, B, C, _, _, dtb = _inputs()
        D2 = jax.random.normal(jax.random.PRNGKey(11), (6, 8))
        y_ref = ssd_scan_ref(x, dt, A, B, C, D=D2, dt_bias=dtb,
                             dt_softplus=True)
        y = ssd_scan(x, dt, A, B, C, D=D2, dt_bias=dtb, dt_softplus=True,
                     chunk=32)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-4, rtol=1e-4)

    def test_bf16(self):
        """bf16 activations stay within the bf16 noise floor of the fp32
        truth (same bound class as the Mamba-1 kernel's bf16 gate)."""
        x, dt, A, B, C, D, z, dtb = _inputs(L=128)
        cast = lambda a: a.astype(jnp.bfloat16)
        y = ssd_scan(cast(x), dt, A, cast(B), cast(C), D=D, dt_bias=dtb,
                     dt_softplus=True, chunk=64)
        y_ref = ssd_scan_ref(x, dt, A, B, C, D=D, dt_bias=dtb,
                             dt_softplus=True)
        assert y.dtype == jnp.bfloat16
        rel = (jnp.max(jnp.abs(y.astype(jnp.float32) - y_ref)) /
               jnp.max(jnp.abs(y_ref)))
        assert float(rel) < 0.03

    def test_gradients_match_ref(self):
        x, dt, A, B, C, D, z, dtb = _inputs()

        def make(backend):
            def f(x, dt, A, B, C, D, dtb):
                y = ssd_scan(x, dt, A, B, C, D=D, z=z, dt_bias=dtb,
                             dt_softplus=True, backend=backend, chunk=32)
                return jnp.sum(y * y)
            return jax.grad(f, argnums=tuple(range(7)))

        g_ref = make("ref")(x, dt, A, B, C, D, dtb)
        g_chk = make("chunked")(x, dt, A, B, C, D, dtb)
        for gr, gc, name in zip(g_ref, g_chk, "x dt A B C D dt_bias".split()):
            scale = max(float(jnp.max(jnp.abs(gr))), 1.0)
            np.testing.assert_allclose(
                np.asarray(gc) / scale, np.asarray(gr) / scale, atol=2e-5,
                err_msg=f"grad wrt {name}")

    def test_state_threading(self):
        """initial_state/return_last_state compose: split == full scan."""
        x, dt, A, B, C, D, _, dtb = _inputs(L=96)
        kw = dict(D=D, dt_bias=dtb, dt_softplus=True, chunk=32)
        y1, s1 = ssd_scan(x[:, :48], dt[:, :48], A, B[:, :48], C[:, :48],
                          return_last_state=True, **kw)
        y2 = ssd_scan(x[:, 48:], dt[:, 48:], A, B[:, 48:], C[:, 48:],
                      initial_state=s1, **kw)
        yf, sf = ssd_scan(x, dt, A, B, C, return_last_state=True, **kw)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([y1, y2], 1)), np.asarray(yf),
            atol=2e-4, rtol=1e-4)
        _, s_ref = ssd_scan_ref(x, dt, A, B, C, return_last_state=True,
                                D=D, dt_bias=dtb, dt_softplus=True)
        np.testing.assert_allclose(np.asarray(sf), np.asarray(s_ref),
                                   atol=1e-4, rtol=1e-4)

    def test_decode_matches_scan(self):
        """ssd_state_update token loop == the parallel scan."""
        x, dt, A, B, C, D, _, dtb = _inputs(L=24)
        y_ref = ssd_scan_ref(x, dt, A, B, C, D=D, dt_bias=dtb,
                             dt_softplus=True)
        state = jnp.zeros((2, 6, 8, 16))
        ys = []
        for t in range(24):
            yt, state = ssd_state_update(
                state, x[:, t], dt[:, t], A, B[:, t], C[:, t], D=D,
                dt_bias=dtb, dt_softplus=True)
            ys.append(yt)
        np.testing.assert_allclose(np.asarray(jnp.stack(ys, 1)),
                                   np.asarray(y_ref), atol=1e-4, rtol=1e-4)

    def test_validation(self):
        x, dt, A, B, C, D, z, dtb = _inputs()
        with pytest.raises(ValueError, match="dt shape"):
            ssd_scan(x, dt[:, :, :3], A, B, C)
        with pytest.raises(ValueError, match="not divisible by groups"):
            k4 = jax.random.PRNGKey(12)
            B4 = jax.random.normal(k4, (2, 96, 4, 16))
            ssd_scan(x, dt, A, B4, B4)  # H=6 heads, G=4 groups
        with pytest.raises(ValueError, match="unknown backend"):
            ssd_scan(x, dt, A, B, C, backend="pallas")


class TestMamba2:
    def _make(self, scan_type="v1", **kw):
        kw.setdefault("d_state", 16)
        kw.setdefault("headdim", 16)
        kw.setdefault("scan_backend", "ref")
        return Mamba2(d_model=64, scan_type=scan_type, **kw)

    def test_v1_shape_and_fast_backend(self):
        m = self._make("v1")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64))
        params = m.init(jax.random.PRNGKey(1), x)
        y = m.apply(params, x)
        assert y.shape == x.shape and jnp.isfinite(y).all()
        m_fast = self._make("v1", scan_backend="auto")
        y_fast = m_fast.apply(params, x)
        np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y),
                                   atol=1e-4, rtol=1e-4)

    def test_v2_has_backward_branch(self):
        m = self._make("v2")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64))
        params = m.init(jax.random.PRNGKey(1), x)
        assert "ssd_b" in params["params"]
        y = m.apply(params, x)
        assert y.shape == x.shape
        # the backward branch really sees the flipped sequence: flipping
        # the input must flip a pure-v2-difference output component
        y_flip = m.apply(params, jnp.flip(x, axis=1))
        assert not np.allclose(np.asarray(y), np.asarray(y_flip))

    def test_groups(self):
        m = self._make("v1", ngroups=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64))
        params = m.init(jax.random.PRNGKey(1), x)
        assert m.apply(params, x).shape == x.shape

    def test_zigzag_perm_consistency(self):
        """Permuted scan == manually permuting in/out of a v1 scan
        (same equivariance contract as Mamba-1, test_model.py)."""
        N = 4
        perm = zigzag_path(N)[1]
        perm_rev = reverse_permutation(perm)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, N * N, 64))
        mz = self._make("zigzagN8", perm=perm, perm_rev=perm_rev)
        params = mz.init(jax.random.PRNGKey(1), x)
        y_z = mz.apply(params, x)
        mv = self._make("v1")
        x_p = jnp.take(x, jnp.asarray(perm), axis=1)
        y_v = jnp.take(mv.apply(params, x_p), jnp.asarray(perm_rev), axis=1)
        np.testing.assert_allclose(np.asarray(y_z), np.asarray(y_v),
                                   atol=1e-5)

    def test_video_fold(self):
        m = self._make("zzvideo_sst", video_frames=4, st="t")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4 * 9, 64))
        params = m.init(jax.random.PRNGKey(1), x)
        assert m.apply(params, x).shape == x.shape

    def test_parallelN_rejected(self):
        m = self._make("parallelN4")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64))
        with pytest.raises(ValueError, match="Mamba-1"):
            m.init(jax.random.PRNGKey(1), x)

    def test_decode_step_matches_forward(self):
        m = self._make("v1")
        B, L, D = 2, 8, 64
        x = jax.random.normal(jax.random.PRNGKey(0), (B, L, D))
        params = m.init(jax.random.PRNGKey(1), x)
        y_par = m.apply(params, x)
        cache = Mamba2Cache.init(B, m.conv_dim, m.d_conv, m.nheads,
                                 m.headdim, m.d_state)
        ys = []
        for i in range(L):
            y_i, cache = m.apply(params, x[:, i:i + 1], cache,
                                 method=Mamba2.step)
            ys.append(y_i)
        np.testing.assert_allclose(
            np.asarray(y_par), np.asarray(jnp.concatenate(ys, 1)),
            atol=1e-4, rtol=1e-3)

    def test_prefill_then_step(self):
        m = self._make("v1")
        B, L = 2, 12
        x = jax.random.normal(jax.random.PRNGKey(0), (B, L, 64))
        params = m.init(jax.random.PRNGKey(1), x)
        y_par = m.apply(params, x)
        y_pre, cache = m.apply(params, x[:, :8], method=Mamba2.prefill)
        np.testing.assert_allclose(np.asarray(y_pre), np.asarray(y_par[:, :8]),
                                   atol=1e-4, rtol=1e-3)
        ys = []
        for i in range(8, L):
            y_i, cache = m.apply(params, x[:, i:i + 1], cache,
                                 method=Mamba2.step)
            ys.append(y_i)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate(ys, 1)), np.asarray(y_par[:, 8:]),
            atol=1e-4, rtol=1e-3)


class TestMamba2LM:
    """Mamba-2 in the LM stack (ssm_cfg.ssm_version=2): forward, prefill
    cache consistency, compiled greedy generate."""

    def _lm(self):
        from zigma_tpu.models.lm import MambaLMHeadModel

        return MambaLMHeadModel(
            d_model=32, n_layer=2, vocab_size=32, rms_norm=True,
            ssm_cfg={"ssm_version": 2, "d_state": 8, "headdim": 16})

    def test_prefill_cache_matches_steps(self):
        from zigma_tpu.models.lm import MambaLMHeadModel

        m = self._lm()
        ids = jnp.array([[5, 3, 8, 1, 9, 2, 7, 4]])
        params = m.init(jax.random.PRNGKey(0), ids)
        logits_p, caches_p = m.apply(params, ids,
                                     method=MambaLMHeadModel.prefill)
        caches_s = m.init_caches(1)
        for i in range(ids.shape[1]):
            logits_s, caches_s = m.apply(params, ids[:, i:i + 1], caches_s,
                                         method=MambaLMHeadModel.step)
        np.testing.assert_allclose(np.asarray(logits_p),
                                   np.asarray(logits_s[:, 0]),
                                   atol=2e-4, rtol=1e-3)
        for (cp, sp), (cs, ss) in zip(caches_p, caches_s):
            np.testing.assert_allclose(np.asarray(cp), np.asarray(cs),
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(sp), np.asarray(ss),
                                       atol=1e-4, rtol=1e-3)

    def test_generate_greedy(self):
        from zigma_tpu.models.lm import generate

        m = self._lm()
        ids = jnp.array([[1, 2, 3]])
        params = m.init(jax.random.PRNGKey(0), ids)
        out1 = generate(m, params, ids, max_new_tokens=5)
        out2 = generate(m, params, ids, max_new_tokens=5)
        assert out1.shape == (1, 8)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


class TestMamba2TrainCLI:
    def test_ssm2_preset_trains(self, tmp_path):
        """The shipped zigzag8_b1_pe2_ssm2 preset wires ssm_cfg through
        the YAML -> registry -> ZigMaBlock mixer-selection path; shrunk
        to toy geometry for the smoke run."""
        from zigma_tpu.cli.train import main

        out = str(tmp_path / "out")
        state = main([
            "model=zigzag8_b1_pe2_ssm2", "data=synthetic",
            "data.batch_size=8", "data.train_steps=2",
            "model.params.embed_dim=32", "model.params.depth=2",
            "model.params.img_dim=8", "model.params.patch_size=2",
            "model.params.use_checkpoint=false",
            "model.params.ssm_cfg.d_state=8",
            "model.params.ssm_cfg.headdim=16",
            "mixed_precision=fp32", "log_every=1", "ckpt_every=1000000",
            f"results_dir={out}"])
        assert int(jax.device_get(state.step)) == 2


class TestZigMaMamba2:
    """ZigMa with ssm_cfg={'ssm_version': 2}: the MXU-mixer denoiser."""

    def _model(self, **kw):
        ssm = dict(ssm_version=2, d_state=16, headdim=16)
        ssm.update(kw.pop("ssm_cfg", {}))
        return ZigMa(in_channels=4, embed_dim=64, depth=2, img_dim=8, patch_size=1,
                     scan_type="zigzagN8", use_pe=2, ssm_cfg=ssm, **kw)

    def test_forward(self):
        model = self._model(scan_layers=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jax.random.uniform(jax.random.PRNGKey(1), (2,))
        params = model.init(jax.random.PRNGKey(2), x, t, None)
        y = model.apply(params, x, t, None)
        assert y.shape == x.shape and jnp.isfinite(y).all()

    def test_scan_over_layers_matches_python_loop(self):
        """Mamba2 params stack cleanly under nn.scan (same contract as the
        Mamba-1 scan-over-layers test in test_model.py)."""
        kw = dict(in_channels=4, embed_dim=64, depth=3, img_dim=8,
                  patch_size=1,
                  scan_type="zigzagN8", use_pe=2,
                  ssm_cfg=dict(ssm_version=2, d_state=16, headdim=16))
        m_py = ZigMa(scan_layers=False, **kw)
        m_scan = ZigMa(scan_layers=True, **kw)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jax.random.uniform(jax.random.PRNGKey(1), (2,))
        params = m_py.init(jax.random.PRNGKey(2), x, t)

        from zigma_tpu.convert.torch_zigma import jax_tree_stack

        p = dict(params["params"])
        blocks = [p.pop(f"blocks_{i}") for i in range(3)]
        p["blocks"] = jax.tree.map(jnp.asarray, jax_tree_stack(
            [jax.tree.map(np.asarray, b) for b in blocks]))
        np.testing.assert_allclose(
            np.asarray(m_py.apply(params, x, t)),
            np.asarray(m_scan.apply({"params": p}, x, t)),
            atol=2e-5, rtol=1e-4)

    def test_tp_sharding_and_forward(self):
        """zigma_param_sharding on the Mamba2 tree: the Mamba-1 rank rules
        (A_log 2-D) must not crash on the scalar-decay homonyms, and the
        DPxTP forward must execute (GSPMD preserves semantics; the rules
        are placement hints)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from zigma_tpu.parallel import make_mesh, zigma_param_sharding

        mesh = make_mesh(data=4, model=2)
        model = self._model(scan_layers=False)
        x = jnp.zeros((4, 4, 8, 8))
        t = jnp.zeros((4,))
        params = model.init(jax.random.PRNGKey(0), x, t)
        shardings = zigma_param_sharding(params, mesh)
        params = jax.tree.map(jax.device_put, params, shardings)
        x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
        out = jax.jit(lambda p, xx, tt: model.apply(p, xx, tt))(
            params, x_sh, t)
        assert out.shape == x.shape and jnp.isfinite(out).all()

        # stacked (scan-over-layers) layout: the Mamba-1 branch rules must
        # NOT shard the SSD branch's recurrence params — a bare A_log rule
        # would put the LAYER axis of the stacked (depth, nheads) A_log on
        # 'model' (wrong semantics + a divisibility crash at depth % tp
        # != 0); in/out_proj keep their generic column/row sharding
        m_scan = ZigMa(in_channels=4, embed_dim=64, depth=3, img_dim=8,
                       patch_size=1, scan_type="zigzagN8", use_pe=2,
                       scan_layers=True,
                       ssm_cfg=dict(ssm_version=2, d_state=16, headdim=16))
        p_scan = m_scan.init(jax.random.PRNGKey(1), x, t)
        sh = zigma_param_sharding(p_scan, mesh)
        blocks = sh["params"]["blocks"]["mixer"]
        assert blocks["ssd"]["A_log"].spec == P()
        assert blocks["ssd"]["dt_bias"].spec == P()
        assert "model" in tuple(blocks["in_proj"]["kernel"].spec)
        # depth=3 is NOT divisible by model=2 — placement must still work
        jax.tree.map(jax.device_put, p_scan, sh)

    def test_train_step_smoke(self):
        """One jitted grad step through the Mamba2 denoiser."""
        model = self._model()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jax.random.uniform(jax.random.PRNGKey(1), (2,))
        params = model.init(jax.random.PRNGKey(2), x, t, None)

        @jax.jit
        def loss(p):
            return jnp.mean(model.apply(p, x, t, None) ** 2)

        g = jax.grad(loss)(params)
        flat = jax.tree.leaves(g)
        assert all(jnp.isfinite(l).all() for l in flat)
        # the mixer path actually receives gradient
        gn = sum(float(jnp.sum(jnp.abs(l))) for l in flat)
        assert gn > 0
