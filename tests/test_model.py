"""Model-level tests: Mamba mixer and ZigMa forward shapes/dtypes.

Mirrors the reference's module/model smoke checks
(dis_mamba/test_mamba_module.py, model_zigma.py:1214-1239 __main__) but as a
real pytest suite, plus permutation-equivariance checks the reference lacks.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from zigma_tpu.models import Mamba, MambaCache, ZigMa
from zigma_tpu.ops.paths import reverse_permutation, zigzag_path


class TestMamba:
    def _make(self, scan_type="v1", **kw):
        return Mamba(d_model=64, d_state=16, scan_backend="ref", scan_type=scan_type,
                     **kw)

    def test_v1_shape(self):
        m = self._make("v1")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64))
        params = m.init(jax.random.PRNGKey(1), x)
        y = m.apply(params, x)
        assert y.shape == x.shape
        assert jnp.isfinite(y).all()

    def test_v2_has_backward_branch(self):
        m = self._make("v2")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64))
        params = m.init(jax.random.PRNGKey(1), x)
        assert "scan_b" in params["params"]
        y = m.apply(params, x)
        assert y.shape == x.shape

    def test_zigzag_perm_consistency(self):
        """A permuted scan equals manually permuting in/out of a v1 scan."""
        N = 4
        perm = zigzag_path(N)[1]
        perm_rev = reverse_permutation(perm)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, N * N, 64))

        mz = Mamba(d_model=64, scan_type="zigzagN8", scan_backend="ref",
                   perm=perm, perm_rev=perm_rev)
        params = mz.init(jax.random.PRNGKey(1), x)
        y_z = mz.apply(params, x)

        mv = Mamba(d_model=64, scan_type="v1", scan_backend="ref")
        x_p = jnp.take(x, jnp.asarray(perm), axis=1)
        y_v = mv.apply(params, x_p)
        y_v = jnp.take(y_v, jnp.asarray(perm_rev), axis=1)
        np.testing.assert_allclose(np.asarray(y_z), np.asarray(y_v), atol=1e-5)

    def test_decode_step_matches_forward(self):
        """Sequential step() decode reproduces the parallel v1 forward."""
        m = self._make("v1")
        B, L, D = 2, 8, 64
        x = jax.random.normal(jax.random.PRNGKey(0), (B, L, D))
        params = m.init(jax.random.PRNGKey(1), x)
        y_par = m.apply(params, x)

        cache = MambaCache.init(B, m.d_inner, m.d_conv, m.d_state)
        ys = []
        for i in range(L):
            y_i, cache = m.apply(params, x[:, i : i + 1], cache, method=Mamba.step)
            ys.append(y_i)
        y_seq = jnp.concatenate(ys, axis=1)
        np.testing.assert_allclose(
            np.asarray(y_par), np.asarray(y_seq), atol=1e-4, rtol=1e-3)


class TestZigMa:
    def _forward(self, model, x_shape, y=None, key=0):
        x = jax.random.normal(jax.random.PRNGKey(key), x_shape)
        t = jax.random.uniform(jax.random.PRNGKey(key + 1), (x_shape[0],))
        params = model.init(jax.random.PRNGKey(key + 2), x, t, y)
        return params, model.apply(params, x, t, y)

    def test_image_uncond(self):
        m = ZigMa(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                  patch_size=1, scan_type="zigzagN8", use_pe=2,
                  scan_backend="ref")
        _, y = self._forward(m, (2, 4, 8, 8))
        assert y.shape == (2, 4, 8, 8)
        assert jnp.isfinite(y).all()

    def test_image_text(self):
        m = ZigMa(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                  patch_size=2, has_text=True, d_context=32,
                  scan_type="zigzagN2", use_pe=2, scan_backend="ref")
        ctx = jax.random.normal(jax.random.PRNGKey(9), (2, 7, 32))
        _, out = self._forward(m, (2, 4, 8, 8), y=ctx)
        assert out.shape == (2, 4, 8, 8)

    def test_image_class_cond(self):
        m = ZigMa(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                  patch_size=1, num_classes=10, scan_type="v2",
                  scan_backend="ref")
        labels = jnp.array([1, 3])
        _, out = self._forward(m, (2, 4, 8, 8), y=labels)
        assert out.shape == (2, 4, 8, 8)

    def test_class_dropout_null_row_and_cfg_default(self):
        """class_dropout_prob>0 allocates the null-class row and
        forward_with_cfg defaults y_null to it for integer labels."""
        m = ZigMa(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                  patch_size=1, num_classes=10, scan_type="v1",
                  class_dropout_prob=0.1, scan_backend="ref")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jnp.zeros((2,))
        y = jnp.array([1, 3])
        params = m.init(jax.random.PRNGKey(1), x, t, y)
        table = params["params"]["y_embedder"]["embedding"]["embedding"]
        assert table.shape[0] == 11  # 10 classes + null row

        guided = m.apply(params, x, t, y, 2.0,
                         method=ZigMa.forward_with_cfg)
        explicit = m.apply(params, x, t, y, 2.0,
                           jnp.full_like(y, 10),
                           method=ZigMa.forward_with_cfg)
        np.testing.assert_allclose(np.asarray(guided), np.asarray(explicit),
                                   atol=1e-6)
        # cfg_scale=1 reduces to the plain conditional forward
        plain = m.apply(params, x, t, y)
        cfg1 = m.apply(params, x, t, y, 1.0, method=ZigMa.forward_with_cfg)
        np.testing.assert_allclose(np.asarray(cfg1), np.asarray(plain),
                                   atol=1e-5)

    def test_use_pe3_scan_layers(self):
        """Per-layer PEs must be real, USED params in BOTH layer layouts
        (the scan layout stacks them as one (depth, 1, L, D) param)."""
        kw = dict(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                  patch_size=1, scan_type="zigzagN2", use_pe=3,
                  scan_backend="ref")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jnp.zeros((2,))

        m_loop = ZigMa(**kw, scan_layers=False)
        p_loop = m_loop.init(jax.random.PRNGKey(1), x, t)
        assert "pos_embed_0" in p_loop["params"]
        m_scan = ZigMa(**kw, scan_layers=True)
        p_scan = m_scan.init(jax.random.PRNGKey(1), x, t)
        pe = p_scan["params"]["pos_embed_layers"]
        assert pe.shape == (2, 1, 64, 64)

        # the PE must influence the output (zero-init -> perturb -> change)
        base = m_scan.apply(p_scan, x, t)
        p2 = jax.tree.map(lambda a: a, p_scan)
        p2["params"]["pos_embed_layers"] = pe + 1.0
        assert not jnp.allclose(m_scan.apply(p2, x, t), base)

    def test_video(self):
        m = ZigMa(in_channels=4, embed_dim=64, depth=4, img_dim=8,
                  patch_size=2, scan_type="zzvideo_sst", video_frames=3,
                  tpe=True, use_pe=2, scan_backend="ref")
        _, out = self._forward(m, (2, 3, 4, 8, 8))
        assert out.shape == (2, 3, 4, 8, 8)
        assert jnp.isfinite(out).all()

    def test_video_use_pe1_sincos_tiled_per_frame(self):
        """use_pe=1 (fixed sincos) on video shapes: the spatial table is
        tiled across frames (zigma.py per-frame tiling; the video suite
        otherwise only exercises pe=2)."""
        def build(pe):
            return ZigMa(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                         patch_size=2, scan_type="zzvideo_sst",
                         video_frames=3, tpe=True, use_pe=pe,
                         scan_backend="ref")

        m1 = build(1)
        _, out1 = self._forward(m1, (2, 3, 4, 8, 8))
        assert out1.shape == (2, 3, 4, 8, 8)
        assert jnp.isfinite(out1).all()
        # neither pe=0 nor pe=1 adds parameters, so the same init seed
        # gives identical trees — any output difference IS the sincos PE
        m0 = build(0)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 8, 8))
        t = jnp.zeros((2,))
        p = m0.init(jax.random.PRNGKey(1), x, t)
        assert not jnp.allclose(m0.apply(p, x, t), m1.apply(p, x, t))

    def test_adaln_zero_init_output_is_input_independent_of_blocks(self):
        """With zero-init adaLN gates, block contributions start at zero, so
        two models differing only in mixer params give the same output at
        init... not exactly (mixer params don't matter when gate=0)."""
        m = ZigMa(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                  patch_size=1, scan_type="v1", scan_backend="ref")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jnp.zeros((2,))
        params = m.init(jax.random.PRNGKey(1), x, t)
        out = m.apply(params, x, t)
        # gate = 0 => residual stream is just the patch embedding; finite
        assert jnp.isfinite(out).all()

    def test_jit_and_grad(self):
        m = ZigMa(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                  patch_size=1, scan_type="zigzagN8", use_pe=2)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jax.random.uniform(jax.random.PRNGKey(1), (2,))
        params = m.init(jax.random.PRNGKey(2), x, t)

        @jax.jit
        def loss(p):
            return jnp.mean(m.apply(p, x, t) ** 2)

        g = jax.grad(loss)(params)
        flat, _ = jax.flatten_util.ravel_pytree(g)
        assert jnp.isfinite(flat).all()

    def test_scan_layers_matches_loop(self):
        """nn.scan-over-layers path equals the python-loop path given the
        same (restacked) parameters."""
        kw = dict(in_channels=4, embed_dim=64, depth=3, img_dim=8,
                  patch_size=1, scan_type="zigzagN2", use_pe=2,
                  scan_backend="ref")
        m_loop = ZigMa(scan_layers=False, **kw)
        m_scan = ZigMa(scan_layers=True, **kw)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jax.random.uniform(jax.random.PRNGKey(1), (2,))
        params = m_loop.init(jax.random.PRNGKey(2), x, t)

        from zigma_tpu.convert.torch_zigma import jax_tree_stack

        p = dict(params["params"])
        blocks = [p.pop(f"blocks_{i}") for i in range(3)]
        p["blocks"] = jax.tree.map(jnp.asarray, jax_tree_stack(
            [jax.tree.map(np.asarray, b) for b in blocks]))
        stacked = {"params": p}

        np.testing.assert_allclose(
            np.asarray(m_loop.apply(params, x, t)),
            np.asarray(m_scan.apply(stacked, x, t)), atol=2e-5, rtol=1e-4)

    def test_use_checkpoint_matches(self):
        kw = dict(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                  patch_size=1, scan_type="v1", scan_backend="ref")
        m1 = ZigMa(**kw)
        m2 = ZigMa(use_checkpoint=True, **kw)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jax.random.uniform(jax.random.PRNGKey(1), (2,))
        params = m1.init(jax.random.PRNGKey(2), x, t)
        np.testing.assert_allclose(
            np.asarray(m1.apply(params, x, t)),
            np.asarray(m2.apply(params, x, t)), atol=1e-6)


class TestParallelN:
    def test_parallel_branches_scan_distinct_paths(self):
        """parallelN layers must have NO outer per-layer permutation; each
        branch scans its own zigzag path (regression for the composed-
        permutation bug)."""
        from zigma_tpu.ops.paths import build_layer_paths

        paths, paths_rev, st = build_layer_paths("parallelN4", 3, 4)
        assert paths == [None] * 3 and paths_rev == [None] * 3

        m = ZigMa(in_channels=4, embed_dim=32, depth=2, img_dim=8,
                  patch_size=2, scan_type="parallelN2", scan_backend="ref")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jnp.zeros((2,))
        params = m.init(jax.random.PRNGKey(1), x, t)
        assert "scan_b0" in params["params"]["blocks_0"]["mixer"]
        assert "scan_b1" in params["params"]["blocks_0"]["mixer"]
        out = m.apply(params, x, t)
        assert jnp.isfinite(out).all()

    def test_parallel_without_perms_raises(self):
        m = Mamba(d_model=32, scan_type="parallelN2", scan_backend="ref")
        x = jnp.zeros((1, 16, 32))
        with pytest.raises(ValueError, match="parallel_perms"):
            m.init(jax.random.PRNGKey(0), x)

    def test_prefill_non_v1_raises(self):
        from zigma_tpu.models import MambaCache

        m = Mamba(d_model=32, scan_type="v2", scan_backend="ref")
        x = jnp.zeros((1, 8, 32))
        params = m.init(jax.random.PRNGKey(0), x)
        with pytest.raises(ValueError, match="v1"):
            m.apply(params, x, method=Mamba.prefill)


class TestDropPath:
    def _model(self, **kw):
        return ZigMa(in_channels=4, embed_dim=32, depth=3, img_dim=8,
                     patch_size=2, scan_type="zigzagN2", use_pe=2,
                     scan_backend="ref", **kw)

    def test_eval_mode_no_drop(self):
        """Without train=True, drop_path is inactive (deterministic)."""
        m = self._model(drop_path_rate=0.5)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jnp.full((2,), 0.4)
        params = m.init(jax.random.PRNGKey(1), x, t)
        o1 = m.apply(params, x, t)
        o2 = m.apply(params, x, t)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_train_mode_stochastic(self):
        """train=True + rate>0: different dropout keys change the output."""
        m = self._model(drop_path_rate=0.9)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 8, 8))
        t = jnp.full((4,), 0.4)
        params = m.init(
            {"params": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)}, x, t, train=True)
        o1 = m.apply(params, x, t, train=True,
                     rngs={"dropout": jax.random.PRNGKey(3)})
        o2 = m.apply(params, x, t, train=True,
                     rngs={"dropout": jax.random.PRNGKey(4)})
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_rate_zero_matches_eval(self):
        m = self._model(drop_path_rate=0.0)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jnp.full((2,), 0.4)
        params = m.init(jax.random.PRNGKey(1), x, t)
        o_train = m.apply(params, x, t, train=True,
                          rngs={"dropout": jax.random.PRNGKey(3)})
        o_eval = m.apply(params, x, t)
        np.testing.assert_allclose(np.asarray(o_train), np.asarray(o_eval),
                                   atol=1e-6)


class TestPermuteTokens:
    """permute_tokens: the bijection-aware gather whose VJP is the inverse
    gather (never a scatter-add) — must be BIT-identical to jnp.take in both
    directions (round 3, docs/DESIGN.md §8)."""

    def test_forward_and_adjoint_bit_identical_to_take(self):
        from zigma_tpu.models.mamba import permute_tokens

        rng = np.random.default_rng(3)
        L = 64
        perm = jnp.asarray(np.argsort(rng.standard_normal(L)), jnp.int32)
        inv = jnp.asarray(np.argsort(np.asarray(perm)), jnp.int32)
        x = jnp.asarray(rng.standard_normal((2, L, 8)), jnp.float32)

        np.testing.assert_array_equal(
            np.asarray(permute_tokens(x, perm, inv)),
            np.asarray(jnp.take(x, perm, axis=1)))

        def loss(f):
            def g(xx):
                y = f(xx)
                w = jnp.sin(jnp.arange(y.size, dtype=jnp.float32)
                            ).reshape(y.shape)
                return jnp.sum(y * w)
            return g

        g_take = jax.grad(loss(lambda xx: jnp.take(xx, perm, axis=1)))(x)
        g_perm = jax.grad(loss(lambda xx: permute_tokens(xx, perm, inv)))(x)
        np.testing.assert_array_equal(np.asarray(g_perm), np.asarray(g_take))

    def test_round_trip_is_identity(self):
        from zigma_tpu.models.mamba import permute_tokens

        rng = np.random.default_rng(4)
        L = 32
        perm = jnp.asarray(np.argsort(rng.standard_normal(L)), jnp.int32)
        inv = jnp.asarray(np.argsort(np.asarray(perm)), jnp.int32)
        x = jnp.asarray(rng.standard_normal((1, L, 4)), jnp.float32)
        y = permute_tokens(permute_tokens(x, perm, inv), inv, perm)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_mismatched_pair_raises(self):
        m = Mamba(d_model=16, d_state=4, scan_type="zigzagN2",
                  scan_backend="ref")
        x = jnp.zeros((1, 16, 16))
        perm = jnp.arange(16, dtype=jnp.int32)
        params = m.init(jax.random.PRNGKey(0), x, perm, perm)
        with pytest.raises(ValueError, match="perm_rev"):
            m.apply(params, x, perm, None)


class TestVideoTemporalGradients:
    """Video temporal layers pair NON-inverse (perm, perm_rev) tables — the
    reference's checkpoint-parity quirk (t_fwd paired with t_bwd,
    ops/paths.py).  permute_tokens' bijection-aware VJP must therefore
    derive the TRUE functional inverse (vjp_inverse) instead of trusting
    the paired table.  Regression: gradients through every temporal layer
    used to be silently frame-flipped while all forward/parity tests
    passed."""

    def test_video_grads_match_scatter_adjoint(self, monkeypatch):
        m = ZigMa(in_channels=4, embed_dim=64, depth=4, img_dim=8,
                  patch_size=2, scan_type="zzvideo_sst", video_frames=3,
                  tpe=True, use_pe=2, scan_backend="ref")
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((2, 3, 4, 8, 8)), jnp.float32)
        t = jnp.asarray([0.3, 0.7], jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x, t)
        # knock every param off the DiT zero-init: at init the adaLN gate
        # is 0, every mixer contribution is multiplied by 0, and the
        # permutation-VJP error this test exists to catch is invisible
        # (same degeneracy as test_reference_model_parity._perturb_all_params)
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(99), len(leaves))
        params = jax.tree.unflatten(treedef, [
            leaf + 0.02 * jax.random.normal(k, leaf.shape, leaf.dtype)
            if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf
            for leaf, k in zip(leaves, keys)])

        w = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

        def loss(xx):
            return jnp.sum(m.apply(params, xx, t) * w)

        g_fast = jax.grad(loss)(x)

        # ground truth: plain jnp.take, whose autodiff adjoint (scatter-add)
        # is correct for ANY index set, inverse-paired or not
        import zigma_tpu.models.mamba as mamba_mod
        monkeypatch.setattr(
            mamba_mod, "permute_tokens",
            lambda xx, p, ip: jnp.take(xx, p, axis=1))
        g_true = jax.grad(loss)(x)

        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_true),
                                   rtol=1e-5, atol=1e-5)
