"""Pipeline parallelism (GPipe over the block stack) — beyond parity.

The reference trains DDP-only (train_acc.py:121-123); no pipeline
parallelism exists there.  ``parallel/pipeline.py`` runs the stacked
scan-over-layers blocks as a weight-stationary pipeline over a 'pipe'
mesh axis: stage weights never move, microbatch activations hop a
``ppermute`` ring.  Because the schedule reorders nothing numerically
(same blocks, same layer order, batch-independent math), forward parity
vs the plain forward is EXACT, and that's what these tests pin — plus
gradients, remat, DP composition, the train-state 'pipe' shardings, and
the CLI wiring (parallel.pp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh
from jax.tree_util import keystr

from zigma_tpu.models import ZigMa
from zigma_tpu.parallel import (make_mesh, replicate, shard_batch,
                                shard_train_state, train_state_sharding,
                                zigma_pipelined_apply)
from zigma_tpu.train import (TrainState, create_optimizer, create_train_step,
                             make_diffusion_loss_fn)
from zigma_tpu.transport import create_transport

KW = dict(in_channels=4, embed_dim=32, depth=8, img_dim=8, patch_size=2,
          scan_type="zigzagN2", use_pe=2, scan_layers=True)


def _model_and_params(**over):
    model = ZigMa(**{**KW, **over})
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 8, 8))
    t = jnp.linspace(0.1, 0.9, 8)
    params = model.init(jax.random.PRNGKey(1), x, t)
    return model, params, x, t


def _mesh_dp_pp():
    return Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "pipe"))


class TestForwardParity:
    @pytest.mark.parametrize("n_mb", [1, 2, 4])
    def test_exact_vs_plain_forward(self, n_mb):
        model, params, x, t = _model_and_params()
        ref = model.apply(params, x, t)
        out = zigma_pipelined_apply(model, params, x, t, mesh=_mesh_dp_pp(),
                                    n_microbatches=n_mb)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_pipe_only_mesh(self):
        model, params, x, t = _model_and_params()
        mesh = Mesh(np.asarray(jax.devices()), ("pipe",))
        out = zigma_pipelined_apply(model, params, x, t, mesh=mesh,
                                    n_microbatches=2, data_axis=None)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(model.apply(params, x, t)))

    def test_cross_attention_text_rotates_with_microbatch(self):
        """has_text: per-sample conditioning must follow its microbatch
        around the ring."""
        model = ZigMa(**{**KW, "has_text": True, "d_context": 16,
                         "n_context_token": 3})
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 8, 8))
        t = jnp.linspace(0.1, 0.9, 8)
        y = jax.random.normal(jax.random.PRNGKey(2), (8, 3, 16))
        params = model.init(jax.random.PRNGKey(1), x, t, y)
        ref = model.apply(params, x, t, y)
        out = zigma_pipelined_apply(model, params, x, t, y,
                                    mesh=_mesh_dp_pp(), n_microbatches=4)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestGradients:
    def test_grad_parity(self):
        model, params, x, t = _model_and_params()
        mesh = _mesh_dp_pp()
        g_pp = jax.grad(lambda p: jnp.sum(zigma_pipelined_apply(
            model, p, x, t, mesh=mesh, n_microbatches=4) ** 2))(params)
        g_ref = jax.grad(
            lambda p: jnp.sum(model.apply(p, x, t) ** 2))(params)
        rel = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()
                               / (jnp.abs(b).max() + 1e-8)), g_pp, g_ref)
        assert max(jax.tree.leaves(rel)) < 1e-5

    def test_remat_grad_parity(self):
        model, params, x, t = _model_and_params()
        mesh = _mesh_dp_pp()
        g_pp = jax.grad(lambda p: jnp.sum(zigma_pipelined_apply(
            model, p, x, t, mesh=mesh, n_microbatches=2,
            remat=True) ** 2))(params)
        g_ref = jax.grad(
            lambda p: jnp.sum(model.apply(p, x, t) ** 2))(params)
        rel = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()
                               / (jnp.abs(b).max() + 1e-8)), g_pp, g_ref)
        assert max(jax.tree.leaves(rel)) < 1e-5


class TestValidation:
    def test_depth_not_divisible(self):
        model, params, x, t = _model_and_params(depth=6)
        with pytest.raises(ValueError, match="not divisible by pipeline"):
            zigma_pipelined_apply(model, params, x, t, mesh=_mesh_dp_pp())

    def test_batch_not_divisible_by_microbatches(self):
        model, params, x, t = _model_and_params()
        with pytest.raises(ValueError, match="n_microbatches"):
            zigma_pipelined_apply(model, params, x, t, mesh=_mesh_dp_pp(),
                                  n_microbatches=3)

    def test_microbatch_smaller_than_data_axis(self):
        model, params, x, t = _model_and_params()
        with pytest.raises(ValueError, match="'data' mesh axis"):
            zigma_pipelined_apply(model, params, x, t, mesh=_mesh_dp_pp(),
                                  n_microbatches=8)

    def test_requires_scan_layers(self):
        model, params, x, t = _model_and_params(scan_layers=False)
        with pytest.raises(ValueError, match="scan-over-layers"):
            zigma_pipelined_apply(model, params, x, t, mesh=_mesh_dp_pp())

    def test_drop_path_under_train_rejected(self):
        model, params, x, t = _model_and_params(drop_path_rate=0.1)
        with pytest.raises(ValueError, match="stochastic depth"):
            zigma_pipelined_apply(model, params, x, t, mesh=_mesh_dp_pp(),
                                  train=True,
                                  rngs={"dropout": jax.random.PRNGKey(0)})


class TestStateSharding:
    def test_blocks_sharded_over_pipe(self):
        mesh = make_mesh(pipe=4)
        model, params, _, _ = _model_and_params()
        state = TrainState.create(params, create_optimizer())
        sh = train_state_sharding(state, mesh)
        blk = sh.params["params"]["blocks"]["mixer"]["in_proj"]["kernel"]
        assert tuple(blk.spec)[0] == "pipe", blk.spec
        # non-block leaves stay replicated
        assert tuple(sh.params["params"]["pos_embed"].spec) == ()
        # EMA and Adam moments mirror the params
        ema = sh.ema_params["params"]["blocks"]["mixer"]["in_proj"]["kernel"]
        assert tuple(ema.spec)[0] == "pipe"
        mus = [s for p, s in jax.tree_util.tree_leaves_with_path(sh.opt_state)
               if "in_proj" in keystr(p) and ".mu" in keystr(p)]
        assert mus and tuple(mus[0].spec)[0] == "pipe"

    def test_pipe_plus_fsdp_compose(self):
        mesh = make_mesh(data=2, pipe=4)
        model, params, _, _ = _model_and_params()
        state = TrainState.create(params, create_optimizer())
        sh = train_state_sharding(state, mesh, fsdp=True, fsdp_min_size=64)
        blk = tuple(
            sh.params["params"]["blocks"]["mixer"]["in_proj"]["kernel"].spec)
        assert blk[0] == "pipe" and "data" in blk, blk


class TestTraining:
    def test_pp_train_step_matches_dp(self):
        """Two optimizer steps: pipelined loss == plain loss, same rng."""
        mesh = make_mesh(data=2, pipe=4)
        model, params, x, _ = _model_and_params(drop_path_rate=0.0)
        optimizer = create_optimizer()
        transport = create_transport("Linear", "velocity")

        def pp_apply(p, xt, t, y=None, train=False, rngs=None, **kw):
            return zigma_pipelined_apply(model, p, xt, t, y, mesh=mesh,
                                         train=train, rngs=rngs, **kw)

        step_pp = create_train_step(
            make_diffusion_loss_fn(model, transport, apply_fn=pp_apply),
            optimizer)
        step_dp = create_train_step(
            make_diffusion_loss_fn(model, transport), optimizer)

        batch = shard_batch({"x": x}, mesh)
        s_pp = shard_train_state(TrainState.create(params, optimizer), mesh)
        s_dp = replicate(TrainState.create(params, optimizer), mesh)
        for i in range(2):
            k = jax.random.PRNGKey(i)
            s_pp, m_pp = step_pp(s_pp, k, batch)
            s_dp, m_dp = step_dp(s_dp, k, batch)
            np.testing.assert_allclose(float(m_pp["loss"]),
                                       float(m_dp["loss"]), rtol=1e-6)
        deltas = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            jax.device_get(s_pp.params), jax.device_get(s_dp.params))
        assert max(jax.tree.leaves(deltas)) < 1e-5

    def test_stage_weights_stay_sharded(self):
        mesh = make_mesh(pipe=4)
        model, params, x, _ = _model_and_params(drop_path_rate=0.0)
        optimizer = create_optimizer()

        def pp_apply(p, xt, t, y=None, train=False, rngs=None, **kw):
            return zigma_pipelined_apply(model, p, xt, t, y, mesh=mesh,
                                         train=train, rngs=rngs, **kw)

        step_fn = create_train_step(
            make_diffusion_loss_fn(
                model, create_transport("Linear", "velocity"),
                apply_fn=pp_apply), optimizer)
        state = shard_train_state(TrainState.create(params, optimizer), mesh)
        state, _ = step_fn(state, jax.random.PRNGKey(0),
                           shard_batch({"x": x}, mesh))
        blk = state.params["params"]["blocks"]["mixer"]["in_proj"]["kernel"]
        assert tuple(blk.sharding.spec)[0] == "pipe"
        local = blk.addressable_shards[0].data.shape[0]
        assert local * 4 == blk.shape[0]


class TestCLIWiring:
    def test_train_cli_pp(self, tmp_path):
        from zigma_tpu.cli.train import main

        out = str(tmp_path / "out")
        state = main([
            "data=synthetic", "data.batch_size=8", "data.train_steps=2",
            "model.params.embed_dim=32", "model.params.depth=4",
            "model.params.img_dim=8", "model.params.patch_size=2",
            "model.params.scan_type=zigzagN2", "mixed_precision=fp32",
            "model.params.scan_layers=true",
            "model.params.drop_path_rate=0.0",
            "log_every=2", "ckpt_every=1000000", "sample_every=1000000",
            f"results_dir={out}", "parallel.pp=4",
        ])
        assert int(jax.device_get(state.step)) == 2
        blk = state.params["params"]["blocks"]["mixer"]["in_proj"]["kernel"]
        assert tuple(blk.sharding.spec)[0] == "pipe"

    def test_tp_pp_combination_rejected(self, tmp_path):
        from zigma_tpu.cli.train import main

        with pytest.raises(ValueError, match="cannot be combined"):
            main(["data=synthetic", "data.batch_size=8",
                  "data.train_steps=1", "model.params.embed_dim=32",
                  "model.params.depth=4", "model.params.img_dim=8",
                  "model.params.patch_size=2",
                  "model.params.scan_type=zigzagN2",
                  f"results_dir={tmp_path}",
                  "parallel.tp=2", "parallel.pp=2"])
