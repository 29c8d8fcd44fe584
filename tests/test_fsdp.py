"""FSDP (ZeRO-3-style) state sharding — beyond reference parity.

The reference's only parallelism is DDP (train_acc.py:121-123): every GPU
holds the full fp32 param + EMA + Adam-moment state.  Here
``parallel/mesh.py::shard_train_state(fsdp=True)`` shards every large leaf
of the TrainState over the 'data' mesh axis and lets XLA insert the
all-gathers / reduce-scatters; the train step function is byte-identical
to the DDP one.  These tests pin: spec construction, exact DDP
equivalence, per-device memory reduction, sharding stability across
steps, and the CLI wiring (parallel.fsdp=true).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.tree_util import keystr

from zigma_tpu.models import ZigMa
from zigma_tpu.parallel import (make_mesh, replicate, shard_batch,
                                shard_train_state, train_state_sharding)
from zigma_tpu.train import (TrainState, create_optimizer, create_train_step,
                             make_diffusion_loss_fn)
from zigma_tpu.transport import create_transport


def _setup():
    model = ZigMa(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                  patch_size=2, scan_type="zigzagN2", use_pe=2)
    x = jnp.zeros((8, 4, 8, 8))
    t = jnp.zeros((8,))
    params = model.init(jax.random.PRNGKey(0), x, t)
    optimizer = create_optimizer()
    loss_fn = make_diffusion_loss_fn(
        model, create_transport("Linear", "velocity"))
    step_fn = create_train_step(loss_fn, optimizer)
    return params, optimizer, step_fn


class TestShardingSpecs:
    def test_large_leaves_sharded_small_replicated(self):
        mesh = make_mesh(data=8)
        params, optimizer, _ = _setup()
        state = TrainState.create(params, optimizer)
        sh = train_state_sharding(state, mesh, fsdp=True, fsdp_min_size=64)
        kern = sh.params["params"]["blocks_0"]["mixer"]["in_proj"]["kernel"]
        assert "data" in tuple(kern.spec), kern.spec
        # scalars stay replicated
        assert tuple(sh.step.spec) == ()
        assert tuple(sh.best_fid.spec) == ()
        # the sharded dim is divisible by the data-axis size
        leaf = state.params["params"]["blocks_0"]["mixer"]["in_proj"][
            "kernel"]
        d = tuple(kern.spec).index("data")
        assert leaf.shape[d] % 8 == 0

    def test_min_size_gate(self):
        mesh = make_mesh(data=8)
        params, optimizer, _ = _setup()
        state = TrainState.create(params, optimizer)
        sh = train_state_sharding(state, mesh, fsdp=True,
                                  fsdp_min_size=10**9)
        # nothing is that large: everything replicated == the DDP layout
        assert all(tuple(s.spec) == () or "data" not in tuple(s.spec)
                   for s in jax.tree.leaves(sh))

    def test_optimizer_moments_and_ema_sharded(self):
        """The memory win lives in the 4 fp32 state copies: Adam mu/nu and
        the EMA tree must shard exactly like their params."""
        mesh = make_mesh(data=8)
        params, optimizer, _ = _setup()
        state = shard_train_state(TrainState.create(params, optimizer),
                                  mesh, fsdp=True, fsdp_min_size=64)
        pspec = state.params["params"]["blocks_0"]["mixer"]["in_proj"][
            "kernel"].sharding.spec
        espec = state.ema_params["params"]["blocks_0"]["mixer"]["in_proj"][
            "kernel"].sharding.spec
        assert tuple(espec) == tuple(pspec)
        mus = [x for p, x in jax.tree_util.tree_leaves_with_path(
            state.opt_state)
            if "in_proj" in keystr(p) and ".mu" in keystr(p)]
        assert mus and tuple(mus[0].sharding.spec) == tuple(pspec)

    def test_local_shard_is_fraction(self):
        mesh = make_mesh(data=8)
        params, optimizer, _ = _setup()
        state = shard_train_state(TrainState.create(params, optimizer),
                                  mesh, fsdp=True, fsdp_min_size=64)
        leaf = state.params["params"]["blocks_0"]["mixer"]["in_proj"][
            "kernel"]
        local = leaf.addressable_shards[0].data.size
        assert local * 8 == leaf.size

    def test_tp_plus_fsdp_compose(self):
        """TP rule keeps its 'model' dim; FSDP adds 'data' on another."""
        mesh = make_mesh(data=4, model=2)
        params, optimizer, _ = _setup()
        state = TrainState.create(params, optimizer)
        sh = train_state_sharding(state, mesh, fsdp=True, fsdp_min_size=64)
        spec = tuple(
            sh.params["params"]["blocks_0"]["mixer"]["in_proj"][
                "kernel"].spec)
        assert "model" in spec and "data" in spec, spec


class TestEquivalence:
    def test_fsdp_matches_ddp_three_steps(self):
        """Same rng/batch: FSDP and replicated DP produce the same losses
        and (to collective-reorder tolerance) the same params."""
        mesh = make_mesh(data=8)
        params, optimizer, step_fn = _setup()
        batch = shard_batch(
            {"x": jax.random.normal(jax.random.PRNGKey(1), (8, 4, 8, 8))},
            mesh)
        s_rep = replicate(TrainState.create(params, optimizer), mesh)
        s_fsdp = shard_train_state(TrainState.create(params, optimizer),
                                   mesh, fsdp=True, fsdp_min_size=64)
        for i in range(3):
            k = jax.random.PRNGKey(i)
            s_rep, m_rep = step_fn(s_rep, k, batch)
            s_fsdp, m_fsdp = step_fn(s_fsdp, k, batch)
            np.testing.assert_allclose(float(m_rep["loss"]),
                                       float(m_fsdp["loss"]), rtol=1e-5)
        deltas = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            jax.device_get(s_rep.params), jax.device_get(s_fsdp.params))
        assert max(jax.tree.leaves(deltas)) < 1e-5

    def test_sharding_stable_across_steps(self):
        """The updated state keeps its FSDP shardings (no silent gather
        into replication, which would defeat the memory point)."""
        mesh = make_mesh(data=8)
        params, optimizer, step_fn = _setup()
        batch = shard_batch(
            {"x": jax.random.normal(jax.random.PRNGKey(1), (8, 4, 8, 8))},
            mesh)
        state = shard_train_state(TrainState.create(params, optimizer),
                                  mesh, fsdp=True, fsdp_min_size=64)
        before = state.params["params"]["blocks_0"]["mixer"]["in_proj"][
            "kernel"].sharding.spec
        state, _ = step_fn(state, jax.random.PRNGKey(2), batch)
        after = state.params["params"]["blocks_0"]["mixer"]["in_proj"][
            "kernel"].sharding.spec
        assert tuple(after) == tuple(before)


class TestCLIWiring:
    def test_train_cli_fsdp_runs_and_checkpoints(self, tmp_path):
        from zigma_tpu.cli.train import main

        out = str(tmp_path / "out")
        state = main([
            "data=synthetic", "data.batch_size=8", "data.train_steps=2",
            "model.params.embed_dim=32", "model.params.depth=2",
            "model.params.img_dim=8", "model.params.patch_size=2",
            "model.params.scan_type=zigzagN2", "mixed_precision=fp32",
            "log_every=2", "ckpt_every=1000000", "sample_every=1000000",
            f"results_dir={out}",
            "parallel.fsdp=true", "parallel.fsdp_min_size=64",
        ])
        assert int(jax.device_get(state.step)) == 2
        kern = state.params["params"]["blocks_0"]["mixer"]["in_proj"][
            "kernel"]
        assert "data" in tuple(kern.sharding.spec)
        run = os.listdir(out)[0]
        ckpts = os.listdir(os.path.join(out, run, "checkpoints"))
        assert ckpts, "final checkpoint missing"

    def test_train_cli_fsdp_resume(self, tmp_path):
        """Checkpoint written by an FSDP run restores and re-places."""
        from zigma_tpu.cli.train import main

        out = str(tmp_path / "out")
        common = [
            "data=synthetic", "data.batch_size=8",
            "model.params.embed_dim=32", "model.params.depth=2",
            "model.params.img_dim=8", "model.params.patch_size=2",
            "model.params.scan_type=zigzagN2", "mixed_precision=fp32",
            "log_every=2", "ckpt_every=1000000", "sample_every=1000000",
            "parallel.fsdp=true", "parallel.fsdp_min_size=64",
        ]
        main(common + ["data.train_steps=2", f"results_dir={out}"])
        run = os.listdir(out)[0]
        ckpt_dir = os.path.join(out, run, "checkpoints")
        ckpt = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1])
        out2 = str(tmp_path / "out2")
        state = main(common + [
            "data.train_steps=4", f"ckpt={ckpt}", f"results_dir={out2}"])
        assert int(jax.device_get(state.step)) == 4
