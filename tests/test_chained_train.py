"""Chained N-steps-per-dispatch training (VERDICT r3 #3).

Measured motivation: each single-step dispatch pays ~38 ms returning the
state pytree through the runtime relay (~10% of flagship step time,
docs/DESIGN.md §8 / train_step_anatomy.json).  ``chain_steps=N`` runs N
optimizer steps inside ONE jitted lax.scan; these tests pin that a chained
run is the same computation as an unchained one — same RNG consumption,
same batches, same final state — including the sub-chain tail and the
cadence of periodic actions.
"""

import json
import os

import jax
import numpy as np
import pytest

TINY = [
    "data=synthetic",
    "data.batch_size=8",
    "model.params.embed_dim=32",
    "model.params.depth=2",
    "model.params.img_dim=8",
    "model.params.patch_size=2",
    "model.params.scan_type=zigzagN2",
    "mixed_precision=fp32",
    "ckpt_every=1000000",
    "sample_every=1000000",
]


def _run(tmp_path, chain, steps, extra=()):
    from zigma_tpu.cli.train import main

    out = str(tmp_path / f"out_c{chain}_s{steps}")
    state = main(TINY + [f"data.train_steps={steps}",
                         f"chain_steps={chain}",
                         f"results_dir={out}", "log_every=2",
                         *extra])
    return state, out


def _max_delta(a, b):
    return max(float(jax.numpy.max(jax.numpy.abs(x - y)))
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


class TestChainedEquivalence:
    def test_chained_matches_plain_final_state(self, tmp_path):
        """4 steps, chain_steps=2 (two chained dispatches) vs chain_steps=1
        (four plain dispatches): identical key/batch sequences by
        construction, so params AND ema must agree to fp reassociation
        noise."""
        s1, _ = _run(tmp_path, chain=1, steps=4)
        s2, _ = _run(tmp_path, chain=2, steps=4)
        assert int(jax.device_get(s1.step)) == 4
        assert int(jax.device_get(s2.step)) == 4
        assert _max_delta(s1.params, s2.params) < 1e-6
        assert _max_delta(s1.ema_params, s2.ema_params) < 1e-6

    def test_tail_shorter_than_chain(self, tmp_path):
        """train_steps=5 with chain_steps=2: 2+2 chained + 1 plain tail —
        the run must stop exactly at train_steps and still match the
        unchained state."""
        s1, _ = _run(tmp_path, chain=1, steps=5)
        s2, _ = _run(tmp_path, chain=2, steps=5)
        assert int(jax.device_get(s2.step)) == 5
        assert _max_delta(s1.params, s2.params) < 1e-6

    def test_periodic_actions_fire_at_chain_boundaries(self, tmp_path):
        """log_every=3 with chain_steps=2: boundary-crossing cadence logs at
        steps 4 and 6 (first boundaries at-or-after 3 and 6), not never."""
        from zigma_tpu.cli.train import main

        out = str(tmp_path / "out_cadence")
        main(TINY + ["data.train_steps=6", "chain_steps=2",
                     f"results_dir={out}", "log_every=3"])
        run = os.listdir(out)[0]
        recs = [json.loads(l) for l in
                open(os.path.join(out, run, "metrics.jsonl"))]
        steps = [r["step"] for r in recs if "loss" in r]
        assert steps == [4, 6], steps

    def test_bad_chain_steps_raises(self, tmp_path):
        from zigma_tpu.cli.train import main

        with pytest.raises(ValueError, match="chain_steps"):
            main(TINY + ["data.train_steps=2", "chain_steps=0",
                         f"results_dir={tmp_path / 'x'}"])


class TestChainedUnit:
    def test_create_chained_train_step_n1_equals_plain(self):
        """n_steps=1 chained dispatch == one plain dispatch, same key."""
        import jax.numpy as jnp

        from zigma_tpu.models import ZigMa
        from zigma_tpu.train import (TrainState, create_chained_train_step,
                                     create_optimizer, create_train_step,
                                     make_diffusion_loss_fn)
        from zigma_tpu.transport import create_transport

        model = ZigMa(in_channels=4, embed_dim=32, depth=2, img_dim=8,
                      patch_size=2, scan_type="zigzagN2", use_pe=2)
        x = jnp.zeros((4, 4, 8, 8))
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((4,)))
        opt = create_optimizer(lr=1e-4, weight_decay=0.0, grad_clip=2.0)
        loss_fn = make_diffusion_loss_fn(model, create_transport(
            "Linear", "velocity"), latent_scale=None)
        state = TrainState.create(params, opt)
        k = jax.random.PRNGKey(1)
        batch = {"x": jax.random.normal(jax.random.PRNGKey(2), x.shape)}

        s1, m1 = create_train_step(loss_fn, opt)(state, k, batch)
        s2, m2 = create_chained_train_step(loss_fn, opt, n_steps=1)(
            state, k[None], jax.tree.map(lambda v: v[None], batch))
        assert _max_delta(s1.params, s2.params) == 0.0
        assert float(m1["loss"]) == float(m2["loss"][0])

    def test_bad_n_steps(self):
        from zigma_tpu.train import create_chained_train_step

        with pytest.raises(ValueError, match="n_steps"):
            create_chained_train_step(lambda *a: 0.0, None, n_steps=0)
