"""Optimizer-update parity: optax chain vs torch AdamW (+ clip, + EMA).

The reference trains with torch.optim.AdamW(lr=1e-4, wd=0) plus
global-norm grad clip 2.0 (train_acc.py:213,445-447) and EMA 0.9999
(utils/train_utils.py:103-113).  This runs several steps of both
optimizers on identical params/grads and demands agreement — AdamW
implementations differ silently in eps placement / bias correction /
decoupled-decay scaling, which would turn converted-checkpoint fine-tuning
into a different training run.  Needs torch only (no reference checkout).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("weight_decay", [0.0, 0.01])
def test_adamw_with_clip_matches_torch(weight_decay):
    import jax
    import jax.numpy as jnp

    from zigma_tpu.train import create_optimizer

    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((5, 7)).astype(np.float32)
    grads = [rng.standard_normal((5, 7)).astype(np.float32) * s
             for s in (0.5, 30.0, 1.0, 3.0)]  # one grad far above the clip

    # torch side
    pt = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.AdamW([pt], lr=1e-4, betas=(0.9, 0.999), eps=1e-8,
                            weight_decay=weight_decay)
    for g in grads:
        opt.zero_grad()
        pt.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([pt], 2.0)
        opt.step()

    # ours
    tx = create_optimizer(lr=1e-4, weight_decay=weight_decay, grad_clip=2.0)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               pt.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_ema_matches_reference_formula():
    import jax.numpy as jnp

    from zigma_tpu.train import update_ema

    rng = np.random.default_rng(1)
    e = rng.standard_normal((4, 4)).astype(np.float32)
    p = rng.standard_normal((4, 4)).astype(np.float32)
    got = update_ema({"w": jnp.asarray(e)}, {"w": jnp.asarray(p)},
                     decay=0.9999)
    # utils/train_utils.py:103-113: ema.mul_(decay).add_(param, alpha=1-decay)
    want = e * 0.9999 + p * (1 - 0.9999)
    np.testing.assert_allclose(np.asarray(got["w"]), want, rtol=1e-6)
