"""Train state, EMA, and the pjit-sharded training step.

TPU-native rebuild of the reference training loop internals
(reference: train_acc.py:210-505, utils/train_utils.py:103-133).

- EMA decay 0.9999 as a pure tree update (utils/train_utils.py:103-113).
- AdamW lr 1e-4, wd 0 (train_acc.py:213, config/optim/default.yaml).
- Gradient clipping at 2.0 — applied BEFORE the optimizer step via optax
  chaining.  The reference clips *after* ``opt.step()`` (train_acc.py:445-447),
  which is a no-op on the applied update; documented quirk we fix
  (SURVEY.md §7.4).
- The whole step (loss -> grads -> psum over the data axis -> update -> EMA)
  is a single jitted function; XLA inserts the gradient all-reduce from the
  output shardings, replacing DDP bucket all-reduce.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["TrainState", "create_optimizer", "create_train_step",
           "create_chained_train_step", "update_ema"]

LATENT_SCALE = 0.18215  # SD VAE latent scaling (train_acc.py:432-435)


class TrainState(struct.PyTreeNode):
    """Logical equivalent of the reference checkpoint dict
    {model, ema, opt, train_steps, best_fid} (train_acc.py:492-505)."""

    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any
    best_fid: jax.Array

    @classmethod
    def create(cls, params, optimizer):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            ema_params=jax.tree.map(lambda x: x, params),
            opt_state=optimizer.init(params),
            best_fid=jnp.asarray(float("inf"), jnp.float32),
        )


def create_optimizer(lr: float = 1e-4, weight_decay: float = 0.0,
                     grad_clip: float = 2.0,
                     b1: float = 0.9, b2: float = 0.999) -> optax.GradientTransformation:
    """AdamW(1e-4, wd=0) + global-norm clip 2.0 (train_acc.py:213,445-447)."""
    chain = []
    if grad_clip and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay))
    return optax.chain(*chain)


def update_ema(ema_params, params, decay: float = 0.9999):
    """EMA tree update (utils/train_utils.py:103-113)."""
    return jax.tree.map(lambda e, p: e * decay + (1.0 - decay) * p,
                        ema_params, params)


def create_train_step(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    ema_decay: float = 0.9999,
    donate: Optional[bool] = None,
):
    """Build the jitted train step.

    loss_fn(params, rng, batch) -> scalar loss.  ``batch`` is whatever the
    data pipeline yields (typically {'x': latents, 'y': cond}); sharding is
    decided by the arrays' placements (shard_batch for DP).
    Returns step_fn(state, rng, batch) -> (state, metrics).

    ``donate`` reuses the state buffers in-place (halving peak param
    memory) but defaults OFF: XLA:CPU's in-process collectives deadlock
    under donation on few-core hosts (8-device fake mesh), and the
    axon-relayed TPU backend fails donated executions at runtime with
    INVALID_ARGUMENT.  Enable explicitly on standard TPU runtimes.
    """
    if donate is None:
        donate = False

    step_fn = _make_step_body(loss_fn, optimizer, ema_decay)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def _make_step_body(loss_fn, optimizer, ema_decay):
    """The un-jitted single-step body shared by the plain and chained
    dispatchers (so chained N-step training is the SAME computation as N
    single dispatches, not a reimplementation that could drift)."""

    def step_fn(state: TrainState, rng, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, rng, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = update_ema(state.ema_params, params, ema_decay)
        gnorm = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1, params=params, ema_params=ema_params,
            opt_state=opt_state)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return step_fn


def create_chained_train_step(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    ema_decay: float = 0.9999,
    n_steps: int = 8,
    donate: Optional[bool] = None,
):
    """N train steps per dispatch, lax.scan'd inside ONE jit.

    Measured motivation (docs/DESIGN.md §8, train_step_anatomy.json): each
    single-step dispatch pays ~38 ms returning the ~2.2 GB state pytree
    through the runtime relay — ~10% of flagship step time.  Chaining keeps
    the state on-device between the N inner steps; only the final state
    crosses the dispatch boundary.

    Signature: chained_fn(state, rngs, batches) -> (state, metrics)
      rngs:    stacked per-step keys, shape (n_steps, 2) — pass
               ``jax.random.split(rng, n_steps)``.  Taking the per-step keys
               (rather than splitting internally) makes a chained dispatch
               bit-identical in RNG consumption to N plain dispatches fed
               the same keys, which the equivalence test pins.
      batches: the same pytree the plain step takes, each leaf stacked with
               a leading n_steps axis (shard with the batch axis at dim 1).
      metrics: each entry stacked (n_steps,) — [-1] is the last step's.
    """
    if donate is None:
        donate = False
    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")

    step_fn = _make_step_body(loss_fn, optimizer, ema_decay)

    def chained_fn(state: TrainState, rngs, batches):
        def body(state, xs):
            k, batch = xs
            return step_fn(state, k, batch)

        return jax.lax.scan(body, state, (rngs, batches))

    return jax.jit(chained_fn, donate_argnums=(0,) if donate else ())


def make_diffusion_loss_fn(model, transport, train: bool = True,
                           latent_scale: Optional[float] = None,
                           apply_fn=None):
    """Standard ZigMa loss closure: scale latents, flow-matching MSE
    (train_acc.py:426-447).

    apply_fn: optional replacement for ``model.apply`` with the same
    calling convention ``(params, xt, t, y, train=..., rngs=..., **kw)``
    — the hook pipeline parallelism uses to substitute
    ``parallel.pipeline.zigma_pipelined_apply``.
    """
    if apply_fn is None:
        apply_fn = model.apply

    def loss_fn(params, rng, batch):
        x = batch["x"]
        if latent_scale is not None:
            x = x * latent_scale
        y = batch.get("y")
        rng, k_drop, k_label = jax.random.split(rng, 3)
        rngs = ({"dropout": k_drop, "label_drop": k_label} if train else {})
        model_fn = lambda xt, t, **kw: apply_fn(
            params, xt, t, y, train=train, rngs=rngs, **kw)
        terms = transport.training_losses(model_fn, rng, x)
        return jnp.mean(terms["loss"])

    return loss_fn
