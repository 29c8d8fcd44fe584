"""ODE / SDE integrators as compiled JAX loops.

TPU-native replacement for the reference's torchdiffeq-based ``ode`` class
and hand-rolled ``sde`` loop (reference: transport/integrators.py:9-123).

- Fixed-step Euler / Heun ODE and Euler–Maruyama / Heun SDE are ``lax.scan``
  loops — the whole sampling trajectory compiles to one XLA program (the
  reference re-launches the graph per step from Python).
- ``dopri5`` is a native adaptive Dormand–Prince RK45 with a PI step-size
  controller, run segment-by-segment between the requested save points
  (steps clamp to each save boundary, so no dense-output interpolation is
  needed; torchdiffeq instead interpolates, which differs at O(err_tol)).

All integrators return the trajectory stacked on a leading axis of length
``num_steps`` like torchdiffeq's ``odeint`` (minus the initial point the
reference's SDE loop also drops).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["odeint_fixed", "odeint_dopri5", "sdeint"]


def _tree_axpy(a, x, y):
    return jax.tree.map(lambda xi, yi: a * xi + yi, x, y)


def _b_t(t, x):
    """(B,) time vector from scalar t."""
    leaf = jax.tree.leaves(x)[0]
    return jnp.full((leaf.shape[0],), t, jnp.float32)


# ---------------------------------------------------------------------------
# Fixed-step ODE (Euler / Heun)
# ---------------------------------------------------------------------------


def odeint_fixed(drift: Callable, x0, t0: float, t1: float, num_steps: int,
                 method: str = "euler"):
    """Integrate dx/dt = drift(x, t) over linspace(t0, t1, num_steps).

    drift: f(x, t_batch) -> dx, pytree-valued.  Returns ALL num_steps save
    points including x(t0) on a leading axis — the torchdiffeq odeint
    convention (the reference's ODE path).
    """
    ts = jnp.linspace(t0, t1, num_steps)
    dts = ts[1:] - ts[:-1]

    def euler_step(x, inp):
        t, dt = inp
        dx = drift(x, _b_t(t, x))
        x = _tree_axpy(dt, dx, x)
        return x, x

    def heun_step(x, inp):
        t, dt = inp
        k1 = drift(x, _b_t(t, x))
        xp = _tree_axpy(dt, k1, x)
        k2 = drift(xp, _b_t(t + dt, x))
        x = jax.tree.map(lambda xi, a, b: xi + 0.5 * dt * (a + b), x, k1, k2)
        return x, x

    step = {"euler": euler_step, "heun": heun_step}[method.lower()]
    _, traj = jax.lax.scan(step, x0, (ts[:-1], dts))
    # prepend the initial point (torchdiffeq convention)
    return jax.tree.map(
        lambda x0i, tri: jnp.concatenate([x0i[None], tri], axis=0), x0, traj)


# ---------------------------------------------------------------------------
# Adaptive Dormand-Prince RK45
# ---------------------------------------------------------------------------

_DOPRI_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DOPRI_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DOPRI_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_DOPRI_B4 = jnp.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
                       187 / 2100, 1 / 40])


def _dopri_step(drift, x, t, dt):
    """One RK45 step: returns (x5, err_ratio_sq_tree_fn inputs)."""
    ks = []
    for i in range(7):
        xi = x
        for j, aij in enumerate(_DOPRI_A[i]):
            xi = _tree_axpy(dt * aij, ks[j], xi)
        ks.append(drift(xi, _b_t(t + dt * _DOPRI_C[i], x)))
    x5 = x
    err = jax.tree.map(jnp.zeros_like, x)
    for i in range(7):
        x5 = _tree_axpy(dt * _DOPRI_B5[i], ks[i], x5)
        err = _tree_axpy(dt * (_DOPRI_B5[i] - _DOPRI_B4[i]), ks[i], err)
    return x5, err


def _error_norm(err, x0, x1, atol, rtol):
    def leaf_norm(e, a, b):
        scale = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        return jnp.mean((e / scale) ** 2)
    sq = jax.tree.map(leaf_norm, err, x0, x1)
    leaves = jax.tree.leaves(sq)
    return jnp.sqrt(sum(leaves) / len(leaves))


def odeint_dopri5(drift: Callable, x0, t0: float, t1: float, num_steps: int,
                  atol: float = 1e-6, rtol: float = 1e-3,
                  max_steps_per_segment: int = 1000):
    """Adaptive RK45 saving at linspace(t0, t1, num_steps).

    Matches the reference's torchdiffeq dopri5 call (integrators.py:105-123)
    up to solver-internal details (both are tol-controlled, differences are
    O(tol); SURVEY.md §7.3 item 3).
    """
    ts = jnp.linspace(t0, t1, num_steps)
    direction = jnp.sign(ts[-1] - ts[0])

    def segment(carry, t_next):
        x, t, dt = carry

        def cond(st):
            _, ti, dti, i = st
            # a NaN drift makes enorm NaN -> no step is ever accepted and
            # the PI controller turns dti NaN on the first rejection; exit
            # immediately instead of burning max_steps_per_segment * 7
            # drift evals per remaining segment
            return ((direction * (t_next - ti) > 1e-9)
                    & (i < max_steps_per_segment) & jnp.isfinite(dti))

        def body(st):
            xi, ti, dti, i = st
            dti = jnp.where(direction * (ti + dti - t_next) > 0, t_next - ti, dti)
            x_new, err = _dopri_step(drift, xi, ti, dti)
            enorm = _error_norm(err, xi, x_new, atol, rtol)
            accept = enorm <= 1.0
            # PI controller (same exponents as torchdiffeq's default)
            factor = jnp.clip(0.9 * (enorm + 1e-10) ** (-1 / 5), 0.2, 10.0)
            xi = jax.tree.map(
                lambda a, b: jnp.where(accept, b, a), xi, x_new)
            ti = jnp.where(accept, ti + dti, ti)
            dti = dti * factor
            return xi, ti, dti, i + 1

        x, t, dt, _ = jax.lax.while_loop(
            cond, body, (x, t, dt, jnp.zeros((), jnp.int32)))
        # fail LOUDLY: if the step controller never reached the save point
        # (NaN drift makes enorm NaN -> nothing is ever accepted -> the loop
        # exits on max_steps_per_segment), poison the state with NaN instead
        # of silently returning a trajectory frozen at the last good point
        # (torchdiffeq raises in the equivalent situation; inside jit the
        # loud analogue is NaN propagation, caught by the callers'
        # finiteness checks)
        reached = direction * (t_next - t) <= 1e-9
        x = jax.tree.map(
            lambda a: jnp.where(reached, a, jnp.full_like(a, jnp.nan)), x)
        return (x, t_next, dt), x

    dt0 = (ts[-1] - ts[0]) / (4.0 * num_steps)
    (_, _, _), traj = jax.lax.scan(
        segment, (x0, ts[0], dt0), ts[1:])
    return jax.tree.map(
        lambda x0i, tri: jnp.concatenate([x0i[None], tri], axis=0), x0, traj)


# ---------------------------------------------------------------------------
# SDE (Euler-Maruyama / Heun)
# ---------------------------------------------------------------------------


def sdeint(drift: Callable, diffusion: Callable, rng, x0, t0: float, t1: float,
           num_steps: int, method: str = "Euler", noise=None):
    """Integrate the reverse SDE over linspace(t0, t1, num_steps).

    Mirrors the reference loop (integrators.py:31-80): num_steps-1 steps;
    returns the noisy trajectory with num_steps-1 entries (the reference
    drops the initial point).  The "Mean" last step is applied by the caller
    (Sampler.sample_sde) as one extra drift-only step on trajectory[-1],
    matching the reference's __Mean_step__.

    drift(x, t_batch), diffusion(x, t_batch).

    ``noise`` optionally injects the Brownian increments: a pytree matching
    x0 with a leading axis of length num_steps-1 holding the standard-normal
    draws w (NOT pre-scaled by sqrt(dt)) — one per step, exactly the
    ``th.randn(x.size())`` sequence of the reference loop.  When given,
    ``rng`` may be None; this makes trajectories reproducible across
    frameworks (used by the executed-reference sampler parity tests).
    """
    ts = jnp.linspace(t0, t1, num_steps)
    dt = ts[1] - ts[0]
    sqrt_dt = jnp.sqrt(dt)

    def draw(carry_rng, x, injected):
        if injected is not None:
            return carry_rng, injected
        carry_rng, k = jax.random.split(carry_rng)
        flat, treedef = jax.tree.flatten(x)
        keys = jax.random.split(k, len(flat))
        return carry_rng, jax.tree.unflatten(
            treedef, [jax.random.normal(kk, xi.shape, xi.dtype)
                      for kk, xi in zip(keys, flat)])

    def em_step(carry, inp):
        x, rng_ = carry
        t, injected = inp
        rng_, w = draw(rng_, x, injected)
        tb = _b_t(t, x)
        d = drift(x, tb)
        g = diffusion(x, tb)
        mean_x = _tree_axpy(dt, d, x)
        x = jax.tree.map(
            lambda m, gi, wi: m + jnp.sqrt(2 * gi) * wi * sqrt_dt, mean_x, g, w)
        return (x, rng_), x

    def heun_step(carry, inp):
        x, rng_ = carry
        t, injected = inp
        rng_, w = draw(rng_, x, injected)
        tb = _b_t(t, x)
        g = diffusion(x, tb)
        xhat = jax.tree.map(
            lambda xi, gi, wi: xi + jnp.sqrt(2 * gi) * wi * sqrt_dt, x, g, w)
        k1 = drift(xhat, tb)
        xp = _tree_axpy(dt, k1, xhat)
        k2 = drift(xp, _b_t(t + dt, x))
        x = jax.tree.map(
            lambda xh, a, b: xh + 0.5 * dt * (a + b), xhat, k1, k2)
        return (x, rng_), x

    step = {"Euler": em_step, "Heun": heun_step}[method]
    if rng is None:
        if noise is None:
            raise ValueError(
                "sdeint: rng=None is only valid when the Brownian "
                "increments are injected via noise=...; without either, "
                "every call would silently reuse the same draws")
        rng = jax.random.PRNGKey(0)  # unused: every draw is injected
    (_, _), traj = jax.lax.scan(step, (x0, rng), (ts[:-1], noise))
    return traj
