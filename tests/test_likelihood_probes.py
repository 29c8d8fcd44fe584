"""Likelihood Hutchinson-probe semantics (VERDICT r3 #6).

The reference's ``_likelihood_drift`` draws a FRESH Rademacher probe at
every drift evaluation (reference: transport/transport.py:441).  Our
fixed-grid paths (euler/heun) reproduce that exactly (pinned by the
executed-reference parity suite); the adaptive dopri5 path instead keeps
ONE probe for the whole trajectory, because a per-evaluation redraw inside
an adaptive solver would make the estimate depend on the accept/reject
history.  Both are unbiased Hutchinson estimators; the single-probe
estimator has higher variance (it never averages over probes).

These tests PIN that documented divergence with numbers instead of leaving
it silent-by-default:

- both estimators are unbiased against an analytically known divergence
  (linear drift -> exact trace),
- the single-probe (dopri5) estimator's seed-to-seed spread exceeds the
  fresh-probe (euler) one's by ~sqrt(n_evals), as theory predicts,
- the measured spread ratio is recorded in PARITY.md ("documented
  divergences").
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zigma_tpu.transport import Sampler, create_transport


def _linear_setup(dim=6, seed=0):
    """Velocity model f(x, t) = x @ W.T: the likelihood drift's Jacobian is
    W everywhere, so the Hutchinson target is exactly trace(W) and the
    integrated divergence over [t0, t1] is trace(W) * (t1 - t0)."""
    rng = np.random.default_rng(seed)
    W = np.asarray(rng.normal(size=(dim, dim)) * 0.3, np.float32)
    Wj = jnp.asarray(W)
    model_fn = lambda x, t: x @ Wj.T
    return W, model_fn


def _estimator_errors(method, num_steps, n_seeds=48, dim=6):
    """Per-seed Hutchinson error: returned logp minus the exact logp for
    the z that run produced (prior_logp(z) - trace(W)*(t1-t0)).  The x
    trajectory is probe-independent, so this isolates the trace estimate."""
    W, model_fn = _linear_setup(dim)
    transport = create_transport("Linear", "velocity")
    sampler = Sampler(transport)
    fn = jax.jit(lambda k, x: sampler.sample_ode_likelihood(
        sampling_method=method, num_steps=num_steps)(k, x, model_fn))
    t0, t1 = transport.check_interval(
        transport.train_eps, transport.sample_eps,
        sde=False, eval=True, reverse=False, last_step_size=0.0)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, dim)),
                    jnp.float32)
    trace_term = float(np.trace(W)) * (t1 - t0)
    errs = []
    for s in range(n_seeds):
        logp, z = fn(jax.random.PRNGKey(100 + s), x)
        exact = sampler.transport.prior_logp(z) - trace_term
        errs.append(float(logp[0] - exact[0]))
    return np.asarray(errs)


class TestProbeSemantics:
    def test_both_estimators_unbiased_and_single_probe_wider(self):
        n_steps = 17  # 16 euler drift evals
        e_fresh = _estimator_errors("euler", n_steps)
        e_single = _estimator_errors("dopri5", num_steps=5)

        # unbiasedness: |mean| within 4 standard errors of zero
        for tag, e in [("euler/fresh", e_fresh), ("dopri5/single", e_single)]:
            se = e.std(ddof=1) / math.sqrt(len(e))
            assert abs(e.mean()) < 4 * se + 1e-4, (
                f"{tag} biased: mean {e.mean():.4g} vs se {se:.4g}")

        # variance: fresh-per-eval averages 16 iid estimates per unit time,
        # single-probe averages none -> spread ratio ~ sqrt(16) = 4.
        ratio = e_single.std(ddof=1) / e_fresh.std(ddof=1)
        assert 2.0 < ratio < 8.0, (
            f"spread ratio {ratio:.2f} outside the sqrt(n_evals) regime "
            f"(expected ~4 for 16 evals)")

    def test_fresh_probe_variance_scales_with_eval_count(self):
        """Doubling the fixed-grid eval count must shrink the fresh-probe
        spread ~1/sqrt(2) — the property the reference's per-eval redraw
        buys and the reason the divergence matters at all."""
        e_16 = _estimator_errors("euler", 17)
        e_64 = _estimator_errors("euler", 65)
        ratio = e_16.std(ddof=1) / e_64.std(ddof=1)
        assert 1.4 < ratio < 3.0, f"expected ~2, got {ratio:.2f}"

    def test_dopri5_trace_term_exact_for_linear_drift(self):
        """For a linear drift the single-probe estimate eps^T W eps is
        CONSTANT along the trajectory, so the only spread is across seeds;
        each individual run must integrate its own estimate exactly
        (adaptive steps included)."""
        W, model_fn = _linear_setup()
        transport = create_transport("Linear", "velocity")
        sampler = Sampler(transport)
        fn = sampler.sample_ode_likelihood(sampling_method="dopri5",
                                           num_steps=5)
        x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 6)),
                        jnp.float32)
        k = jax.random.PRNGKey(7)
        logp, z = jax.jit(lambda: fn(k, x, model_fn))()
        # reconstruct this seed's probe and its exact integral
        eps = (jax.random.randint(k, x.shape, 0, 2).astype(x.dtype) * 2 - 1)
        est = np.einsum("bi,ij,bj->b", np.asarray(eps), np.asarray(W).T,
                        np.asarray(eps))
        exact = np.asarray(sampler.transport.prior_logp(z)) - est
        np.testing.assert_allclose(np.asarray(logp), exact, rtol=0, atol=5e-4)
