"""Transport / integrator tests.

The reference has no transport tests; these check the math directly:
interpolant identities, loss behavior, and integrator convergence on ODEs
with closed-form solutions.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zigma_tpu.transport import (
    GVPCPlan,
    ICPlan,
    Sampler,
    VPCPlan,
    create_transport,
    odeint_dopri5,
    odeint_fixed,
)
from zigma_tpu.transport.path import expand_t_like_x


@pytest.mark.parametrize("plan_cls", [ICPlan, GVPCPlan, VPCPlan])
class TestPlans:
    def test_alpha_sigma_derivatives(self, plan_cls):
        """d_alpha/d_sigma match numerical derivatives."""
        plan = plan_cls()
        t = jnp.linspace(0.05, 0.95, 19)
        eps = 1e-4
        a, da = plan.compute_alpha_t(t)
        s, ds = plan.compute_sigma_t(t)
        a_p = plan.compute_alpha_t(t + eps)[0]
        a_m = plan.compute_alpha_t(t - eps)[0]
        s_p = plan.compute_sigma_t(t + eps)[0]
        s_m = plan.compute_sigma_t(t - eps)[0]
        np.testing.assert_allclose(da, (a_p - a_m) / (2 * eps), rtol=1e-2, atol=1e-3)
        np.testing.assert_allclose(ds, (s_p - s_m) / (2 * eps), rtol=1e-2, atol=1e-3)

    def test_interpolant_endpoints(self, plan_cls):
        plan = plan_cls()
        x0 = jnp.ones((2, 3)) * 2.0  # noise
        x1 = -jnp.ones((2, 3))  # data
        xt_near0 = plan.compute_xt(jnp.full((2,), 1e-6), x0, x1)
        xt_near1 = plan.compute_xt(jnp.full((2,), 1 - 1e-6), x0, x1)
        # VP only reaches its endpoints asymptotically (alpha(0) ~ 6.5e-3)
        atol = 2e-2 if plan_cls is VPCPlan else 1e-3
        np.testing.assert_allclose(xt_near0, x0, atol=atol)
        np.testing.assert_allclose(xt_near1, x1, atol=atol)

    def test_score_velocity_roundtrip(self, plan_cls):
        """score_from_velocity inverts velocity_from_score."""
        plan = plan_cls()
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (4, 8))
        t = jnp.linspace(0.2, 0.8, 4)
        score = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
        v = plan.get_velocity_from_score(score, x, t)
        score2 = plan.get_score_from_velocity(v, x, t)
        np.testing.assert_allclose(score, score2, rtol=1e-4, atol=1e-4)


class TestTrainingLoss:
    def test_velocity_loss_zero_for_perfect_model(self):
        transport = create_transport("Linear", "velocity")
        x1 = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 4))

        # the true velocity for the linear path is x1 - x0; recover x0 from xt
        def perfect_model(xt, t, x1=x1):
            te = expand_t_like_x(t, xt)
            x0 = (xt - te * x1) / (1 - te)
            return x1 - x0

        terms = transport.training_losses(perfect_model, jax.random.PRNGKey(1), x1)
        assert float(jnp.max(terms["loss"])) < 1e-8

    def test_loss_shapes(self):
        transport = create_transport("Linear", "velocity")
        x1 = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 4))
        model = lambda x, t: x * 0.1
        terms = transport.training_losses(model, jax.random.PRNGKey(1), x1)
        assert terms["loss"].shape == (8,)

    @pytest.mark.parametrize("prediction", ["noise", "score"])
    def test_other_predictions_run(self, prediction):
        transport = create_transport("Linear", prediction)
        x1 = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 2, 2))
        model = lambda x, t: x * 0.1
        terms = transport.training_losses(model, jax.random.PRNGKey(1), x1)
        assert jnp.isfinite(terms["loss"]).all()


class TestIntegrators:
    def test_euler_linear_ode(self):
        """dx/dt = -x has solution x0 * exp(-t)."""
        drift = lambda x, t: -x
        x0 = jnp.ones((2, 3))
        traj = odeint_fixed(drift, x0, 0.0, 1.0, 1001, method="euler")
        np.testing.assert_allclose(traj[-1], math.exp(-1.0), rtol=1e-2)

    def test_heun_more_accurate_than_euler(self):
        drift = lambda x, t: -x
        x0 = jnp.ones((2,))
        e = odeint_fixed(drift, x0, 0.0, 1.0, 51, method="euler")[-1]
        h = odeint_fixed(drift, x0, 0.0, 1.0, 51, method="heun")[-1]
        exact = math.exp(-1.0)
        assert abs(float(h[0]) - exact) < abs(float(e[0]) - exact)

    def test_dopri5_accuracy(self):
        drift = lambda x, t: -x
        x0 = jnp.ones((2, 3))
        traj = odeint_dopri5(drift, x0, 0.0, 1.0, 11, atol=1e-8, rtol=1e-6)
        np.testing.assert_allclose(traj[-1], math.exp(-1.0), rtol=1e-5)
        # intermediate save points too
        np.testing.assert_allclose(traj[5], math.exp(-0.5), rtol=1e-5)

    def test_dopri5_time_dependent(self):
        """dx/dt = t => x(1) = x0 + 0.5 (drift gets a (B,) time vector)."""
        drift = lambda x, t: jnp.ones_like(x) * t[:, None]
        x0 = jnp.zeros((2, 3))
        traj = odeint_dopri5(drift, x0, 0.0, 1.0, 5)
        np.testing.assert_allclose(traj[-1], 0.5, rtol=1e-4, atol=1e-5)


class TestSamplers:
    def _setup(self):
        transport = create_transport("Linear", "velocity")
        sampler = Sampler(transport)
        # toy "model": velocity field of a pure-contraction flow
        model = lambda x, t: -0.5 * x
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 4))
        return sampler, model, z

    def test_ode_euler(self):
        sampler, model, z = self._setup()
        fn = sampler.sample_ode(sampling_method="euler", num_steps=20)
        traj = fn(z, model)
        assert traj.shape == (20, *z.shape)
        np.testing.assert_allclose(
            traj[-1], z * math.exp(-0.5), rtol=0.05, atol=1e-3)

    def test_ode_dopri5_jit(self):
        sampler, model, z = self._setup()
        sample = sampler.sample_ode(sampling_method="dopri5", num_steps=5)
        fn = jax.jit(lambda zz: sample(zz, model))
        traj = fn(z)
        np.testing.assert_allclose(
            traj[-1], z * math.exp(-0.5), rtol=1e-3, atol=1e-4)

    def test_sde_shapes(self):
        sampler, model, z = self._setup()
        # diffusion_form="sigma" is the reference's shipped SDE config
        # (config/sde/sde.yaml); SBDM has a 1/t singularity at t0=0 for
        # velocity models (present in the reference too).
        fn = sampler.sample_sde(num_steps=8, diffusion_form="sigma",
                                last_step="Mean", last_step_size=0.04)
        traj = fn(jax.random.PRNGKey(1), z, model)
        assert traj.shape == (8, *z.shape)
        assert jnp.isfinite(traj).all()

    def test_sde_sbdm_finite(self):
        # SBDM diffusion divides by t; velocity transports default
        # sample_eps=0, so t0 must be clamped off 0 (the reference NaNs here)
        sampler, model, z = self._setup()
        fn = sampler.sample_sde(num_steps=8, diffusion_form="SBDM",
                                last_step="Mean", last_step_size=0.04)
        traj = fn(jax.random.PRNGKey(1), z, model)
        assert jnp.isfinite(traj).all()

    def test_sde_heun_runs(self):
        sampler, model, z = self._setup()
        fn = sampler.sample_sde(sampling_method="Heun", num_steps=8,
                                diffusion_form="sigma",
                                last_step="Euler", last_step_size=0.04)
        traj = fn(jax.random.PRNGKey(1), z, model)
        assert jnp.isfinite(traj).all()

    def test_likelihood_gaussian(self):
        """For the zero-velocity model the flow is identity, so logp should
        equal the standard normal prior logp."""
        transport = create_transport("Linear", "velocity")
        sampler = Sampler(transport)
        model = lambda x, t: jnp.zeros_like(x)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 2, 2))
        fn = sampler.sample_ode_likelihood(num_steps=5)
        logp, z = fn(jax.random.PRNGKey(1), x, model)
        np.testing.assert_allclose(z, x, atol=1e-5)
        np.testing.assert_allclose(logp, transport.prior_logp(x), rtol=1e-4)

    @pytest.mark.parametrize("method", ["euler", "heun"])
    def test_likelihood_fixed_grid_methods(self, method):
        """Both fixed-grid likelihood integrators (the CLI passes
        ode.sampling_method straight through, cli/sample.py) — identity
        property for the zero-velocity model."""
        transport = create_transport("Linear", "velocity")
        sampler = Sampler(transport)
        model = lambda x, t: jnp.zeros_like(x)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 2, 2))
        fn = sampler.sample_ode_likelihood(sampling_method=method,
                                           num_steps=5)
        logp, z = fn(jax.random.PRNGKey(1), x, model)
        np.testing.assert_allclose(z, x, atol=1e-5)
        np.testing.assert_allclose(logp, transport.prior_logp(x), rtol=1e-4)

    def test_likelihood_heun_converges_faster_than_euler(self):
        """2nd-order accuracy on a LINEAR time-dependent velocity
        a(t)*x: Rademacher probes make the Hutchinson divergence estimate
        EXACT there (eps^T a eps = a * dim since eps_i^2 = 1), so the logp
        error is pure integrator truncation."""
        transport = create_transport("Linear", "velocity")
        sampler = Sampler(transport)
        model = lambda x, t: (0.2 + 0.6 * t)[..., None, None, None] * x
        x = 0.5 * jax.random.normal(jax.random.PRNGKey(2), (3, 2, 2, 2))
        rng = jax.random.PRNGKey(3)

        def logp_with(method, n):
            fn = sampler.sample_ode_likelihood(sampling_method=method,
                                               num_steps=n)
            return fn(rng, x, model)[0]

        truth = logp_with("euler", 2049)
        err_heun = np.max(np.abs(np.asarray(logp_with("heun", 17) - truth)))
        err_euler = np.max(np.abs(np.asarray(logp_with("euler", 17) - truth)))
        assert err_heun < 0.25 * err_euler
        assert err_heun < 5e-3

    def test_sde_requires_rng_or_noise(self):
        """rng=None without injected Brownian increments must fail loudly
        (a silent PRNGKey(0) default would make every 'random' batch
        byte-identical)."""
        sampler, model, z = self._setup()
        fn = sampler.sample_sde(num_steps=6, diffusion_form="sigma",
                                last_step="Mean", last_step_size=0.04)
        with pytest.raises(ValueError, match="rng=None"):
            fn(None, z, model)


class TestDopri5VsScipy:
    """Tolerance-swept cross-validation of the native adaptive dopri5.

    The reference integrates with torchdiffeq's dopri5
    (/root/reference/transport/integrators.py:83-123).  torchdiffeq is not
    in this image, so scipy's RK45 — the SAME Dormand-Prince 5(4) pair and
    tableau — stands in as the independent implementation.  SURVEY §7.3
    hard part 3 warns solver differences move FID; this pins that the
    native solver's terminal error (a) scales down with tolerance and
    (b) stays within a small constant of scipy's at equal tolerance.
    """

    B, D = 2, 8

    def _drift_np(self, t, x_flat):
        x = x_flat.reshape(self.B, self.D)
        i = np.arange(self.D) + 1.0
        v = (np.tanh(x[:, ::-1] * 0.7) * np.cos(3.0 * t) * i
             - x * (1.0 + 0.5 * np.sin(8.0 * t)))
        return v.reshape(-1)

    def _drift_jax(self, x, t_batch):
        t = t_batch[0]
        i = jnp.arange(self.D) + 1.0
        return (jnp.tanh(x[:, ::-1] * 0.7) * jnp.cos(3.0 * t) * i
                - x * (1.0 + 0.5 * jnp.sin(8.0 * t)))

    def test_terminal_state_tracks_scipy_across_tolerances(self):
        from scipy.integrate import solve_ivp

        rng = np.random.default_rng(0)
        x0 = rng.standard_normal((self.B, self.D)).astype(np.float64)

        truth = solve_ivp(self._drift_np, (0.0, 1.0), x0.reshape(-1),
                          method="RK45", atol=1e-12, rtol=1e-12).y[:, -1]

        errs = {}
        for atol, rtol in [(1e-6, 1e-3), (1e-8, 1e-5)]:
            traj = odeint_dopri5(self._drift_jax, jnp.asarray(x0),
                                 0.0, 1.0, 5, atol=atol, rtol=rtol)
            ours = np.asarray(traj[-1], np.float64).reshape(-1)
            sp = solve_ivp(self._drift_np, (0.0, 1.0), x0.reshape(-1),
                           method="RK45", atol=atol, rtol=rtol).y[:, -1]
            errs[(atol, rtol)] = (
                np.max(np.abs(ours - truth)), np.max(np.abs(sp - truth)))

        loose_ours, loose_sp = errs[(1e-6, 1e-3)]
        tight_ours, tight_sp = errs[(1e-8, 1e-5)]
        # (a) tolerance sweep: tightening tolerances by 1e-2 must shrink the
        # native terminal error by >= 1e-1 (measured: 1.09e-4 -> 8.31e-7, a
        # factor ~130; scipy shows the same profile, 7.19e-4 -> 4.08e-7)
        assert tight_ours < loose_ours * 1e-1, (tight_ours, loose_ours)
        # (b) equal-tolerance agreement with the independent DP5(4): within
        # 50x of scipy's error (measured ratios: 0.15 loose, 2.0 tight)
        for (ours_e, sp_e) in errs.values():
            assert ours_e < 50 * max(sp_e, 1e-12), (ours_e, sp_e)
        # absolute sanity at the reference's default-ish tolerances
        assert loose_ours < 1e-3


def test_dopri5_nan_drift_fails_loudly():
    """A drift that turns NaN mid-trajectory must POISON the returned
    trajectory from that point on (torchdiffeq raises there; inside jit the
    loud analogue is NaN propagation) — not silently freeze at the last
    good state and burn max_steps_per_segment drift evals per segment."""
    from zigma_tpu.transport.integrators import odeint_dopri5

    def drift(x, t):
        bad = jnp.where(t[0] > 0.5, jnp.nan, 1.0)
        return bad * jnp.ones_like(x)

    x0 = jnp.zeros((2, 3))
    traj = odeint_dopri5(drift, x0, 0.0, 1.0, 5)  # saves at 0,.25,.5,.75,1
    assert bool(jnp.isfinite(traj[2]).all())      # clean up to t=0.5
    assert not bool(jnp.isfinite(traj[3]).any())  # poisoned after
    assert not bool(jnp.isfinite(traj[4]).any())
