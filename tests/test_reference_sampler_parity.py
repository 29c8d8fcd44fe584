"""End-to-end sampling-loop parity vs the EXECUTED torch reference.

This is the executable proxy for the FID gate (BASELINE.md): compose every
already-proven layer — converted weights (test_reference_model_parity),
transport pointwise parity (test_reference_transport_parity) — the way the
graded metric would: run the reference's OWN ``Sampler`` loops
(/root/reference/transport/transport.py:236-478, driven as in
sample_acc.py:326-392) on the torch reference ZigMa and demand agreement
of the final latents with our native ``transport.Sampler`` from identical
noise.

torchdiffeq is not installed here, so a minimal faithful stub is provided
for the reference's ``ode`` class (/root/reference/transport/integrators.py:
84-123): fixed-grid Euler is ten lines of unambiguous math (one forward
Euler step per grid interval — torchdiffeq's documented fixed-grid
semantics), and dopri5 is scipy's RK45 (the same Dormand-Prince pair) so
the adaptive comparison is tolerance-bounded, not solver-identical.  All
the *interesting* reference code — drift/score wrappers, eps-interval
bookkeeping, SDE loop, last-step rules, likelihood autograd — executes
verbatim from /root/reference.

Shared randomness: the reference's SDE loop draws ``th.randn`` per step and
its likelihood drift draws a fresh ``th.randint`` Rademacher probe per
evaluation; both sequences are recorded via monkeypatch and injected into
our samplers (``sample_sde(..., noise=...)``, likelihood ``probes=...``).

Skipped when /root/reference or torch is unavailable.
"""

import sys
import types

import numpy as np
import pytest

from test_reference_model_parity import (_load_reference_zigma,
                                         _perturb_all_params)

pytestmark = pytest.mark.skipif(_load_reference_zigma() is None,
                                reason="reference model not importable")

_cache = {}


def _install_torchdiffeq_stub():
    """Minimal odeint covering the two methods the reference uses.

    euler: y_{i+1} = y_i + f(t_i, y_i) * (t_{i+1} - t_i) over the given
    grid, saving every grid point incl. t[0] (torchdiffeq fixed-grid
    contract).  dopri5: scipy RK45 (same DP(4,5) pair) at the requested
    tolerances — adaptive-correct, so cross-framework disagreement is
    bounded by the tolerance, which is all the dopri5 test asserts.
    Supports the tuple states the reference likelihood path uses.
    """
    if "torchdiffeq" in sys.modules:
        return
    import torch as th

    def odeint(func, y0, t, rtol=1e-7, atol=1e-9, method=None, options=None):
        is_tuple = isinstance(y0, tuple)
        ys0 = y0 if is_tuple else (y0,)
        if method in ("euler", "Euler"):
            # the reference drives sampling under torch.no_grad()
            # (sample_acc.py:360-362); the step arithmetic must run there
            # too so the likelihood drift's x stays an autograd leaf
            ys = [ys0]
            y = ys0
            for i in range(len(t) - 1):
                dt = t[i + 1] - t[i]
                f = func(t[i], y if is_tuple else y[0])
                f = f if is_tuple else (f,)
                with th.no_grad():
                    y = tuple((yi + dt * fi).detach()
                              for yi, fi in zip(y, f))
                ys.append(y)
        elif method == "dopri5":
            from scipy.integrate import solve_ivp

            shapes = [tuple(yi.shape) for yi in ys0]
            sizes = [int(np.prod(s)) for s in shapes]

            def pack(ys_):
                return np.concatenate(
                    [yi.detach().cpu().numpy().ravel().astype(np.float64)
                     for yi in ys_])

            def unpack(v):
                out, o = [], 0
                for s, n in zip(shapes, sizes):
                    out.append(th.from_numpy(
                        v[o:o + n].reshape(s).astype(np.float32)))
                    o += n
                return tuple(out)

            def rhs(ti, v):
                ys_ = unpack(v)
                with th.no_grad():
                    f = func(th.tensor(float(ti)),
                             ys_ if is_tuple else ys_[0])
                return pack(f if is_tuple else (f,))

            a = atol[0] if isinstance(atol, (list, tuple)) else atol
            r = rtol[0] if isinstance(rtol, (list, tuple)) else rtol
            tn = np.asarray(t.detach().cpu().numpy(), np.float64)
            sol = solve_ivp(rhs, (tn[0], tn[-1]), pack(ys0), method="RK45",
                            t_eval=tn, rtol=float(r), atol=float(a))
            assert sol.success, sol.message
            ys = [unpack(sol.y[:, j]) for j in range(sol.y.shape[1])]
        else:
            raise NotImplementedError(method)
        stacked = tuple(
            th.stack([step[k] for step in ys]) for k in range(len(ys0)))
        return stacked if is_tuple else stacked[0]

    mod = types.ModuleType("torchdiffeq")
    mod.odeint = odeint
    mod.__spec__ = None
    sys.modules["torchdiffeq"] = mod


def _ref_transport_mod():
    """Import the reference `transport` package (executes verbatim)."""
    if "mod" in _cache:
        return _cache["mod"]
    _load_reference_zigma()  # sets up sys.path + torch stubs
    _install_torchdiffeq_stub()
    import importlib
    _cache["mod"] = importlib.import_module("transport")
    return _cache["mod"]


def _build_pair():
    """Tiny reference ZigMa + our converted flax twin (fp32, CPU).

    Returns (torch_model_fn, jax_model_fn, latent_shape).
    """
    if "pair" in _cache:
        return _cache["pair"]
    import torch
    import jax
    import jax.numpy as jnp

    from zigma_tpu.convert import convert_state_dict
    from zigma_tpu.models import ZigMa

    mz = _load_reference_zigma()
    torch.manual_seed(0)
    # use_fast_path=True (the permuting, trained path) + perturbed weights:
    # at DiT zero-init the adaLN gate is 0 and the sampler would never
    # exercise the mixer (see test_reference_model_parity._perturb_all_params)
    ref = mz.ZigMa(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                   patch_size=2, use_pe=2, fused_add_norm=False,
                   rms_norm=True, ssm_cfg={"use_fast_path": True},
                   drop_path_rate=0.0, device="cpu", dtype=torch.float32,
                   scan_type="zigzagN2")
    ref.eval()
    _perturb_all_params(ref)
    sd = {k: v.detach().cpu() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_state_dict(sd))
    mine = ZigMa(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                 patch_size=2, use_pe=2, rms_norm=True, scan_backend="ref",
                 scan_type="zigzagN2")

    def torch_model_fn(x, t, **kw):
        with torch.no_grad():
            return ref(x, t)

    def torch_model_fn_grad(x, t, **kw):
        return ref(x, t)  # likelihood needs autograd through the model

    @jax.jit
    def jax_model_fn(x, t):
        return mine.apply(params, x, t)

    _cache["pair"] = (torch_model_fn, torch_model_fn_grad, jax_model_fn,
                      (2, 4, 8, 8))
    return _cache["pair"]


def _transports(path_type, prediction, eps):
    """Matched (reference, ours) transports.  Explicit eps sidesteps the
    reference's sample_eps-default bug our create_transport fixes
    (zigma_tpu/transport/transport.py:313-320)."""
    import zigma_tpu.transport as ours
    ref = _ref_transport_mod()
    r = ref.create_transport(path_type=path_type, prediction=prediction,
                             train_eps=eps, sample_eps=eps)
    m = ours.create_transport(path_type=path_type, prediction=prediction,
                              train_eps=eps, sample_eps=eps)
    return ref.Sampler(r), ours.Sampler(m)


@pytest.mark.parametrize("path_type,prediction,eps", [
    ("Linear", "velocity", None),
    ("GVP", "velocity", None),
    ("Linear", "score", 1e-3),
])
def test_ode_euler50_parity(path_type, prediction, eps):
    """Fixed-grid Euler-50: same grid, same fp32 math order -> only
    accumulation error.  Exercises the drift wrappers (velocity passthrough
    AND the score-ODE compute_drift composition) plus eps intervals."""
    import torch
    import jax.numpy as jnp

    torch_fn, _, jax_fn, shape = _build_pair()
    ref_sampler, my_sampler = _transports(path_type, prediction, eps)

    z = np.random.default_rng(7).standard_normal(shape).astype(np.float32)

    ref_fn = ref_sampler.sample_ode(sampling_method="euler", num_steps=50)
    ref_out = ref_fn(torch.from_numpy(z), torch_fn)[-1].numpy()

    my_fn = my_sampler.sample_ode(sampling_method="euler", num_steps=50)
    my_out = np.asarray(my_fn(jnp.asarray(z), jax_fn)[-1])

    np.testing.assert_allclose(my_out, ref_out, rtol=1e-3, atol=1e-4)


def test_ode_euler_reverse_parity():
    """reverse=True (data -> noise direction): the reference remaps
    t -> 1-t inside the drift and swaps the interval; ours must match."""
    import torch
    import jax.numpy as jnp

    torch_fn, _, jax_fn, shape = _build_pair()
    ref_sampler, my_sampler = _transports("Linear", "velocity", None)

    x = np.random.default_rng(8).standard_normal(shape).astype(np.float32)

    ref_fn = ref_sampler.sample_ode(sampling_method="euler", num_steps=20,
                                    reverse=True)
    ref_out = ref_fn(torch.from_numpy(x), torch_fn)[-1].numpy()

    my_fn = my_sampler.sample_ode(sampling_method="euler", num_steps=20,
                                  reverse=True)
    my_out = np.asarray(my_fn(jnp.asarray(x), jax_fn)[-1])

    np.testing.assert_allclose(my_out, ref_out, rtol=1e-3, atol=1e-4)


def test_ode_dopri5_tolerance_bounded_parity():
    """Adaptive path: reference drift through scipy RK45 vs our native
    dopri5, both at (atol=1e-6, rtol=1e-4).  Both are tol-controlled
    integrations of drifts that agree to ~6e-7, so the final latents must
    agree to a tolerance-derived bound (global error ~ O(50x local tol) on
    O(1) latents), far tighter than the trajectory spread itself."""
    import torch
    import jax.numpy as jnp

    torch_fn, _, jax_fn, shape = _build_pair()
    ref_sampler, my_sampler = _transports("Linear", "velocity", None)

    z = np.random.default_rng(9).standard_normal(shape).astype(np.float32)

    ref_fn = ref_sampler.sample_ode(sampling_method="dopri5", num_steps=5,
                                    atol=1e-6, rtol=1e-4)
    ref_out = ref_fn(torch.from_numpy(z), torch_fn)[-1].numpy()

    my_fn = my_sampler.sample_ode(sampling_method="dopri5", num_steps=5,
                                  atol=1e-6, rtol=1e-4)
    my_out = np.asarray(my_fn(jnp.asarray(z), jax_fn)[-1])

    assert np.max(np.abs(my_out - ref_out)) < 5e-4
    # and both must actually be near the (tighter-tol) truth
    truth_fn = ref_sampler.sample_ode(sampling_method="dopri5", num_steps=5,
                                      atol=1e-9, rtol=1e-7)
    truth = truth_fn(torch.from_numpy(z), torch_fn)[-1].numpy()
    assert np.max(np.abs(ref_out - truth)) < 5e-4
    assert np.max(np.abs(my_out - truth)) < 5e-4


@pytest.mark.parametrize("last_step", ["Mean", "Euler", "Tweedie", None])
def test_sde_euler_shared_noise_parity(last_step):
    """Euler-Maruyama with the reference's OWN loop (integrators.py:31-80,
    no torchdiffeq involved) and its exact th.randn sequence injected into
    our sdeint; covers all last-step rules (transport.py:273-307)."""
    import torch as th
    import jax.numpy as jnp

    torch_fn, _, jax_fn, shape = _build_pair()
    ref_sampler, my_sampler = _transports("Linear", "velocity", None)
    num_steps = 20

    kw = dict(sampling_method="Euler", diffusion_form="sigma",
              diffusion_norm=1.0, last_step=last_step, last_step_size=0.04,
              num_steps=num_steps)
    ref_fn = ref_sampler.sample_sde(**kw)
    my_fn = my_sampler.sample_sde(**kw)

    z = np.random.default_rng(11).standard_normal(shape).astype(np.float32)

    draws = []
    orig_randn = th.randn

    def recording_randn(*a, **k):
        out = orig_randn(*a, **k)
        draws.append(out.detach().clone())
        return out

    th.manual_seed(3)
    th.randn = recording_randn
    try:
        ref_traj = ref_fn(th.from_numpy(z), torch_fn)
    finally:
        th.randn = orig_randn
    ref_out = ref_traj[-1].numpy()
    assert len(ref_traj) == num_steps  # the reference's own loop contract
    assert len(draws) == num_steps - 1
    noise = jnp.asarray(np.stack([d.numpy() for d in draws]))

    my_traj = my_fn(None, jnp.asarray(z), jax_fn, noise=noise)
    assert my_traj.shape[0] == num_steps
    my_out = np.asarray(my_traj[-1])

    np.testing.assert_allclose(my_out, ref_out, rtol=1e-3, atol=1e-4)


def test_likelihood_euler_shared_probe_parity():
    """Likelihood ODE (NLL path): the reference's autograd Hutchinson drift
    (transport.py:437-448) on the fixed Euler grid vs our jax.vjp version,
    with the reference's exact th.randint probe sequence injected.  Checks
    both the recovered noise z and the per-image log-likelihood."""
    import torch as th
    import jax.numpy as jnp

    _, torch_fn_grad, jax_fn, shape = _build_pair()
    ref_sampler, my_sampler = _transports("Linear", "velocity", None)
    num_steps = 12

    ref_fn = ref_sampler.sample_ode_likelihood(
        sampling_method="euler", num_steps=num_steps)
    my_fn = my_sampler.sample_ode_likelihood(
        sampling_method="euler", num_steps=num_steps)

    x = (0.5 * np.random.default_rng(13).standard_normal(shape)
         ).astype(np.float32)

    draws = []
    orig_randint = th.randint

    def recording_randint(*a, **k):
        out = orig_randint(*a, **k)
        draws.append(out.detach().clone())
        return out

    th.manual_seed(5)
    th.randint = recording_randint
    try:
        ref_logp, ref_z = ref_fn(th.from_numpy(x), torch_fn_grad)
    finally:
        th.randint = orig_randint
    ref_logp, ref_z = ref_logp.detach().numpy(), ref_z.detach().numpy()
    assert len(draws) == num_steps - 1  # one fresh probe per drift eval
    probes = jnp.asarray(
        np.stack([d.numpy() for d in draws]).astype(np.float32) * 2 - 1)

    my_logp, my_z = my_fn(None, jnp.asarray(x), jax_fn, probes=probes)

    np.testing.assert_allclose(np.asarray(my_z), ref_z,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(my_logp), ref_logp,
                               rtol=1e-4, atol=5e-2)
