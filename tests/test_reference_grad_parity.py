"""Model-level GRADIENT parity vs the EXECUTED torch reference.

The last link in "fine-tuning a converted checkpoint is the same training
run": forward parity is at ~6e-7 (test_reference_model_parity), the
optimizer is step-for-step (test_reference_optim_parity) — here the
velocity-loss gradients w.r.t. ALL parameters are compared on an identical
(xt, t, ut) batch: torch autograd through the reference ZigMa (CPU,
pure-torch golden scan/conv refs) vs ``jax.grad`` through our flax model on
the converted weights.

Because every ``convert_state_dict`` transform is layout-only (transpose /
squeeze / stack — convert/torch_zigma.py:8-16), gradients map through the
SAME converter: converting the torch grad "state dict" must reproduce our
grad tree leaf-for-leaf.  Tolerances follow the reference's own fp32
weight-gradient bar (rtolw/atolw 1e-3..2e-3,
/root/reference/dis_mamba/tests/ops/test_selective_scan.py:43-48), applied
per-leaf relative to the gradient scale.

Skipped when /root/reference or torch is unavailable.
"""

import numpy as np
import pytest

from test_reference_model_parity import (_load_reference_zigma,
                                         _perturb_all_params)

pytestmark = pytest.mark.skipif(_load_reference_zigma() is None,
                                reason="reference model not importable")


VARIANTS = {
    "zigzagN2": dict(scan_type="zigzagN2"),
    "v2": dict(scan_type="v2"),
    "class": dict(scan_type="zigzagN2", num_classes=5),
}


@pytest.mark.parametrize("variant", sorted(VARIANTS))
@pytest.mark.parametrize("scan_layers", [False, True])
def test_velocity_loss_grads_match_reference(variant, scan_layers):
    import torch
    import jax
    import jax.numpy as jnp

    from zigma_tpu.convert import convert_state_dict
    from zigma_tpu.models import ZigMa

    mz = _load_reference_zigma()
    kw = dict(VARIANTS[variant])
    num_classes = kw.pop("num_classes", -1)
    if kw["scan_type"] == "v2" and scan_layers:
        pytest.skip("v2 uses the per-layer layout only")

    torch.manual_seed(0)
    # use_fast_path=True: the only reference path with the zigzag
    # permutation (the slow path drops it — see
    # test_reference_model_parity.test_reference_slow_path_drops_permutation)
    ref = mz.ZigMa(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                   patch_size=2, use_pe=2, fused_add_norm=False,
                   rms_norm=True, ssm_cfg={"use_fast_path": True},
                   drop_path_rate=0.0, device="cpu", dtype=torch.float32,
                   num_classes=num_classes, **kw)
    ref.train()
    # perturb off the DiT zero-init: at init the adaLN gate is 0, which
    # zeroes every gradient through the mixer path and makes the test
    # degenerate (see _perturb_all_params)
    _perturb_all_params(ref)

    rng = np.random.default_rng(21)
    xt = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([0.3, 0.7], np.float32)
    ut = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    y_t = y_j = None
    if num_classes > 0:
        y = np.array([1, 3])
        y_t, y_j = torch.from_numpy(y), jnp.asarray(y)

    # --- reference grads (the reference's velocity MSE, train_acc.py) ----
    out = (ref(torch.from_numpy(xt), torch.from_numpy(t), y_t)
           if y_t is not None
           else ref(torch.from_numpy(xt), torch.from_numpy(t)))
    loss = ((out - torch.from_numpy(ut)) ** 2).mean()
    loss.backward()

    sd = {k: v.detach().cpu() for k, v in ref.state_dict().items()}
    named = dict(ref.named_parameters())
    grad_sd, mask_sd = {}, {}
    trained = 0
    for k, v in sd.items():
        p = named.get(k)
        if p is not None and p.grad is not None:
            grad_sd[k] = p.grad.detach().cpu()
            mask_sd[k] = torch.ones_like(v)
            trained += 1
        else:  # buffer or untrained param: excluded from the comparison
            grad_sd[k] = torch.zeros_like(v)
            mask_sd[k] = torch.zeros_like(v)
    assert trained >= 0.7 * len(sd)  # the model is overwhelmingly trainable

    g_ref = convert_state_dict(grad_sd, scan_layers=scan_layers)
    mask = convert_state_dict(mask_sd, scan_layers=scan_layers)
    params = jax.tree.map(jnp.asarray,
                          convert_state_dict(sd, scan_layers=scan_layers))

    # --- our grads --------------------------------------------------------
    mine = ZigMa(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                 patch_size=2, use_pe=2, rms_norm=True, scan_backend="ref",
                 scan_layers=scan_layers, num_classes=num_classes, **kw)

    def loss_fn(p):
        o = mine.apply(p, jnp.asarray(xt), jnp.asarray(t), y_j)
        return jnp.mean((o - jnp.asarray(ut)) ** 2)

    # forward losses agree first (cheap diagnostic on failure)
    np.testing.assert_allclose(float(loss_fn(params)),
                               float(loss.detach()), rtol=1e-5)
    g_jax = jax.grad(loss_fn)(params)

    flat_ref = jax.tree.flatten_with_path(g_ref)[0]
    flat_jax = jax.tree.flatten_with_path(g_jax)[0]
    flat_mask = jax.tree.flatten_with_path(mask)[0]
    assert [p for p, _ in flat_ref] == [p for p, _ in flat_jax]
    compared_elems = 0
    for (path, gr), (_, gj), (_, m) in zip(flat_ref, flat_jax, flat_mask):
        m = np.asarray(m)
        if not m.any():
            continue
        gr, gj = np.asarray(gr), np.asarray(gj) * m
        scale = np.abs(gr).max() + 1e-8
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(gj, gr, rtol=2e-3, atol=2e-3 * scale,
                                   err_msg=f"grad mismatch at {name}")
        compared_elems += int(m.sum())
    # nothing silently skipped: every trained torch element was compared
    # (element count, not leaf count — scan_layers=True stacks per-block
    # leaves so the leaf counts differ between the two trees)
    trained_elems = sum(int(p.grad.numel()) for p in named.values()
                        if p.grad is not None)
    assert compared_elems == trained_elems
