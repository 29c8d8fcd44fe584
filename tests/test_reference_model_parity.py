"""Full-model numerical parity vs the EXECUTED reference ZigMa.

The strongest conversion/parity evidence available without release
checkpoints: build the reference's torch ZigMa on CPU (CUDA kernels routed
to its own pure-torch golden refs, the triton RMSNorm and timm PatchEmbed
replaced by faithful public-semantics stubs), run a forward, convert its
REAL state dict with ``convert_state_dict``, and demand float32
machine-precision agreement from our flax model — in both parameter
layouts (per-layer and scan-over-layers).

Skipped when /root/reference or torch is unavailable.
"""

import importlib
import importlib.machinery
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

_cache = {}


def _load_reference_zigma():
    """Import the reference model_zigma with stubs; returns the module."""
    if "mod" in _cache:
        return _cache["mod"]
    if not os.path.isdir(REFERENCE):
        _cache["mod"] = None
        return None
    try:
        import torch
        import torch.nn as nn
    except ImportError:
        _cache["mod"] = None
        return None

    # timm.models.vision_transformer stubs (public timm semantics)
    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, bias=True, **kw):
            super().__init__()
            self.img_size = (img_size, img_size)
            self.patch_size = (patch_size, patch_size)
            self.grid_size = (img_size // patch_size,) * 2
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size, bias=bias)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, drop=0.0, **kw):
            super().__init__()
            hidden = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden, out_features or in_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    vt.PatchEmbed, vt.Mlp = PatchEmbed, Mlp
    timm.models = models
    models.vision_transformer = vt
    for name, mod in (("timm", timm), ("timm.models", models),
                      ("timm.models.vision_transformer", vt)):
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules.setdefault(name, mod)

    # pure-torch RMSNorm for the triton layernorm module (fused fns are
    # unreachable with fused_add_norm=False)
    class RMSNorm(nn.Module):
        def __init__(self, hidden_size, eps=1e-5, device=None, dtype=None):
            super().__init__()
            self.eps = eps
            self.weight = nn.Parameter(
                torch.ones(hidden_size, device=device, dtype=dtype))

        def forward(self, x):
            dt = x.dtype
            x = x.float()
            x = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + self.eps)
            return (x * self.weight.float()).to(dt)

    def _nofuse(*a, **k):
        raise NotImplementedError("fused norm disabled in CPU parity run")

    lnmod = types.ModuleType("dis_mamba.mamba_ssm.ops.triton.layernorm")
    lnmod.RMSNorm, lnmod.layer_norm_fn, lnmod.rms_norm_fn = (RMSNorm,
                                                             _nofuse,
                                                             _nofuse)
    sys.modules.setdefault("dis_mamba.mamba_ssm.ops.triton.layernorm", lnmod)

    for stub in ("causal_conv1d_cuda", "selective_scan_cuda"):
        sys.modules.setdefault(stub, types.ModuleType(stub))
    for p in (REFERENCE, os.path.join(REFERENCE, "dis_mamba"),
              os.path.join(REFERENCE, "dis_causal_conv1d")):
        if p not in sys.path:
            sys.path.insert(0, p)

    try:
        ssi = importlib.import_module(
            "dis_mamba.mamba_ssm.ops.selective_scan_interface")
        ms = importlib.import_module(
            "dis_mamba.mamba_ssm.modules.mamba_simple")
        cc = importlib.import_module(
            "causal_conv1d.causal_conv1d_interface")
        # route fast-path symbols at the reference's own golden refs
        ms.causal_conv1d_fn = cc.causal_conv1d_ref
        ms.selective_scan_fn = ssi.selective_scan_ref
        mod = importlib.import_module("model_zigma")
    except Exception:
        mod = None
    _cache["mod"] = mod
    return mod


pytestmark = pytest.mark.skipif(_load_reference_zigma() is None,
                                reason="reference model not importable")


VARIANTS = {
    "zigzagN2": dict(scan_type="zigzagN2"),
    "v2": dict(scan_type="v2"),
    "hilbertN2": dict(scan_type="hilbertN2"),
    "text": dict(scan_type="zigzagN2", has_text=True, d_context=32,
                 n_context_token=7),
    "class": dict(scan_type="zigzagN2", num_classes=5),
}


@pytest.mark.parametrize("variant", sorted(VARIANTS))
@pytest.mark.parametrize("scan_layers", [False, True])
def test_converted_forward_matches_reference(variant, scan_layers):
    import torch

    from zigma_tpu.convert import convert_state_dict
    from zigma_tpu.models import ZigMa
    import jax
    import jax.numpy as jnp

    mz = _load_reference_zigma()
    kw = dict(VARIANTS[variant])
    has_text = kw.pop("has_text", False)
    num_classes = kw.pop("num_classes", -1)
    d_context = kw.pop("d_context", 0)
    n_ctx = kw.pop("n_context_token", 0)
    if kw["scan_type"] == "v2" and scan_layers:
        pytest.skip("v2 uses the per-layer layout only")

    torch.manual_seed(0)
    ref = mz.ZigMa(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                   patch_size=2, use_pe=2, fused_add_norm=False,
                   rms_norm=True, ssm_cfg={"use_fast_path": False},
                   drop_path_rate=0.0, device="cpu", dtype=torch.float32,
                   has_text=has_text, num_classes=num_classes,
                   d_context=d_context, n_context_token=n_ctx, **kw)
    ref.eval()

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([0.25, 0.75], np.float32)
    y_t = y_j = None
    if has_text:
        y = rng.standard_normal((2, n_ctx, d_context)).astype(np.float32)
        y_t, y_j = torch.from_numpy(y), jnp.asarray(y)
    elif num_classes > 0:
        y = np.array([1, 3])
        y_t, y_j = torch.from_numpy(y), jnp.asarray(y)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t), y_t).numpy()

    sd = {k: v.detach().cpu() for k, v in ref.state_dict().items()}
    params = convert_state_dict(sd, scan_layers=scan_layers)
    mine = ZigMa(in_channels=4, embed_dim=64, depth=2, img_dim=8,
                 patch_size=2, use_pe=2, rms_norm=True, scan_backend="ref",
                 scan_layers=scan_layers, has_text=has_text,
                 num_classes=num_classes, d_context=d_context,
                 n_context_token=n_ctx, **kw)
    out = mine.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x),
                     jnp.asarray(t), y_j)
    np.testing.assert_allclose(np.asarray(out), ref_out,
                               rtol=1e-4, atol=1e-5)


def test_reference_video_config_is_broken_and_our_reading_matches_intent():
    """The reference's shipped 3D name 'zzvideo_sst' fails its own Mamba
    assert (SURVEY §3.2 naming quirk — verified, not just suspected).  With
    a one-line intent-restoring shim (translate the prefix at the Mamba
    boundary), the reference video model runs, and our consistent
    'zzvideo_*' reading reproduces it at float32 machine precision —
    factorized spatial/temporal scans, temporal PE and video unpatchify
    included."""
    import torch
    import jax
    import jax.numpy as jnp

    from zigma_tpu.convert import convert_state_dict
    from zigma_tpu.models import ZigMa

    mz = _load_reference_zigma()
    ms = importlib.import_module("dis_mamba.mamba_ssm.modules.mamba_simple")
    kw = dict(in_channels=4, embed_dim=64, depth=4, img_dim=8, patch_size=2,
              scan_type="zzvideo_sst", video_frames=3, tpe=True, use_pe=2,
              rms_norm=True)

    torch.manual_seed(0)
    with pytest.raises(AssertionError, match="zzvideo"):
        mz.ZigMa(**kw, fused_add_norm=False,
                 ssm_cfg={"use_fast_path": False}, drop_path_rate=0.0,
                 device="cpu", dtype=torch.float32)

    orig_init = ms.Mamba.__init__

    def shim(self, *a, **k):
        if (isinstance(k.get("scan_type"), str)
                and k["scan_type"].startswith("zzvideo_")):
            k["scan_type"] = k["scan_type"].replace("zzvideo_", "video_")
        return orig_init(self, *a, **k)

    ms.Mamba.__init__ = shim
    try:
        torch.manual_seed(0)
        ref = mz.ZigMa(**kw, fused_add_norm=False,
                       ssm_cfg={"use_fast_path": False}, drop_path_rate=0.0,
                       device="cpu", dtype=torch.float32)
        ref.eval()
        x = np.random.default_rng(0).standard_normal(
            (2, 3, 4, 8, 8)).astype(np.float32)
        t = np.array([0.25, 0.75], np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        sd = {k_: v.detach().cpu() for k_, v in ref.state_dict().items()}
    finally:
        ms.Mamba.__init__ = orig_init

    params = convert_state_dict(sd)
    mine = ZigMa(**kw, scan_backend="ref")
    out = mine.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x),
                     jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(out), ref_out,
                               rtol=1e-4, atol=1e-5)
