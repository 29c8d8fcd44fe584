"""Stub environment for EXECUTING the reference's metric code on CPU.

The reference's metric stack (my_metrics.py + utils/torchmetric_*.py) owns
the math that grades this rebuild — Fréchet via eigvals, the sFID Mixed_6e
tap, the KID polynomial MMD, PRDC kNN, the IS KL splits, the FVD moment
accumulation — but it sits on three uninstalled third-party packages:

- ``torchmetrics``: only ``Metric`` state plumbing + tiny utilities are
  used.  Stubbed here with documented semantics (add_state / reset /
  dim_zero_cat); every update()/compute() body that runs is reference code.
- ``torch_fidelity``: provides the FID InceptionV3 feature net.  Stubbed
  with a full torch implementation of that architecture (public
  pytorch-fid/torch-fidelity block semantics, the same graph our JAX net
  mirrors — zigma_tpu/metrics/inception_jax.py) with DETERMINISTIC random
  weights, plus a faithful TF1 asymmetric bilinear resize.  The reference's
  own ``NoTrainInceptionV3.forward`` (utils/torchmetric_sfid.py:86-170)
  then drives it verbatim — preprocessing included.
- ``torchvision``: imported but unused at runtime by these files; empty.

Weight sharing with JAX: the torch net is keyed exactly like the
``pt_inception-2015-12-05`` state dict, so
``inception_jax.load_torch_state_dict(net.state_dict())`` maps the SAME
random weights onto our native net — the parity tests compare metric
numbers computed from identical weights and identical uint8 batches.
"""

import sys
import types

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from zigma_tpu.metrics import inception_jax as inc

_SEED = 20260818


# ---------------------------------------------------------------------------
# TF1 asymmetric bilinear resize (torch_fidelity's
# interpolate_bilinear_2d_like_tensorflow1x contract: src = dst * scale,
# align_corners=False, NO half-pixel centers).  Independent implementation
# from the public formula — cross-checks our JAX tf1_bilinear_resize.
# ---------------------------------------------------------------------------


def interpolate_bilinear_2d_like_tensorflow1x(x, size, align_corners=False):
    assert not align_corners
    _, _, h, w = x.shape
    oh, ow = size

    def axis(in_s, out_s):
        scale = in_s / out_s
        src = torch.arange(out_s, dtype=torch.float32) * scale
        lo = torch.clamp(src.floor(), max=in_s - 1).long()
        hi = torch.clamp(lo + 1, max=in_s - 1)
        frac = (src - lo.to(src.dtype)).to(x.dtype)
        return lo, hi, frac

    lo_h, hi_h, fh = axis(h, oh)
    lo_w, hi_w, fw = axis(w, ow)
    top, bot = x[:, :, lo_h, :], x[:, :, hi_h, :]
    rows = top + (bot - top) * fh.view(1, 1, -1, 1)
    left, right = rows[:, :, :, lo_w], rows[:, :, :, hi_w]
    return left + (right - left) * fw.view(1, 1, 1, -1)


def vassert(cond, msg):
    assert cond, msg


# ---------------------------------------------------------------------------
# torch FID-InceptionV3 (pt_inception key layout; widths from the same
# architecture table as the JAX net; block topology per public
# pytorch-fid / torchvision InceptionV3 semantics)
# ---------------------------------------------------------------------------


class _BC(nn.Module):
    """BasicConv2d: conv(bias=False) + BN(eps=1e-3) + relu."""

    def __init__(self, name):
        super().__init__()
        cin, cout, k, s, p = inc.CONV_SPECS[name]
        self.conv = nn.Conv2d(cin, cout, k, stride=s, padding=p, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg_nopad(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class _InceptionA(nn.Module):
    def __init__(self, prefix):
        super().__init__()
        for b in ("branch1x1", "branch5x5_1", "branch5x5_2",
                  "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3",
                  "branch_pool"):
            setattr(self, b, _BC(f"{prefix}.{b}"))

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg_nopad(x)),
        ], 1)


class _InceptionB(nn.Module):
    def __init__(self, prefix):
        super().__init__()
        for b in ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                  "branch3x3dbl_3"):
            setattr(self, b, _BC(f"{prefix}.{b}"))

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class _InceptionC(nn.Module):
    def __init__(self, prefix):
        super().__init__()
        for b in ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                  "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                  "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"):
            setattr(self, b, _BC(f"{prefix}.{b}"))

    def forward(self, x):
        b77 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        d = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            d = m(d)
        return torch.cat([self.branch1x1(x), b77, d,
                          self.branch_pool(_avg_nopad(x))], 1)


class _InceptionD(nn.Module):
    def __init__(self, prefix):
        super().__init__()
        for b in ("branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                  "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"):
            setattr(self, b, _BC(f"{prefix}.{b}"))

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3, self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class _InceptionE(nn.Module):
    def __init__(self, prefix, pool):
        super().__init__()
        self._pool = pool
        for b in ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                  "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                  "branch3x3dbl_3b", "branch_pool"):
            setattr(self, b, _BC(f"{prefix}.{b}"))

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        d = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        d = torch.cat([self.branch3x3dbl_3a(d), self.branch3x3dbl_3b(d)], 1)
        pooled = (_avg_nopad(x) if self._pool == "avg"
                  else F.max_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([self.branch1x1(x), b3, d,
                          self.branch_pool(pooled)], 1)


class FeatureExtractorInceptionV3(nn.Module):
    """torch_fidelity-shaped FID Inception with deterministic random
    weights (same weights for every instance — the metric classes each
    build their own copy)."""

    INPUT_IMAGE_SIZE = 299

    def __init__(self, name="inception-v3-compat", features_list=("2048",),
                 feature_extractor_weights_path=None):
        super().__init__()
        self.features_list = list(features_list)
        self.Conv2d_1a_3x3 = _BC("Conv2d_1a_3x3")
        self.Conv2d_2a_3x3 = _BC("Conv2d_2a_3x3")
        self.Conv2d_2b_3x3 = _BC("Conv2d_2b_3x3")
        self.MaxPool_1 = nn.MaxPool2d(3, stride=2)
        self.Conv2d_3b_1x1 = _BC("Conv2d_3b_1x1")
        self.Conv2d_4a_3x3 = _BC("Conv2d_4a_3x3")
        self.MaxPool_2 = nn.MaxPool2d(3, stride=2)
        self.Mixed_5b = _InceptionA("Mixed_5b")
        self.Mixed_5c = _InceptionA("Mixed_5c")
        self.Mixed_5d = _InceptionA("Mixed_5d")
        self.Mixed_6a = _InceptionB("Mixed_6a")
        self.Mixed_6b = _InceptionC("Mixed_6b")
        self.Mixed_6c = _InceptionC("Mixed_6c")
        self.Mixed_6d = _InceptionC("Mixed_6d")
        self.Mixed_6e = _InceptionC("Mixed_6e")
        self.Mixed_7a = _InceptionD("Mixed_7a")
        self.Mixed_7b = _InceptionE("Mixed_7b", pool="avg")
        self.Mixed_7c = _InceptionE("Mixed_7c", pool="max")
        self.AvgPool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(2048, inc.NUM_CLASSES)

        g = torch.Generator().manual_seed(_SEED)
        with torch.no_grad():
            for m in self.modules():
                if isinstance(m, nn.Conv2d):
                    fan_in = m.weight.shape[1] * m.weight.shape[2] * m.weight.shape[3]
                    m.weight.copy_(torch.randn(m.weight.shape, generator=g)
                                   / np.sqrt(fan_in))
                elif isinstance(m, nn.BatchNorm2d):
                    m.weight.copy_(1 + 0.2 * torch.randn(m.weight.shape,
                                                         generator=g))
                    m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))
                    m.running_mean.copy_(
                        0.1 * torch.randn(m.running_mean.shape, generator=g))
                    m.running_var.copy_(
                        0.5 + torch.rand(m.running_var.shape, generator=g))
                elif isinstance(m, nn.Linear):
                    m.weight.copy_(torch.randn(m.weight.shape, generator=g)
                                   / np.sqrt(m.weight.shape[1]))
                    m.bias.zero_()
        self.eval()


# ---------------------------------------------------------------------------
# torchmetrics stub: Metric state plumbing + the handful of utilities the
# reference files import.  All semantics here are the documented public
# torchmetrics behaviors the reference relies on.
# ---------------------------------------------------------------------------


class Metric(nn.Module):
    def __init__(self, **kwargs):  # swallows sync_on_compute etc.
        super().__init__()
        self._defaults = {}

    def add_state(self, name, default, dist_reduce_fx=None):
        self._defaults[name] = (default.detach().clone()
                                if torch.is_tensor(default)
                                else list(default))
        setattr(self, name,
                default.detach().clone() if torch.is_tensor(default)
                else list(default))

    def reset(self):
        for name, default in self._defaults.items():
            setattr(self, name,
                    default.detach().clone() if torch.is_tensor(default)
                    else list(default))

    def to(self, device):
        return self


def dim_zero_cat(x):
    if torch.is_tensor(x):
        return x
    return torch.cat(list(x), dim=0)


def _rank_zero_warn(*a, **k):
    pass


def _module(name, **attrs):
    mod = types.ModuleType(name)
    mod.__spec__ = None
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stubs():
    """Install torchmetrics / torch_fidelity / torchvision stubs.  Must run
    BEFORE importing the reference metric modules.  Idempotent."""
    if "torchmetrics" in sys.modules:
        return sys.modules["torchmetrics"]

    tf_pkg = _module("torch_fidelity")
    tf_pkg.feature_extractor_inceptionv3 = _module(
        "torch_fidelity.feature_extractor_inceptionv3",
        FeatureExtractorInceptionV3=FeatureExtractorInceptionV3)
    tf_pkg.helpers = _module("torch_fidelity.helpers", vassert=vassert)
    tf_pkg.interpolate_compat_tensorflow = _module(
        "torch_fidelity.interpolate_compat_tensorflow",
        interpolate_bilinear_2d_like_tensorflow1x=(
            interpolate_bilinear_2d_like_tensorflow1x))

    tv = _module("torchvision")
    tv.transforms = _module("torchvision.transforms")

    tm = _module("torchmetrics", Metric=Metric)
    tm.metric = _module("torchmetrics.metric", Metric=Metric)
    tm.utilities = _module("torchmetrics.utilities",
                           rank_zero_warn=_rank_zero_warn)
    tm.utilities.data = _module("torchmetrics.utilities.data",
                                dim_zero_cat=dim_zero_cat)
    tm.utilities.imports = _module("torchmetrics.utilities.imports",
                                   _TORCH_FIDELITY_AVAILABLE=True,
                                   _MATPLOTLIB_AVAILABLE=False)
    tm.utilities.plot = _module("torchmetrics.utilities.plot",
                                _AX_TYPE=None, _PLOT_OUT_TYPE=None)
    tm.image = _module("torchmetrics.image")
    tm.image.fid = _module("torchmetrics.image.fid")
    tm.image.inception = _module("torchmetrics.image.inception")
    tm.image.kid = _module("torchmetrics.image.kid")
    return tm


def load_reference_metrics():
    """Install stubs, import the reference metric modules, wire the
    torchmetrics.image.* names my_metrics.py imports, import my_metrics.

    Returns a namespace with: sfid, kid, prdc, inception, fvd (the
    reference utils modules), my_metrics, and the shared torch feature net
    class.  None if anything is unavailable.
    """
    import importlib
    import os

    if not os.path.isdir("/root/reference"):
        return None
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    tm = install_stubs()

    ref_sfid = importlib.import_module("utils.torchmetric_sfid")

    class TMNoTrainInceptionV3(nn.Module):
        """torchmetrics-style wrapper: runs the REFERENCE's
        NoTrainInceptionV3.forward (tuple of taps) and returns the single
        flat (B, F) tensor the kid/prdc/inception classes expect — the
        documented contract of torchmetrics' own NoTrainInceptionV3."""

        def __init__(self, name="inception-v3-compat",
                     features_list=("2048",),
                     feature_extractor_weights_path=None):
            super().__init__()
            self.net = ref_sfid.NoTrainInceptionV3(
                name=name, features_list=list(features_list))

        def forward(self, x):
            out = self.net(x)[0]
            return out.reshape(x.shape[0], -1)

    tm.image.fid.NoTrainInceptionV3 = TMNoTrainInceptionV3

    ref_kid = importlib.import_module("utils.torchmetric_kid")
    ref_prdc = importlib.import_module("utils.torchmetric_prdc")
    ref_is = importlib.import_module("utils.torchmetric_inception")
    ref_fvd = importlib.import_module("utils.torchmetric_fvd")

    class _TupleFeature(nn.Module):
        """Feature module for the sfid-class ``feature=Module`` path, whose
        update() indexes ``self.inception(imgs)[0]`` expecting a tuple."""

        def __init__(self, feature="2048"):
            super().__init__()
            self.wrapped = TMNoTrainInceptionV3(features_list=[feature])
            self.num_features = {"2048": 2048, "768": 2023,
                                 "logits_unbiased": inc.NUM_CLASSES,
                                 "64": 64, "192": 192}[feature]

        def forward(self, x):
            return (self.wrapped(x),)

    class FrechetInceptionDistance(ref_sfid.sFrechetInceptionDistance):
        """my_metrics.py:18-23 uses stock torchmetrics FID(feature=2048).
        Same Fréchet machinery as the reference's sFID class (which is the
        torchmetrics implementation with the 768 tap); this shim routes the
        int-feature constructor through the Module path at the requested
        tap so the reference code computes plain FID-2048."""

        def __init__(self, feature=2048, **kw):
            super().__init__(feature=_TupleFeature(str(feature)), **kw)

    tm.image.fid.FrechetInceptionDistance = FrechetInceptionDistance
    tm.image.inception.InceptionScore = ref_is.InceptionScore
    tm.image.kid.KernelInceptionDistance = ref_kid.KernelInceptionDistance

    my_metrics = importlib.import_module("my_metrics")

    ns = types.SimpleNamespace(
        sfid=ref_sfid, kid=ref_kid, prdc=ref_prdc, inception=ref_is,
        fvd=ref_fvd, my_metrics=my_metrics,
        TMNoTrainInceptionV3=TMNoTrainInceptionV3,
        TupleFeature=_TupleFeature,
        FrechetInceptionDistance=FrechetInceptionDistance,
        net_class=FeatureExtractorInceptionV3)
    return ns
