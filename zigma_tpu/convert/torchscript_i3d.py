"""Convert the StyleGAN-V ``i3d_torchscript.pt`` FVD detector to i3d_jax.

The reference's GATING FVD metric loads this TorchScript archive and calls
it with ``rescale=False, resize=False, return_features=True``
(reference: utils/torchmetric_fvd.py:169-186).  The underlying network is
the Kinetics-400 Inception-v1 I3D graph that
``zigma_tpu.metrics.i3d_jax`` implements natively; this converter extracts
the weights from a locally-cached archive via ``torch.jit.load`` and maps
them onto the JAX tree so FVD feature extraction runs on the accelerator.

Two mapping strategies, tried in order:

1. **By name** — the piergiaj ``pytorch_i3d`` naming
   (``Mixed_3b.b1a.conv3d.weight`` / ``...bn.running_mean``) that
   ``i3d_jax.load_torch_state_dict`` already understands, after
   normalizing separators and case.
2. **By order + shape** — TorchScript state dicts preserve module
   registration order, and the I3D graph registers its units in forward
   order.  The flat tensor list is segmented at every 5-D conv weight;
   trailing 1-D tensors of that unit become BN fields in torch's
   registration order (weight, bias, running_mean, running_var) or the
   logits bias.  This tolerates arbitrary renamings as long as the
   archive is the standard graph.

Both paths end in ``i3d_jax.param_shapes`` validation, so a non-I3D
archive fails loudly instead of producing garbage features.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from zigma_tpu.metrics import i3d_jax

__all__ = ["convert_torchscript_i3d", "state_dict_from_torchscript"]


def state_dict_from_torchscript(path: str) -> Dict[str, np.ndarray]:
    """torch.jit.load a TorchScript archive (or torch.load a raw state
    dict) and return an ordered {name: ndarray} state dict."""
    import torch

    try:
        module = torch.jit.load(path, map_location="cpu")
        sd = module.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _normalize_names(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Canonicalize key spelling to the piergiaj form where possible:
    strip DataParallel prefixes, unify '/'->'.' separators, and case."""
    canon = {re.sub(r"[^a-z0-9]+", "", k.lower()): k
             for k in _piergiaj_keys()}
    out = {}
    for k, v in sd.items():
        k2 = k
        for prefix in ("module.", "detector.", "model."):
            if k2.startswith(prefix):
                k2 = k2[len(prefix):]
        key = re.sub(r"[^a-z0-9]+", "", k2.replace("/", ".").lower())
        out[canon.get(key, k2)] = v
    return out


def _piergiaj_keys():
    for name in i3d_jax.UNIT_SPECS:
        yield f"{name}.conv3d.weight"
        for f in ("weight", "bias", "running_mean", "running_var"):
            yield f"{name}.bn.{f}"
    yield "logits.conv3d.weight"
    yield "logits.conv3d.bias"


def _convert_by_order(sd: Dict[str, np.ndarray]) -> Dict:
    """Order+shape mapping (strategy 2 in the module docstring).

    Units are matched by conv shape, greedily in registration order —
    duplicate shapes exist (e.g. Mixed_3c's b0 and b1a are both 256->128
    1x1x1 convs) and greedy order resolves them, while shape matching
    tolerates units registered out of graph order (piergiaj's module
    registers ``logits`` BEFORE the conv trunk)."""
    units: list[list] = []  # [conv_w, [1-D tensors], matched_flag]
    for k, v in sd.items():
        if v.ndim == 5:
            units.append([v, [], False])
        elif v.ndim == 1 and v.size > 1 and units:
            units[-1][1].append(v)
        # scalars (num_batches_tracked) and anything before the first
        # conv are ignored

    expected = list(i3d_jax.UNIT_SPECS.items())
    if len(units) != len(expected) + 1:
        raise KeyError(
            f"expected {len(expected) + 1} conv units in the archive, "
            f"found {len(units)} — not an InceptionI3d graph?")

    def take(shape):
        for unit in units:
            if not unit[2] and unit[0].shape == shape:
                unit[2] = True
                return unit
        raise KeyError(f"no unmatched conv unit of shape {shape}")

    params = {}
    for name, (cin, cout, (kt, kh, kw), _) in expected:
        w, ones, _ = take((cout, cin, kt, kh, kw))
        bn = [t for t in ones if t.shape == (cout,)]
        if len(bn) < 4:
            raise KeyError(f"{name}: found {len(bn)} BN tensors, need 4")
        params[name] = {
            "w": np.transpose(w, (2, 3, 4, 1, 0)),
            "bn_scale": bn[0], "bn_bias": bn[1],
            "bn_mean": bn[2], "bn_var": bn[3],
        }
    w, ones, _ = take((i3d_jax.NUM_CLASSES, 1024, 1, 1, 1))
    bias = [t for t in ones if t.shape == (i3d_jax.NUM_CLASSES,)]
    if not bias:
        raise KeyError("logits conv has no bias vector")
    params["logits"] = {"w": np.transpose(w, (2, 3, 4, 1, 0)), "b": bias[0]}

    import jax.numpy as jnp

    params = {name: {k: jnp.asarray(v, jnp.float32) for k, v in p.items()}
              for name, p in params.items()}
    for name, sh in i3d_jax.param_shapes().items():
        for k, s in sh.items():
            got = tuple(params[name][k].shape)
            if got != tuple(s):
                raise ValueError(f"{name}.{k}: shape {got} != expected {s}")
    return params


def convert_torchscript_i3d(source) -> Dict:
    """Archive path / torch module / state dict -> i3d_jax param tree."""
    if isinstance(source, str):
        sd = state_dict_from_torchscript(source)
    elif hasattr(source, "state_dict"):
        sd = {k: v.detach().cpu().numpy()
              for k, v in source.state_dict().items()}
    else:
        sd = {k: np.asarray(getattr(v, "numpy", lambda: v)())
              for k, v in source.items()}
    try:
        return i3d_jax.load_torch_state_dict(_normalize_names(sd))
    except KeyError:
        return _convert_by_order(sd)
