"""PyTorch -> JAX checkpoint converter for reference ZigMa checkpoints.

Maps the reference's torch state dict (reference: model_zigma.py:544-909,
mamba_simple.py:96-264; checkpoints saved as {model, ema, opt, args,
train_steps, best_fid} by train_acc.py:492-505, loaded with "module."
stripping by sample_acc.py:70-79) onto this package's flax param tree.

Layout rules (the FID-within-1% risk surface, SURVEY.md §7.3 item 2):
- torch ``Linear.weight`` (out, in)  -> flax kernel (in, out): transpose.
- torch ``Conv2d.weight`` (out, in, kh, kw) -> flax (kh, kw, in, out).
- torch depthwise ``Conv1d.weight`` (d, 1, w) -> (d, w): squeeze; tap w-1
  is the current timestep in both layouts.
- ``nn.Embedding.weight`` -> flax Embed ``embedding`` (no transpose).
- Mamba branch params keep their names (A_log, D, dt bias) — fp32.
- v2 backward-direction params (``*_b``) land in the ``scan_b`` branch.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np

__all__ = ["convert_state_dict", "load_torch_checkpoint",
           "convert_reference_checkpoint", "jax_tree_stack"]


def jax_tree_stack(trees: list) -> dict:
    """Stack a list of identically-structured dict trees leaf-wise."""
    first = trees[0]
    if isinstance(first, dict):
        return {k: jax_tree_stack([t[k] for t in trees]) for k in first}
    return np.stack([np.asarray(t) for t in trees])


def _t(x):
    return np.ascontiguousarray(np.asarray(x).T)


def _to_np(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().float().numpy()
    return np.asarray(v)


def _strip_module(sd: dict) -> dict:
    return {re.sub(r"^module\.", "", k): v for k, v in sd.items()}


def _linear(dst: dict, name: str, sd: dict, src: str):
    w = sd.pop(f"{src}.weight", None)
    if w is None:
        return
    entry = {"kernel": _t(w)}
    b = sd.pop(f"{src}.bias", None)
    if b is not None:
        entry["bias"] = np.asarray(b)
    dst[name] = entry


def _scan_branch(sd: dict, prefix: str, suffix: str = "") -> Optional[dict]:
    """Collect one Mamba scan branch ('' forward, '_b' backward)."""
    a_log = sd.pop(f"{prefix}.A{suffix}_log", None)
    if a_log is None:
        return None
    out = {
        "A_log": np.asarray(a_log),
        "D": np.asarray(sd.pop(f"{prefix}.D{suffix}")),
        "conv1d_weight": np.asarray(
            sd.pop(f"{prefix}.conv1d{suffix}.weight")).squeeze(1),  # (d,1,w)->(d,w)
        "x_proj_kernel": _t(sd.pop(f"{prefix}.x_proj{suffix}.weight")),
        "dt_proj_kernel": _t(sd.pop(f"{prefix}.dt_proj{suffix}.weight")),
        "dt_proj_bias": np.asarray(sd.pop(f"{prefix}.dt_proj{suffix}.bias")),
    }
    conv_b = sd.pop(f"{prefix}.conv1d{suffix}.bias", None)
    if conv_b is not None:
        out["conv1d_bias"] = np.asarray(conv_b)
    return out


def convert_state_dict(sd: dict, strict: bool = True,
                       scan_layers: bool = False) -> dict:
    """Torch ZigMa state dict -> flax ``{"params": {...}}`` tree.

    The block count and feature flags (text / class / v2 / parallelN) are
    inferred from the keys, so one converter serves every released
    checkpoint (faceshq1024, landscape1024, churches256, coco;
    README.md:142-159).

    scan_layers=True stacks the per-block trees along a leading depth axis
    into one ``blocks`` entry — the layout of models built with
    ``ZigMa(scan_layers=True)`` (nn.scan over layers).
    """
    sd = {k: _to_np(v) for k, v in _strip_module(sd).items()}
    p: dict = {}

    # patch embedder: conv (D, C, ph, pw) -> (ph, pw, C, D)
    w = sd.pop("x_embedder.proj.weight")
    p["x_embedder"] = {"proj": {
        "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
        "bias": np.asarray(sd.pop("x_embedder.proj.bias")),
    }}

    p["t_embedder"] = {}
    _linear(p["t_embedder"], "mlp_0", sd, "t_embedder.mlp.0")
    _linear(p["t_embedder"], "mlp_2", sd, "t_embedder.mlp.2")

    if "y_embedder.weight" in sd:  # text: plain Linear (model_zigma.py:667)
        _linear(p, "y_embedder", sd, "y_embedder")
    elif "y_embedder.embedding_table.weight" in sd:  # class labels
        p["y_embedder"] = {"embedding": {
            "embedding": np.asarray(sd.pop("y_embedder.embedding_table.weight"))}}

    for key, dst in (("pos_embed", "pos_embed"),
                     ("temporal_pos_embedding", "temporal_pos_embedding")):
        if key in sd:
            p[dst] = np.asarray(sd.pop(key))

    # blocks
    block_ids = sorted({int(m.group(1)) for k in sd
                        for m in [re.match(r"blocks\.(\d+)\.", k)] if m})
    for i in block_ids:
        pre = f"blocks.{i}"
        blk: dict = {}
        blk["norm_weight"] = np.asarray(sd.pop(f"{pre}.norm.weight"))
        nb = sd.pop(f"{pre}.norm.bias", None)
        if nb is not None:
            blk["norm_bias"] = np.asarray(nb)
        _linear(blk, "adaLN", sd, f"{pre}.adaLN_modulation.1")

        mixer: dict = {}
        _linear(mixer, "in_proj", sd, f"{pre}.mixer.in_proj")
        _linear(mixer, "out_proj", sd, f"{pre}.mixer.out_proj")
        mixer["scan"] = _scan_branch(sd, f"{pre}.mixer")
        b_branch = _scan_branch(sd, f"{pre}.mixer", "_b")
        if b_branch is not None:
            mixer["scan_b"] = b_branch
        # parallelN branches (ParameterList/ModuleList naming,
        # mamba_simple.py:173-227; dead in the reference forward)
        for j in range(64):
            if f"{pre}.mixer.A_b_log_list.{j}" not in sd:
                break
            br = {
                "A_log": np.asarray(sd.pop(f"{pre}.mixer.A_b_log_list.{j}")),
                "D": np.asarray(sd.pop(f"{pre}.mixer.D_b_list.{j}")),
                "conv1d_weight": np.asarray(
                    sd.pop(f"{pre}.mixer.conv1d_b_list.{j}.weight")).squeeze(1),
                "x_proj_kernel": _t(
                    sd.pop(f"{pre}.mixer.x_proj_b_list.{j}.weight")),
                "dt_proj_kernel": _t(
                    sd.pop(f"{pre}.mixer.dt_proj_b_list.{j}.weight")),
                "dt_proj_bias": np.asarray(
                    sd.pop(f"{pre}.mixer.dt_proj_b_list.{j}.bias")),
            }
            cb = sd.pop(f"{pre}.mixer.conv1d_b_list.{j}.bias", None)
            if cb is not None:
                br["conv1d_bias"] = np.asarray(cb)
            mixer[f"scan_b{j}"] = br
        blk["mixer"] = mixer

        if f"{pre}.msa.to_q.weight" in sd:
            msa: dict = {}
            for name in ("to_q", "to_k", "to_v"):
                _linear(msa, name, sd, f"{pre}.msa.{name}")
            _linear(msa, "to_out", sd, f"{pre}.msa.to_out.0")
            blk["msa"] = msa
        p[f"blocks_{i}"] = blk

    if scan_layers and block_ids:
        blocks = [p.pop(f"blocks_{i}") for i in block_ids]
        p["blocks"] = jax_tree_stack(blocks)

    p["norm_f_weight"] = np.asarray(sd.pop("norm_f.weight"))
    nfb = sd.pop("norm_f.bias", None)
    if nfb is not None:
        p["norm_f_bias"] = np.asarray(nfb)

    p["final_layer"] = {}
    _linear(p["final_layer"], "linear", sd, "final_layer.linear")
    if "final_layer.adaLN_modulation.1.weight" in sd:
        _linear(p["final_layer"], "adaLN", sd,
                "final_layer.adaLN_modulation.1")

    leftovers = [k for k in sd
                 if not k.endswith("num_batches_tracked")
                 and "y_embedding" not in k]
    if leftovers and strict:
        raise ValueError(f"unconverted reference keys: {leftovers[:10]}"
                         f"{'...' if len(leftovers) > 10 else ''}")
    return {"params": p}


def load_torch_checkpoint(path: str, which: str = "ema") -> dict:
    """Load a reference .pt checkpoint (CPU torch) and return the raw state
    dict for ``which`` in {'ema', 'model'} (train_acc.py:492-505 layout)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and which in ckpt:
        return ckpt[which]
    return ckpt  # bare state dict


def convert_reference_checkpoint(path: str, which: str = "ema",
                                 strict: bool = True,
                                 scan_layers: bool = False) -> dict:
    """One-call conversion: .pt path -> flax params tree."""
    return convert_state_dict(load_torch_checkpoint(path, which),
                              strict=strict, scan_layers=scan_layers)
