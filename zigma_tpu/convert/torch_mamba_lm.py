"""Converter for pretrained Mamba LM checkpoints (state-spaces/mamba-*).

Parity with the reference's HF loading path
(reference: dis_mamba/mamba_ssm/utils/hf.py, mixer_seq_simple.py:229-253
``MambaLMHeadModel.from_pretrained``).  Maps the torch state dict of the
official ``MambaLMHeadModel`` onto zigma_tpu.models.lm's flax tree.

Torch key layout (mixer_seq_simple.py):
  backbone.embedding.weight
  backbone.layers.{i}.norm.weight
  backbone.layers.{i}.mixer.{in_proj,out_proj}.weight
  backbone.layers.{i}.mixer.{conv1d.weight,conv1d.bias,x_proj.weight,
                             dt_proj.weight,dt_proj.bias,A_log,D}
  backbone.norm_f.weight
  lm_head.weight (tied to the embedding)
"""

from __future__ import annotations

import re

import numpy as np

from zigma_tpu.convert.torch_zigma import _strip_module, _t, _to_np

__all__ = ["convert_mamba_lm_state_dict", "load_hf_mamba_lm"]


def convert_mamba_lm_state_dict(sd: dict, strict: bool = True) -> dict:
    sd = {k: _to_np(v) for k, v in _strip_module(sd).items()}
    p: dict = {"backbone": {}}
    bb = p["backbone"]
    bb["embedding"] = {"embedding": np.asarray(sd.pop("backbone.embedding.weight"))}

    layer_ids = sorted({int(m.group(1)) for k in sd
                        for m in [re.match(r"backbone\.layers\.(\d+)\.", k)]
                        if m})
    for i in layer_ids:
        pre = f"backbone.layers.{i}"
        layer = {"norm_weight": np.asarray(sd.pop(f"{pre}.norm.weight"))}
        nb = sd.pop(f"{pre}.norm.bias", None)
        if nb is not None:
            layer["norm_bias"] = np.asarray(nb)
        mixer = {
            "in_proj": {"kernel": _t(sd.pop(f"{pre}.mixer.in_proj.weight"))},
            "out_proj": {"kernel": _t(sd.pop(f"{pre}.mixer.out_proj.weight"))},
            "scan": {
                "A_log": np.asarray(sd.pop(f"{pre}.mixer.A_log")),
                "D": np.asarray(sd.pop(f"{pre}.mixer.D")),
                "conv1d_weight": np.asarray(
                    sd.pop(f"{pre}.mixer.conv1d.weight")).squeeze(1),
                "x_proj_kernel": _t(sd.pop(f"{pre}.mixer.x_proj.weight")),
                "dt_proj_kernel": _t(sd.pop(f"{pre}.mixer.dt_proj.weight")),
                "dt_proj_bias": np.asarray(sd.pop(f"{pre}.mixer.dt_proj.bias")),
            },
        }
        conv_b = sd.pop(f"{pre}.mixer.conv1d.bias", None)
        if conv_b is not None:
            mixer["scan"]["conv1d_bias"] = np.asarray(conv_b)
        for proj in ("in_proj", "out_proj"):
            b = sd.pop(f"{pre}.mixer.{proj}.bias", None)
            if b is not None:
                mixer[proj]["bias"] = np.asarray(b)
        layer["mixer"] = mixer
        bb[f"layers_{i}"] = layer

    bb["norm_f_weight"] = np.asarray(sd.pop("backbone.norm_f.weight"))
    nfb = sd.pop("backbone.norm_f.bias", None)
    if nfb is not None:
        bb["norm_f_bias"] = np.asarray(nfb)
    sd.pop("lm_head.weight", None)  # tied to the embedding

    if sd and strict:
        raise ValueError(f"unconverted LM keys: {sorted(sd)[:10]}")
    return {"params": p}


def load_hf_mamba_lm(model_name_or_path: str) -> tuple[dict, dict]:
    """(config_dict, flax params) from a local HF cache or directory —
    the reference's load_config_hf/load_state_dict_hf pair (utils/hf.py)."""
    import json
    import os

    import torch

    if os.path.isdir(model_name_or_path):
        cfg_path = os.path.join(model_name_or_path, "config.json")
        bin_path = os.path.join(model_name_or_path, "pytorch_model.bin")
        with open(cfg_path) as f:
            config = json.load(f)
        sd = torch.load(bin_path, map_location="cpu", weights_only=False)
    else:
        from transformers.utils import cached_file

        config_file = cached_file(model_name_or_path, "config.json",
                                  local_files_only=True)
        with open(config_file) as f:
            config = json.load(f)
        bin_file = cached_file(model_name_or_path, "pytorch_model.bin",
                               local_files_only=True)
        sd = torch.load(bin_file, map_location="cpu", weights_only=False)
    return config, convert_mamba_lm_state_dict(sd)
