"""instantiate_from_config + in-training FID eval path."""

import os

import jax
import numpy as np
import pytest

from zigma_tpu.utils.registry import get_obj_from_str, instantiate_from_config


class TestRegistry:
    def test_get_obj(self):
        cls = get_obj_from_str("zigma_tpu.models.zigma.ZigMa")
        from zigma_tpu.models import ZigMa

        assert cls is ZigMa

    def test_instantiate(self):
        model = instantiate_from_config({
            "target": "zigma_tpu.models.zigma.ZigMa",
            "params": {"in_channels": 4, "embed_dim": 32, "depth": 2,
                       "img_dim": 8, "patch_size": 2,
                       "scan_type": "zigzagN2"},
        })
        assert model.embed_dim == 32

    def test_missing_target_raises(self):
        with pytest.raises(KeyError):
            instantiate_from_config({"params": {}})


class TestFidOnTheFly:
    def test_train_with_fid_eval(self, tmp_path):
        """FID-on-the-fly with the weight-free extractor registered as the
        'inception' slot (smoke: the numbers are not comparable to real FID,
        only the plumbing is exercised)."""
        from zigma_tpu.metrics.features import (
            patch_statistics_extractor,
            register_extractor,
        )

        register_extractor("inception", patch_statistics_extractor(patch=2))
        from zigma_tpu.cli.train import main

        out = str(tmp_path / "out")
        state = main([
            "data=synthetic", "data.batch_size=8", "data.train_steps=2",
            "model.params.embed_dim=32", "model.params.depth=2",
            "model.params.img_dim=8", "model.params.patch_size=2",
            "model.params.scan_type=zigzagN2", "mixed_precision=fp32",
            "log_every=10", "ckpt_every=1000000", "sample_every=1000000",
            "data.sample_fid_every=2", "data.sample_fid_n=8",
            "data.sample_fid_bs=8", f"results_dir={out}",
        ])
        best = float(jax.device_get(state.best_fid))
        assert np.isfinite(best)  # eval ran and updated best_fid
