"""End-to-end data prep: images -> shards -> training batches."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from zigma_tpu.cli.prepare_data import main as prep_main
from zigma_tpu.data import WebDatasetReader, list_shards


def _make_images(root, n=10, size=40):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        ).save(os.path.join(root, f"img_{i:03d}.png"))


class TestPrepareData:
    def test_images_to_shards_to_batches(self, tmp_path):
        img_dir = str(tmp_path / "imgs")
        out_dir = str(tmp_path / "wds")
        _make_images(img_dir, n=10)
        total = prep_main(["--images", img_dir, "--out", out_dir,
                           "--image-size", "32", "--shard-size", "4",
                           "--codec", "identity"])
        assert total == 10
        shards = sorted(os.listdir(out_dir))
        assert shards == [f"train-{i:06d}.tar" for i in range(3)]

        urls = list_shards(out_dir, "train-{000000..000002}.tar")
        reader = WebDatasetReader(
            urls, batch_size=4, repeat=False, prefetch=0,
            rename={"latent": "img_feature32.npy"})  # key follows --image-size
        batches = list(reader)
        assert len(batches) == 2  # partial=False drops the last 2
        assert batches[0]["latent"].shape == (4, 3, 32, 32)
        assert batches[0]["latent"].min() >= -1.01

    def test_captions(self, tmp_path):
        img_dir = str(tmp_path / "imgs")
        out_dir = str(tmp_path / "wds")
        _make_images(img_dir, n=4)
        caps = {f"img_{i:03d}.png": f"caption {i}" for i in range(4)}
        cap_path = str(tmp_path / "caps.json")
        json.dump(caps, open(cap_path, "w"))
        prep_main(["--images", img_dir, "--out", out_dir,
                   "--image-size", "32", "--shard-size", "10",
                   "--captions", cap_path])
        urls = list_shards(out_dir, "train-{000000..000000}.tar")
        reader = WebDatasetReader(urls, batch_size=4, repeat=False, prefetch=0)
        batch = next(iter(reader))
        assert batch["caption.txt"] == [f"caption {i}" for i in range(4)]
