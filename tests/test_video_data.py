"""Video transform / feature-prep dataset tests (reference had none)."""

import csv
import random

import numpy as np
import pytest
from PIL import Image

from zigma_tpu.data import (
    FeaturePrepDataset,
    TemporalRandomCrop,
    UCFCenterCropVideo,
    center_crop_arr,
    get_transforms_image,
    get_transforms_video,
)
from zigma_tpu.data.video import (
    CenterCropResizeVideo,
    center_crop_video,
    hflip_video,
    normalize_video,
    resize_scale_video,
)


def _clip(T=4, C=3, H=64, W=48):
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (T, C, H, W), dtype=np.uint8)


class TestTransforms:
    def test_ucf_center_crop(self):
        out = UCFCenterCropVideo(32)(_clip().astype(np.float32))
        assert out.shape == (4, 3, 32, 32)

    def test_center_crop_resize(self):
        out = CenterCropResizeVideo(24)(_clip().astype(np.float32))
        assert out.shape == (4, 3, 24, 24)

    def test_resize_scale_short_side(self):
        out = resize_scale_video(_clip().astype(np.float32), (32, 32))
        assert min(out.shape[-2:]) == 32

    def test_center_crop_too_small_raises(self):
        with pytest.raises(ValueError):
            center_crop_video(_clip().astype(np.float32), 128)

    def test_hflip(self):
        c = _clip().astype(np.float32)
        np.testing.assert_array_equal(hflip_video(hflip_video(c)), c)

    def test_normalize_range(self):
        c = _clip().astype(np.float32) / 255.0
        out = normalize_video(c, [0.5] * 3, [0.5] * 3)
        assert out.min() >= -1.0 and out.max() <= 1.0

    def test_full_video_pipeline(self):
        out = get_transforms_video(32)(_clip())
        assert out.shape == (4, 3, 32, 32)
        assert -1.01 <= out.min() and out.max() <= 1.01

    def test_image_pipeline(self):
        img = Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (80, 60, 3),
                                              dtype=np.uint8))
        out = get_transforms_image(32)(img)
        assert out.shape == (3, 32, 32)

    def test_center_crop_arr(self):
        img = Image.fromarray(np.zeros((200, 150, 3), dtype=np.uint8))
        out = center_crop_arr(img, 64)
        assert out.shape == (64, 64, 3)

    def test_temporal_random_crop(self):
        tc = TemporalRandomCrop(8, rng=random.Random(0))
        begin, end = tc(100)
        assert end - begin == 8
        begin, end = tc(5)
        assert begin == 0 and end == 5


class TestFeaturePrep:
    def test_dataset(self, tmp_path):
        csv_path = tmp_path / "videos.csv"
        with open(csv_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["vid0.mp4", "a cat", "3"])
            w.writerow(["vid1.mp4", "a dog", "7"])

        def read_video(path):
            rng = np.random.default_rng(hash(path) % 2**31)
            return rng.integers(0, 255, (24, 3, 64, 64), dtype=np.uint8)

        def encode(frames):  # fake VAE: 8x downsample by mean-pool
            T, C, H, W = frames.shape
            return frames.reshape(T, C, H // 8, 8, W // 8, 8).mean((3, 5))[:, :1].repeat(4, 1)

        ds = FeaturePrepDataset(str(csv_path), read_video, encode,
                                num_frames=8,
                                transform=get_transforms_video(64))
        assert len(ds) == 2
        item = ds[0]
        assert item["video"].shape == (8, 3, 64, 64)
        assert item["frame_feature256"].shape == (8, 4, 8, 8)
        assert item["text"] == "a cat"
        assert item["cls_id"] == 3
