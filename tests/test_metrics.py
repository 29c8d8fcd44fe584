"""Metric-math tests with analytically known answers.

The reference only smoke-tests its metric facade on random uint8 images
(my_metrics.py:118-129); these check the statistics themselves.
"""

import numpy as np
import pytest

from zigma_tpu.metrics import (
    MyMetric,
    RunningMoments,
    frechet_distance,
    inception_score,
    kid,
    patch_statistics_extractor,
    prdc,
    psnr,
    ssim,
    video_metric_per_timestep,
)


class TestFrechet:
    def test_zero_distance_same_distribution(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2000, 8))
        m1, m2 = RunningMoments(8), RunningMoments(8)
        m1.update(x)
        m2.update(x)
        fd = frechet_distance(*m1.finalize(), *m2.finalize())
        assert abs(fd) < 1e-6

    def test_known_gaussian_distance(self):
        """For N(0,I) vs N(mu,I): FD = ||mu||^2."""
        rng = np.random.default_rng(1)
        x = rng.normal(size=(200_00, 4))
        y = x + np.array([1.0, 0, 0, 0])
        m1, m2 = RunningMoments(4), RunningMoments(4)
        m1.update(x)
        m2.update(y)
        fd = frechet_distance(*m1.finalize(), *m2.finalize())
        assert abs(fd - 1.0) < 0.05

    def test_streaming_equals_batch(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(100, 6))
        m1, m2 = RunningMoments(6), RunningMoments(6)
        m1.update(x)
        for chunk in np.array_split(x, 7):
            m2.update(chunk)
        mu1, c1 = m1.finalize()
        mu2, c2 = m2.finalize()
        np.testing.assert_allclose(mu1, mu2, atol=1e-12)
        np.testing.assert_allclose(c1, c2, atol=1e-10)

    def test_merge(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(100, 3))
        whole = RunningMoments(3)
        whole.update(x)
        a, b = RunningMoments(3), RunningMoments(3)
        a.update(x[:40])
        b.update(x[40:])
        a.merge(b)
        np.testing.assert_allclose(a.finalize()[1], whole.finalize()[1],
                                   atol=1e-10)


class TestDistributional:
    def test_kid_zero_for_identical(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(500, 16))
        m, s = kid(x, x, subsets=10, subset_size=100)
        # unbiased MMD over random subsets of the same set: ~0 with noise
        assert abs(m) < 0.05

    def test_kid_positive_for_shifted(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(500, 16))
        y = x + 2.0
        m, _ = kid(x, y, subsets=10, subset_size=100)
        assert m > 1.0

    def test_inception_score_uniform_is_one(self):
        logits = np.zeros((100, 10))
        m, _ = inception_score(logits)
        assert abs(m - 1.0) < 1e-6

    def test_inception_score_confident_classifier(self):
        # perfectly confident, uniform over classes -> IS = n_classes
        n, c = 1000, 10
        logits = np.full((n, c), -50.0)
        logits[np.arange(n), np.arange(n) % c] = 50.0
        m, _ = inception_score(logits, splits=1)
        assert abs(m - c) < 0.2

    def test_prdc_identical(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(200, 8))
        out = prdc(x, x, nearest_k=5)
        assert out["precision"] == 1.0
        assert out["recall"] == 1.0
        assert out["coverage"] == 1.0

    def test_prdc_disjoint(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(200, 8))
        y = x + 100.0
        out = prdc(x, y, nearest_k=5)
        assert out["precision"] == 0.0
        assert out["recall"] == 0.0


class TestPixel:
    def test_psnr_identical_inf(self):
        img = np.random.rand(3, 16, 16)
        assert psnr(img, img) == float("inf")

    def test_psnr_known(self):
        a = np.zeros((8, 8))
        b = np.full((8, 8), 0.1)
        assert abs(psnr(a, b) - 20.0) < 1e-6  # mse=0.01 -> 20 dB

    def test_ssim_identical_one(self):
        img = np.random.rand(3, 32, 32)
        assert abs(ssim(img, img) - 1.0) < 1e-9

    def test_ssim_noise_less_than_one(self):
        rng = np.random.default_rng(0)
        a = rng.random((3, 32, 32))
        b = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1)
        assert ssim(a, b) < 0.9

    def test_video_per_timestep(self):
        v1 = np.random.rand(2, 3, 1, 16, 16)
        v2 = v1.copy()
        out = video_metric_per_timestep(v1, v2, ssim)
        assert set(out["value"]) == {0, 1, 2}
        assert out["mean"] == pytest.approx(1.0)


class TestFacade:
    def test_fid_pipeline(self):
        rng = np.random.default_rng(0)
        extractor = patch_statistics_extractor(patch=4)
        m = MyMetric(choices=["fid", "kid", "prdc"], extractor=extractor,
                     kid_subset_size=20)
        real = rng.random((64, 3, 16, 16))
        fake_same = real + rng.normal(0, 0.01, real.shape)
        m.update_real(real)
        m.update_fake(fake_same)
        close = m.compute(sync=False)
        m.reset()
        m.update_real(real)
        m.update_fake(rng.random((64, 3, 16, 16)) * 0.2 + 0.8)
        far = m.compute(sync=False)
        assert close["fid"] < far["fid"]
        assert close["kid"] < far["kid"]
        assert set(far) >= {"fid", "kid", "kid_std", "precision", "recall",
                            "density", "coverage"}

    def test_fid_and_sfid_use_distinct_feature_streams(self):
        """fid/sfid/fdd must each run their own feature net — the reference
        keeps separate torchmetrics per choice (my_metrics.py:24-57); a
        shared accumulator would report the identical number for all."""
        from zigma_tpu.metrics import features

        saved = dict(features._REGISTRY)
        try:
            features.register_extractor(
                "inception", patch_statistics_extractor(patch=4))
            features.register_extractor(
                "inception_sfid", patch_statistics_extractor(patch=8))
            rng = np.random.default_rng(3)
            m = MyMetric(choices=["fid", "sfid"])
            assert m._stream_of["fid"] != m._stream_of["sfid"]
            m.update_real(rng.random((32, 3, 16, 16)))
            m.update_fake(rng.random((32, 3, 16, 16)) * 0.5)
            out = m.compute(sync=False)
            assert out["fid"] != out["sfid"]
        finally:
            features._REGISTRY.clear()
            features._REGISTRY.update(saved)

    def test_explicit_extractor_overrides_all_streams(self):
        rng = np.random.default_rng(4)
        m = MyMetric(choices=["fid", "sfid"],
                     extractor=patch_statistics_extractor(patch=4))
        m.update_real(rng.random((16, 3, 16, 16)))
        m.update_fake(rng.random((16, 3, 16, 16)))
        out = m.compute(sync=False)
        assert out["fid"] == out["sfid"]  # single custom stream, by request

    def test_unknown_choice_raises(self):
        with pytest.raises(ValueError):
            MyMetric(choices=["bogus"],
                     extractor=patch_statistics_extractor())

    def test_missing_extractor_raises(self):
        from zigma_tpu.metrics.features import get_extractor

        with pytest.raises(RuntimeError):
            get_extractor("inception_not_cached_anywhere")


class TestUint8Contract:
    def test_to_uint8_images_reference_formula(self):
        """clamp(127.5*x + 128, 0, 255) -> uint8 (train_acc.py:45)."""
        from zigma_tpu.metrics import to_uint8_images

        x = np.array([-2.0, -1.0, 0.0, 1.0, 2.0], np.float32)
        out = to_uint8_images(x)
        assert out.dtype == np.uint8
        np.testing.assert_array_equal(out, [0, 0, 128, 255, 255])

    def test_roundtrip_range(self):
        from zigma_tpu.metrics import to_uint8_images

        rng = np.random.default_rng(0)
        imgs = rng.uniform(-1, 1, (2, 3, 8, 8)).astype(np.float32)
        out = to_uint8_images(imgs)
        # uint8 encode of [-1,1] pixels inverts to within quantization
        back = (out.astype(np.float32) - 128.0) / 127.5
        np.testing.assert_allclose(back, imgs, atol=1 / 127.5 + 1e-6)
