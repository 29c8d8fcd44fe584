"""Driver-wired evaluation menu (VERDICT r3 #1/#4/#5).

The reference trains with the FULL on-the-fly metric set
(train_acc.py:398-405) and evaluates video with FVD (sample_acc.py:82-90);
these tests pin that wiring end-to-end in our drivers: menu construction +
per-choice degradation (metrics/menu.py), 5-D eval batches through
fid_eval, fvd routed to VideoMetric in the sample CLI, video GIF
visualization artifacts, and the ode config group applying to in-training
sampling.
"""

import json
import os

import jax
import numpy as np
import pytest

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")

TINY_VIDEO = [
    "data=synthetic",
    "data.batch_size=8",
    "data.train_steps=2",
    "data.video_frames=3",
    "model.params.embed_dim=32",
    "model.params.depth=2",
    "model.params.img_dim=8",
    "model.params.patch_size=2",
    "model.params.scan_type=zzvideo_st",
    "mixed_precision=fp32",
    "log_every=2",
    "ckpt_every=1000000",
    "ode.sampling_method=euler",
    "ode.num_sampling_steps=4",
]


class TestBuildMetricSuite:
    def test_degraded_image_menu(self):
        """No cached weights: fid/kid/prdc survive on patch statistics,
        the net-defined choices drop with warnings."""
        from zigma_tpu.metrics import build_metric_suite

        s = build_metric_suite(video=False, in_pixels=True)
        assert s.choices == ["fid", "kid", "prdc"]
        assert set(s.dropped) == {"is", "sfid", "fdd"}
        rng = np.random.default_rng(0)
        s.update_real(rng.integers(0, 256, (8, 3, 16, 16), np.uint8))
        s.update_fake(rng.integers(0, 256, (8, 3, 16, 16), np.uint8))
        out = s.compute(sync=False)
        assert {"fid", "kid", "precision", "recall"} <= set(out)
        assert np.isfinite(out["fid"])

    def test_full_image_menu_with_registered_nets(self, monkeypatch):
        """Random-weight extractors registered under the canonical names:
        the reference's full image menu survives and computes every key."""
        from zigma_tpu.metrics import build_metric_suite
        from zigma_tpu.metrics import features

        rng = np.random.default_rng(1)
        stats = features.patch_statistics_extractor(4)
        monkeypatch.setitem(features._REGISTRY, "inception", stats)
        monkeypatch.setitem(features._REGISTRY, "inception_sfid",
                            features.patch_statistics_extractor(2))
        monkeypatch.setitem(features._REGISTRY, "dinov2",
                            features.patch_statistics_extractor(8))
        monkeypatch.setitem(
            features._REGISTRY, "inception_logits",
            lambda x: stats(x)[:, :10])
        s = build_metric_suite(video=False, in_pixels=True)
        assert s.choices == ["fid", "is", "kid", "prdc", "sfid", "fdd"]
        assert not s.dropped
        s.update_real(rng.integers(0, 256, (8, 3, 16, 16), np.uint8))
        s.update_fake(rng.integers(0, 256, (8, 3, 16, 16), np.uint8))
        out = s.compute(sync=False)
        assert {"fid", "is", "kid", "precision", "sfid", "fdd"} <= set(out)
        assert all(np.isfinite(v) for v in out.values())

    def test_video_menu_updates_both_containers(self):
        """(B, T, C, H, W) updates: image choices see folded frames, fvd
        sees (B, T, H, W, C) videos (the reference's my_metrics.py:58-69
        frame/video split)."""
        from zigma_tpu.metrics import build_metric_suite

        s = build_metric_suite(video=True, in_pixels=False)
        assert s.choices == ["fid", "fvd"]
        rng = np.random.default_rng(2)
        s.update_real(rng.normal(size=(4, 3, 4, 16, 16)))
        s.update_fake(rng.normal(size=(4, 3, 4, 16, 16)))
        out = s.compute(sync=False)
        assert np.isfinite(out["fid"]) and np.isfinite(out["fvd"])
        assert "fvd_patch_stats" in out  # degraded flavor is pinned

    def test_video_menu_with_registered_i3d(self, monkeypatch):
        """A registered (random-weight) styleganv I3D slot routes fvd to
        the canonical VideoMetric flavor."""
        from zigma_tpu.metrics import build_metric_suite
        from zigma_tpu.metrics import features

        def fake_i3d(videos):  # (B, T, H, W, C) -> (B, F)
            v = np.asarray(videos, np.float64)
            return v.mean(axis=(2, 3)).reshape(v.shape[0], -1)

        monkeypatch.setitem(features._REGISTRY, "i3d_styleganv", fake_i3d)
        monkeypatch.setitem(features._REGISTRY, "inception",
                            features.patch_statistics_extractor(4))
        s = build_metric_suite(video=True, in_pixels=True)
        assert s.video is not None and s.video.flavor == "styleganv"
        rng = np.random.default_rng(3)
        s.update_real(rng.integers(0, 256, (4, 3, 3, 16, 16), np.uint8))
        s.update_fake(rng.integers(0, 256, (4, 3, 3, 16, 16), np.uint8))
        out = s.compute(sync=False)
        assert "fvd_styleganv" in out and np.isfinite(out["fvd"])

    def test_fvd_on_image_run_raises(self):
        from zigma_tpu.metrics import build_metric_suite

        with pytest.raises(ValueError, match="video"):
            build_metric_suite(choices=["fvd"], video=False)

    def test_unknown_choice_raises(self):
        from zigma_tpu.metrics import build_metric_suite

        with pytest.raises(ValueError, match="unknown"):
            build_metric_suite(choices=["fid", "clipscore"], video=False)

    def test_video_patch_stats_sees_motion(self):
        """The weight-free video extractor must separate videos that agree
        frame-wise but differ temporally (static vs shuffled frames) —
        otherwise degraded FVD tracking is blind to motion."""
        from zigma_tpu.metrics import video_patch_statistics_extractor

        rng = np.random.default_rng(4)
        frame = rng.normal(size=(8, 8, 3))
        frames = np.stack([frame + 0.5 * rng.normal(size=frame.shape)
                           for _ in range(6)])
        static = np.stack([np.stack([frames[0]] * 6)] * 4)  # (4,6,8,8,3)
        moving = np.stack([frames] * 4)
        ex = video_patch_statistics_extractor(patch=4)
        f_static, f_moving = ex(static), ex(moving)
        assert f_static.shape == f_moving.shape
        # the temporal-delta half must differ strongly
        assert np.abs(f_static - f_moving).max() > 1e-3


class TestVideoGrid:
    def test_write_video_grid_roundtrip(self, tmp_path):
        from PIL import Image

        from zigma_tpu.utils.logging_utils import write_video_grid

        rng = np.random.default_rng(5)
        vids = rng.uniform(-1, 1, size=(4, 5, 3, 8, 8))
        path = write_video_grid(vids, str(tmp_path / "v.gif"))
        with Image.open(path) as im:
            assert im.format == "GIF"
            assert getattr(im, "n_frames", 1) == 5

    def test_non_video_raises(self, tmp_path):
        from zigma_tpu.utils.logging_utils import write_video_grid

        with pytest.raises(ValueError, match="B, T, C, H, W"):
            write_video_grid(np.zeros((2, 3, 8, 8)), str(tmp_path / "x.gif"))


class TestTrainDriverMenu:
    def test_video_train_full_menu_and_gif(self, tmp_path):
        """Video training with eval-on-the-fly: eval/fvd AND eval/fid land
        in metrics.jsonl (reference menu train_acc.py:398-405) and the vis
        artifact is an animated GIF with the right frame count."""
        from zigma_tpu.cli.train import main

        out = str(tmp_path / "out")
        state = main(TINY_VIDEO + [
            f"results_dir={out}", "sample_every=2",
            "data.sample_fid_every=2", "data.sample_fid_n=4",
            "data.sample_fid_bs=4",
        ])
        assert int(jax.device_get(state.step)) == 2
        run = os.listdir(out)[0]
        recs = [json.loads(l) for l in
                open(os.path.join(out, run, "metrics.jsonl"))]
        eval_recs = [r for r in recs if "eval/fvd" in r]
        assert eval_recs, f"no eval/fvd record in {recs}"
        assert np.isfinite(eval_recs[-1]["eval/fvd"])
        assert np.isfinite(eval_recs[-1]["eval/fid"])
        # animated vis artifact (VERDICT r3 #4)
        from PIL import Image

        gif = os.path.join(out, run, "vis", "0000002.gif")
        assert os.path.exists(gif)
        with Image.open(gif) as im:
            assert getattr(im, "n_frames", 1) == 3  # video_frames

    def test_image_train_menu_kid_prdc(self, tmp_path):
        """Image eval-on-the-fly now carries the kid/prdc rows of the
        reference menu (degraded to patch stats without weights)."""
        from zigma_tpu.cli.train import main

        out = str(tmp_path / "out")
        main([
            "data=synthetic", "data.batch_size=8", "data.train_steps=2",
            "model.params.embed_dim=32", "model.params.depth=2",
            "model.params.img_dim=8", "model.params.patch_size=2",
            "model.params.scan_type=zigzagN2", "mixed_precision=fp32",
            "log_every=2", "ckpt_every=1000000", "sample_every=1000000",
            "data.sample_fid_every=2", "data.sample_fid_n=8",
            "data.sample_fid_bs=8", f"results_dir={out}",
            "ode.sampling_method=euler", "ode.num_sampling_steps=4",
        ])
        run = os.listdir(out)[0]
        recs = [json.loads(l) for l in
                open(os.path.join(out, run, "metrics.jsonl"))]
        ev = [r for r in recs if "eval/fid" in r][-1]
        assert {"eval/fid", "eval/kid", "eval/precision",
                "eval/recall"} <= set(ev)

    def test_eval_metrics_config_override(self, tmp_path):
        """eval_metrics narrows the menu explicitly."""
        from zigma_tpu.cli.train import main

        out = str(tmp_path / "out")
        main([
            "data=synthetic", "data.batch_size=8", "data.train_steps=2",
            "model.params.embed_dim=32", "model.params.depth=2",
            "model.params.img_dim=8", "model.params.patch_size=2",
            "model.params.scan_type=zigzagN2", "mixed_precision=fp32",
            "log_every=2", "ckpt_every=1000000", "sample_every=1000000",
            "data.sample_fid_every=2", "data.sample_fid_n=8",
            "data.sample_fid_bs=8", f"results_dir={out}",
            "eval_metrics=[fid]",
            "ode.sampling_method=euler", "ode.num_sampling_steps=4",
        ])
        run = os.listdir(out)[0]
        recs = [json.loads(l) for l in
                open(os.path.join(out, run, "metrics.jsonl"))]
        ev = [r for r in recs if "eval/fid" in r][-1]
        assert "eval/kid" not in ev and "eval/precision" not in ev


class TestTrainOdeConfig:
    def test_ode_group_applies_to_in_training_sampler(self, tmp_path):
        """cfg.ode drives in-training vis/eval sampling (VERDICT r3 #5):
        the configured method-steps pair is logged, and a bogus method
        fails at sampler construction (proof the group is consumed)."""
        from zigma_tpu.cli.train import main

        out = str(tmp_path / "out")
        main(TINY_VIDEO + [f"results_dir={out}",
                           "ode.sampling_method=heun",
                           "ode.num_sampling_steps=6"])
        run = os.listdir(out)[0]
        log = open(os.path.join(out, run, "log.txt")).read()
        assert "in-training sampler: heun-6" in log

        with pytest.raises(NotImplementedError, match="bogus"):
            main(TINY_VIDEO + [f"results_dir={tmp_path / 'out2'}",
                               "ode.sampling_method=bogus"])


class TestSampleDriverVideo:
    def _train_video_ckpt(self, tmp_path):
        from zigma_tpu.cli.train import main as train_main

        out = str(tmp_path / "out")
        train_main(TINY_VIDEO + [f"results_dir={out}"])
        run = os.listdir(out)[0]
        ckpt_dir = os.path.join(out, run, "checkpoints")
        return os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1])

    def test_sample_video_fvd_and_gifs(self, tmp_path):
        """metrics=[fvd,fid] on a video config routes fvd into VideoMetric
        (the reference sample_acc.py:82-90 path; MyMetric alone raises) and
        writes per-sample GIFs alongside the .npy dumps."""
        from zigma_tpu.cli.sample import main as sample_main

        ckpt = self._train_video_ckpt(tmp_path)
        # synthetic has no validation split: metrics stay paired-empty
        # (no real batches), but the artifact contract still holds
        sample_dir = sample_main(TINY_VIDEO + [
            f"ckpt={ckpt}", f"sample_dir={tmp_path / 'samples'}",
            "sample_mode=ODE", "num_fid_samples=4",
            "offline_sample_local_bs=2", "metrics=[fvd,fid]",
        ])
        npys = [f for f in os.listdir(sample_dir) if f.endswith(".npy")]
        gifs = [f for f in os.listdir(sample_dir) if f.endswith(".gif")]
        assert len(npys) == 2 and len(gifs) == 4
        from PIL import Image

        with Image.open(os.path.join(sample_dir, sorted(gifs)[0])) as im:
            assert getattr(im, "n_frames", 1) == 3

    def test_sample_video_fvd_with_validation_metrics(self, tmp_path):
        """With a real validation split the suite computes fvd end-to-end
        and writes metrics.json."""
        import io
        import tarfile

        from zigma_tpu.cli.sample import main as sample_main
        from zigma_tpu.cli.train import main as train_main

        shard_dir = tmp_path / "shards"
        shard_dir.mkdir()
        rng = np.random.default_rng(0)

        def write_shard(path, n):
            with tarfile.open(path, "w") as tar:
                for i in range(n):
                    buf = io.BytesIO()
                    np.save(buf, rng.standard_normal(
                        (4, 3, 8, 8)).astype(np.float32))  # (T, C, H, W)
                    data = buf.getvalue()
                    info = tarfile.TarInfo(f"{i:03d}.frame_feature256.npy")
                    info.size = len(data)
                    tar.addfile(info, io.BytesIO(data))

        write_shard(str(shard_dir / "train-000000.tar"), 8)
        write_shard(str(shard_dir / "val-000000.tar"), 8)

        import shutil

        cfg_dir = tmp_path / "configs"
        shutil.copytree(CONFIG_DIR, cfg_dir)
        (cfg_dir / "data" / "tinyvid.yaml").write_text(f"""name: tinyvid
train_steps: 2
video_frames: 3
is_video: true
batch_size: 8
image_size: 8
num_classes: -1
sample_fid_n: 0
sample_fid_every: 1000000
sample_fid_bs: 2
tar_base: {shard_dir}
val_batch_size: 2
multinode: false
train:
  shards: 'train-000000.tar'
  rename:
    frame_feature256: frame_feature256.npy
validation:
  shards: 'val-000000.tar'
  rename:
    frame_feature256: frame_feature256.npy
""")
        common = [f"--config-dir={cfg_dir}", "data=tinyvid",
                  "model.params.in_channels=3",
                  "model.params.embed_dim=32", "model.params.depth=2",
                  "model.params.img_dim=8", "model.params.patch_size=2",
                  "model.params.scan_type=zzvideo_st",
                  "mixed_precision=fp32", "is_latent=false",
                  "log_every=2", "ckpt_every=1000000",
                  "sample_every=1000000",
                  "ode.sampling_method=euler", "ode.num_sampling_steps=4"]
        out = str(tmp_path / "out")
        train_main(common + [f"results_dir={out}"])
        run = os.listdir(out)[0]
        ckpt_dir = os.path.join(out, run, "checkpoints")
        ckpt = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1])

        sample_dir = sample_main(common + [
            f"ckpt={ckpt}", f"sample_dir={tmp_path / 'samples'}",
            "sample_mode=ODE", "num_fid_samples=4",
            "offline_sample_local_bs=2", "metrics=[fvd,fid]",
        ])
        scores = json.load(open(os.path.join(sample_dir, "metrics.json")))
        assert np.isfinite(scores["fvd"]) and np.isfinite(scores["fid"])
        assert "fvd_patch_stats" in scores  # degraded flavor pinned


class TestReviewFixesR4:
    """Round-4 self-review regressions: per-choice net gating, config-time
    eval_metrics validation, and frame-folded video decode."""

    def test_mixed_degradation_keeps_canonical_fdd(self, monkeypatch):
        """DINOv2 cached but Inception absent: the main fid stream degrades
        to patch statistics, yet fdd stays on its own canonical net instead
        of being dropped (or silently hijacked by the main override)."""
        from zigma_tpu.metrics import build_metric_suite
        from zigma_tpu.metrics import features

        dinov2 = features.patch_statistics_extractor(4)
        monkeypatch.setitem(features._REGISTRY, "dinov2", dinov2)
        s = build_metric_suite(choices=["fid", "fdd"], video=False,
                               in_pixels=True)
        assert s.choices == ["fid", "fdd"]
        assert not s.dropped
        # fdd rides its OWN stream with the registered net, not the
        # degraded main extractor
        assert s.image.extractors["fdd"] is dinov2
        assert s.image.extractors["main"] is not dinov2
        rng = np.random.default_rng(2)
        s.update_real(rng.integers(0, 256, (6, 3, 16, 16), np.uint8))
        s.update_fake(rng.integers(0, 256, (6, 3, 16, 16), np.uint8))
        out = s.compute(sync=False)
        assert np.isfinite(out["fdd"]) and np.isfinite(out["fid"])

    def test_validate_choices(self):
        from zigma_tpu.metrics.menu import (REFERENCE_IMAGE_MENU,
                                            validate_choices)

        assert validate_choices(None, video=False) == list(
            REFERENCE_IMAGE_MENU)
        with pytest.raises(ValueError, match="unknown"):
            validate_choices(["fid", "fdi"])
        with pytest.raises(ValueError, match="video"):
            validate_choices(["fvd"], video=False)

    def test_train_rejects_bad_eval_metrics_at_startup(self, tmp_path):
        """A typo'd eval_metrics fails at config time, not at the first
        eval boundary thousands of steps in."""
        from zigma_tpu.cli.train import main

        with pytest.raises(ValueError, match="unknown metric choices"):
            main([
                "data=synthetic", "data.batch_size=8",
                "data.train_steps=2", "model.params.embed_dim=32",
                "model.params.depth=2", "model.params.img_dim=8",
                "model.params.patch_size=2",
                "model.params.scan_type=zigzagN2", "mixed_precision=fp32",
                "data.sample_fid_every=1000", "data.sample_fid_n=8",
                f"results_dir={tmp_path / 'out'}",
                "eval_metrics=[fid,fdi]",
            ])

    def test_decode_maybe_video_folds_frames(self):
        """(B, T, C, H, W) latents reach the codec as 4-D frame batches
        and come back refolded (reference decodes video frame-wise,
        train_acc.py:345,365)."""
        from zigma_tpu.data import decode_maybe_video

        calls = []

        class Fake4DCodec:
            def decode(self, latents):
                assert latents.ndim == 4, latents.shape
                calls.append(latents.shape)
                return np.repeat(latents[:, :3] if latents.shape[1] >= 3
                                 else latents, 2, axis=-1)

        arr = np.random.default_rng(3).normal(
            size=(2, 5, 4, 8, 8)).astype(np.float32)
        out = decode_maybe_video(Fake4DCodec(), arr)
        assert calls == [(10, 4, 8, 8)]
        assert out.shape == (2, 5, 3, 8, 16)
        # 4-D passes straight through
        img = arr[:, 0]
        out4 = decode_maybe_video(Fake4DCodec(), img)
        assert out4.shape == (2, 3, 8, 16)
