"""End-to-end CLI tests: config composition, tiny training run, sampling.

The reference has no driver tests at all; these run the real
``zigma_tpu.cli.train`` / ``sample`` mains on a tiny synthetic config.
"""

import json
import os

import jax
import numpy as np
import pytest

from zigma_tpu.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")

TINY = [
    "data=synthetic",
    "data.batch_size=8",
    "data.train_steps=4",
    "model.params.embed_dim=32",
    "model.params.depth=2",
    "model.params.img_dim=8",
    "model.params.patch_size=2",
    "model.params.scan_type=zigzagN2",
    "mixed_precision=fp32",
    "log_every=2",
    "ckpt_every=1000000",
    "sample_every=1000000",
]


class TestConfig:
    def test_compose_defaults(self):
        cfg = load_config(CONFIG_DIR)
        assert cfg.model.params.embed_dim == 768
        assert cfg.data.name == "churches256_uncond"
        assert cfg.optim.lr == pytest.approx(1e-4)
        assert cfg.ode.sampling_method == "dopri5"

    def test_group_override(self):
        cfg = load_config(CONFIG_DIR, overrides=["data=ucf101"])
        assert cfg.data.name == "ucf101"
        assert cfg.data.video_frames == 16

    def test_value_override(self):
        cfg = load_config(
            CONFIG_DIR,
            overrides=["optim.lr=3e-4", "model.params.depth=2",
                       "data.batch_size=7"])
        assert cfg.optim.lr == pytest.approx(3e-4)
        assert cfg.model.params.depth == 2
        assert cfg.data.batch_size == 7

    def test_every_model_and_data_config_parses(self):
        for group, names in (
            ("model", ["zigzag8_b1_pe2", "sweep2_b1_pe2", "s1024_zigzag8_b2",
                       "3d_zigzag8sst_b2"]),
            ("data", ["churches256", "celebamm256", "celebamm256_uncond",
                      "coco", "facehq_1024", "ucf101", "synthetic"]),
        ):
            for n in names:
                cfg = load_config(CONFIG_DIR, overrides=[f"{group}={n}"])
                assert cfg[group].get("name"), (group, n)


class TestTrainCLI:
    def test_tiny_train_run(self, tmp_path):
        from zigma_tpu.cli.train import main

        out = str(tmp_path / "out")
        state = main(TINY + [f"results_dir={out}"])
        assert int(jax.device_get(state.step)) == 4
        run_dirs = os.listdir(out)
        assert len(run_dirs) == 1
        metrics_path = os.path.join(out, run_dirs[0], "metrics.jsonl")
        recs = [json.loads(l) for l in open(metrics_path)]
        assert any("loss" in r for r in recs)
        assert all(np.isfinite(r["loss"]) for r in recs if "loss" in r)

    def test_resume_from_checkpoint(self, tmp_path):
        from zigma_tpu.cli.train import main

        out = str(tmp_path / "out")
        args = TINY + [f"results_dir={out}"]
        main(args)  # saves the final checkpoint at step 4
        state = main([a if not a.startswith("data.train_steps")
                      else "data.train_steps=6" for a in args])
        assert int(jax.device_get(state.step)) == 6

    def test_class_conditional_train(self, tmp_path):
        from zigma_tpu.cli.train import main

        out = str(tmp_path / "out")
        state = main(TINY + [f"results_dir={out}", "data.num_classes=5",
                             "data.train_steps=2"])
        assert int(jax.device_get(state.step)) == 2

    @staticmethod
    def _write_shard(path, members_per_key):
        import io
        import tarfile

        with tarfile.open(path, "w") as tar:
            for key, members in members_per_key:
                for ext, data in members.items():
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    tar.addfile(info, io.BytesIO(data))

    def test_image_cls_id_shard_train(self, tmp_path):
        """Class-conditional IMAGE shards (cls_id members) through the real
        wds pipeline + train main."""
        import io

        from zigma_tpu.cli.train import main

        shard_dir = tmp_path / "shards"
        shard_dir.mkdir()
        rng = np.random.default_rng(0)
        rows = []
        for i in range(16):
            buf = io.BytesIO()
            np.save(buf, rng.standard_normal((3, 8, 8)).astype(np.float32))
            rows.append((f"{i:03d}", {
                "img_feature8.npy": buf.getvalue(),
                "cls_id.cls": str(i % 5).encode()}))
        self._write_shard(str(shard_dir / "train-000000.tar"), rows)

        cfg_dir = tmp_path / "configs"
        import shutil

        shutil.copytree(CONFIG_DIR, cfg_dir)
        (cfg_dir / "data" / "tinycls.yaml").write_text(f"""name: tinycls
train_steps: 2
video_frames: 0
batch_size: 8
image_size: 8
num_classes: 5
sample_fid_n: 0
sample_fid_every: 1000000
sample_fid_bs: 2
tar_base: {shard_dir}
val_batch_size: 2
multinode: false
train:
  shards: 'train-000000.tar'
  rename:
    latent: img_feature8.npy
    cls_id: cls_id.cls
""")
        out = str(tmp_path / "out")
        state = main([f"--config-dir={cfg_dir}", "data=tinycls",
                      "model.params.in_channels=3",
                      "model.params.embed_dim=32", "model.params.depth=2",
                      "model.params.img_dim=8", "model.params.patch_size=2",
                      "model.params.scan_type=zigzagN2",
                      "model.params.class_dropout_prob=0.2",
                      "mixed_precision=fp32", "is_latent=false",
                      "log_every=2", "ckpt_every=1000000",
                      "sample_every=1000000", f"results_dir={out}"])
        assert int(jax.device_get(state.step)) == 2
        # the null-class row exists (class_dropout_prob > 0)
        table = state.params["params"]["y_embedder"]["embedding"]["embedding"]
        assert table.shape[0] == 6

    def test_video_temporal_window_crop(self, tmp_path):
        """Stored clips longer than the model window: the generator crops a
        random window (reference celebav family, train_acc.py:309-317)."""
        import io

        from zigma_tpu.cli.train import main

        shard_dir = tmp_path / "shards"
        shard_dir.mkdir()
        rng = np.random.default_rng(0)
        rows = []
        for i in range(8):
            buf = io.BytesIO()
            np.save(buf, rng.standard_normal(
                (7, 3, 8, 8)).astype(np.float32))  # 7 frames stored
            rows.append((f"{i:03d}", {"frame_feature256.npy": buf.getvalue()}))
        self._write_shard(str(shard_dir / "train-000000.tar"), rows)

        cfg_dir = tmp_path / "configs"
        import shutil

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
""")
        out = str(tmp_path / "out")
        state = main([f"--config-dir={cfg_dir}", "data=tinyvid",
                      "model.params.in_channels=3",
                      "model.params.embed_dim=32", "model.params.depth=2",
                      "model.params.img_dim=8", "model.params.patch_size=2",
                      "model.params.scan_type=zzvideo_st",
                      "mixed_precision=fp32", "is_latent=false",
                      "log_every=2", "ckpt_every=1000000",
                      "sample_every=1000000", f"results_dir={out}"])
        assert int(jax.device_get(state.step)) == 2


class TestSampleCLI:
    def test_load_params_returns_device_arrays(self, tmp_path):
        """orbax restores into a HOST numpy template; load_params must
        device_put once or every jitted generate call re-uploads the whole
        tree (measured 5x sampling slowdown on the TPU relay)."""
        from zigma_tpu.cli.sample import load_params
        from zigma_tpu.cli.train import build_model, main as train_main
        from zigma_tpu.config import load_config

        out = str(tmp_path / "out")
        train_main(TINY + [f"results_dir={out}", "data.train_steps=2"])
        run = os.listdir(out)[0]
        ckpt_dir = os.path.join(out, run, "checkpoints")
        ckpt = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1])

        cfg = load_config(CONFIG_DIR, "default", TINY + [f"ckpt={ckpt}"])
        params = load_params(cfg, build_model(cfg), (2, 4, 8, 8))
        leaves = jax.tree.leaves(params)
        assert leaves and all(isinstance(l, jax.Array) for l in leaves)

    def test_sample_from_trained_ckpt(self, tmp_path):
        from zigma_tpu.cli.train import main as train_main
        from zigma_tpu.cli.sample import main as sample_main

        out = str(tmp_path / "out")
        train_main(TINY + [f"results_dir={out}", "data.train_steps=2"])
        run = os.listdir(out)[0]
        ckpt_dir = os.path.join(out, run, "checkpoints")
        ckpt = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1])

        sample_dir = sample_main(TINY + [
            f"results_dir={out}", f"ckpt={ckpt}",
            f"sample_dir={tmp_path / 'samples'}",
            "sample_mode=ODE", "ode.sampling_method=euler",
            "ode.num_sampling_steps=5", "num_fid_samples=8",
            "offline_sample_local_bs=4",
        ])
        pngs = [f for f in os.listdir(sample_dir) if f.endswith(".png")]
        assert len(pngs) == 8

    def test_sample_sde(self, tmp_path):
        from zigma_tpu.cli.train import main as train_main
        from zigma_tpu.cli.sample import main as sample_main

        out = str(tmp_path / "out")
        train_main(TINY + [f"results_dir={out}", "data.train_steps=2"])
        run = os.listdir(out)[0]
        ckpt_dir = os.path.join(out, run, "checkpoints")
        ckpt = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1])
        sample_dir = sample_main(TINY + [
            f"results_dir={out}", f"ckpt={ckpt}",
            f"sample_dir={tmp_path / 'samples_sde'}",
            "sample_mode=SDE", "sde.num_sampling_steps=5",
            "num_fid_samples=4", "offline_sample_local_bs=4",
        ])
        pngs = [f for f in os.listdir(sample_dir) if f.endswith(".png")]
        assert len(pngs) == 4

    def test_sample_likelihood(self, tmp_path):
        from zigma_tpu.cli.train import main as train_main
        from zigma_tpu.cli.sample import main as sample_main

        out = str(tmp_path / "out")
        train_main(TINY + [f"results_dir={out}", "data.train_steps=2"])
        run = os.listdir(out)[0]
        ckpt_dir = os.path.join(out, run, "checkpoints")
        ckpt = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1])
        sample_dir = sample_main(TINY + [
            f"results_dir={out}", f"ckpt={ckpt}",
            f"sample_dir={tmp_path / 'samples_lik'}",
            "sample_mode=ODE", "likelihood=true",
            "ode.sampling_method=euler", "ode.num_sampling_steps=5",
            "num_fid_samples=4", "offline_sample_local_bs=4",
        ])
        assert len([f for f in os.listdir(sample_dir)
                    if f.endswith(".png")]) == 4


class TestConvertCLI:
    def test_convert_then_finetune(self, tmp_path):
        """Reference-shaped .pt -> zigma-convert -> fine-tune via train CLI."""
        torch = pytest.importorskip("torch")
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_convert import _torch_zigma_state_dict

        from zigma_tpu.cli.convert import main as convert_main
        from zigma_tpu.cli.train import main as train_main

        sd = _torch_zigma_state_dict(depth=2, embed_dim=64, in_ch=4,
                                     patch=2, n_patches=16)
        pt = str(tmp_path / "ref_0001000.pt")
        torch.save({"ema": sd, "model": sd, "train_steps": 1000}, pt)

        model_over = [
            "data=synthetic", "data.batch_size=8", "data.image_size=16",
            "model.params.in_channels=4", "model.params.embed_dim=64",
            "model.params.depth=2", "model.params.img_dim=8",
            "model.params.patch_size=2", "model.params.scan_type=zigzagN2",
            "model.params.use_pe=2", "mixed_precision=fp32",
        ]
        out_ckpt = convert_main(
            [f"--ckpt={pt}", f"--out={tmp_path / 'converted'}"] + model_over)
        assert os.path.isdir(out_ckpt)

        out = str(tmp_path / "out")
        state = train_main(model_over + [
            f"ckpt={out_ckpt}", f"results_dir={out}",
            "data.train_steps=2", "log_every=1",
            "ckpt_every=1000000", "sample_every=1000000"])
        assert int(jax.device_get(state.step)) == 2

    def test_convert_rejects_mismatched_model(self, tmp_path):
        torch = pytest.importorskip("torch")
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_convert import _torch_zigma_state_dict

        from zigma_tpu.cli.convert import main as convert_main

        sd = _torch_zigma_state_dict(depth=2, embed_dim=64, in_ch=4,
                                     patch=2, n_patches=16)
        pt = str(tmp_path / "ref.pt")
        torch.save({"ema": sd}, pt)
        with pytest.raises(SystemExit, match="mismatch"):
            convert_main([
                f"--ckpt={pt}", f"--out={tmp_path / 'converted'}",
                "data=synthetic",
                "model.params.in_channels=4", "model.params.embed_dim=128",
                "model.params.depth=2", "model.params.img_dim=8",
                "model.params.patch_size=2",
                "model.params.scan_type=zigzagN2"])


class TestServeCLI:
    def test_generate_endpoint(self, tmp_path):
        """Train tiny -> serve -> POST /generate -> decodable PNGs."""
        import base64
        import http.client
        import threading

        from http.server import ThreadingHTTPServer

        from zigma_tpu.cli.serve import GenerationWorker, make_handler
        from zigma_tpu.cli.train import main as train_main
        from zigma_tpu.config import load_config

        out = str(tmp_path / "out")
        train_main(TINY + [f"results_dir={out}", "data.train_steps=2"])
        run = os.listdir(out)[0]
        ckpt_dir = os.path.join(out, run, "checkpoints")
        ckpt = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1])

        cfg = load_config(CONFIG_DIR, "default", TINY + [
            f"ckpt={ckpt}", "sample_mode=ODE", "is_latent=false",
            "ode.sampling_method=euler", "ode.num_sampling_steps=3"])
        worker = GenerationWorker(cfg, max_batch=4)
        server = ThreadingHTTPServer(("127.0.0.1", 0),
                                     make_handler(worker, cfg))
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            conn.request("GET", "/healthz")
            health = json.loads(conn.getresponse().read())
            assert health["status"] == "ok"
            assert health["max_batch"] == 4

            conn.request("POST", "/generate", body=json.dumps(
                {"n": 2, "seed": 7}), headers={"Content-Type":
                                               "application/json"})
            resp = json.loads(conn.getresponse().read())
            assert len(resp["images"]) == 2
            from PIL import Image
            import io as _io

            img = Image.open(_io.BytesIO(
                base64.b64decode(resp["images"][0])))
            assert img.size == (8, 8)

            # same seed -> deterministic bytes; different seed -> different
            conn.request("POST", "/generate", body=json.dumps(
                {"n": 2, "seed": 7}), headers={"Content-Type":
                                               "application/json"})
            again = json.loads(conn.getresponse().read())
            assert again["images"] == resp["images"]
            conn.request("POST", "/generate", body=json.dumps(
                {"n": 2, "seed": 8}), headers={"Content-Type":
                                               "application/json"})
            other = json.loads(conn.getresponse().read())
            assert other["images"] != resp["images"]

            # oversize batch -> 400 with an explanation
            conn.request("POST", "/generate", body=json.dumps(
                {"n": 99}), headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            assert r.status == 400
            assert "n must be" in json.loads(r.read())["error"]
        finally:
            server.shutdown()

    def test_overload_503_and_timeout_abandons(self):
        """Backpressure unit test (no device work): a full queue rejects
        immediately with OverloadedError (HTTP 503), and a client timeout
        marks its request abandoned so the worker will skip it."""
        import queue as q

        from zigma_tpu.cli.serve import (GenerationWorker, OverloadedError,
                                         _Request)
        from zigma_tpu.config import load_config

        w = object.__new__(GenerationWorker)  # no compile: queue logic only
        w.max_batch = 4
        w.cfg = load_config(CONFIG_DIR, "default", TINY)
        w.queue = q.Queue(maxsize=1)
        w.queue.put(_Request(1, 0, None, 1.0))  # pre-filled -> full
        with pytest.raises(OverloadedError, match="queue full"):
            w.submit(n=1, seed=0)

        w.queue = q.Queue(maxsize=1)  # empty, but no worker thread running
        with pytest.raises(TimeoutError):
            w.submit(n=1, seed=0, timeout=0.05)
        req = w.queue.get_nowait()
        assert req.abandoned.is_set()
