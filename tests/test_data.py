"""Data-pipeline tests: tar shards written on the fly, then read back.

The reference only has `if True/False` script blocks (wds_dataloader.py:192+);
these are real round-trip tests.
"""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from zigma_tpu.data import (
    WebDataModuleFromConfig,
    WebDatasetReader,
    brace_expand,
    dict_collation_fn,
    make_image_transform,
    split_by_host,
    tar_samples,
)


def _write_shard(path, n, start=0, with_caption=False):
    with tarfile.open(path, "w") as tf:
        for i in range(start, start + n):
            key = f"{i:06d}"

            def add(name, data):
                info = tarfile.TarInfo(f"{key}.{name}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))

            latent = np.random.default_rng(i).normal(
                size=(4, 8, 8)).astype(np.float32)
            buf = io.BytesIO()
            np.save(buf, latent)
            add("latent.npy", buf.getvalue())
            add("cls_id.cls", str(i % 10).encode())
            if with_caption:
                add("caption.txt", f"caption {i}".encode())


class TestPrimitives:
    def test_brace_expand(self):
        urls = brace_expand("shard-{00000..00003}.tar")
        assert urls == [f"shard-{i:05d}.tar" for i in range(4)]

    def test_split_by_host(self):
        urls = [f"s{i}" for i in range(10)]
        a = split_by_host(urls, 0, 3)
        b = split_by_host(urls, 1, 3)
        c = split_by_host(urls, 2, 3)
        assert sorted(a + b + c) == sorted(urls)
        assert not (set(a) & set(b))

    def test_tar_samples_grouping(self, tmp_path):
        shard = str(tmp_path / "s.tar")
        _write_shard(shard, 3, with_caption=True)
        samples = list(tar_samples(shard))
        assert len(samples) == 3
        assert {"__key__", "latent.npy", "cls_id.cls", "caption.txt"} <= set(
            samples[0].keys())

    def test_collation(self):
        samples = [
            {"x": np.ones((2, 2)), "y": 1, "s": "a"},
            {"x": np.zeros((2, 2)), "y": 2, "s": "b"},
        ]
        batch = dict_collation_fn(samples)
        assert batch["x"].shape == (2, 2, 2)
        assert batch["y"].tolist() == [1, 2]
        assert batch["s"] == ["a", "b"]

    def test_image_transform(self):
        img = np.random.rand(16, 16, 3).astype(np.float32)
        out = make_image_transform(8)(img)
        assert out.shape == (3, 8, 8)
        assert out.min() >= -1.0 and out.max() <= 1.0


class TestReader:
    def test_reads_batches(self, tmp_path):
        shard = str(tmp_path / "s.tar")
        _write_shard(shard, 10)
        reader = WebDatasetReader([shard], batch_size=4, repeat=False,
                                  prefetch=0)
        batches = list(reader)
        # partial=False drops the trailing 2 samples
        assert len(batches) == 2
        assert batches[0]["latent.npy"].shape == (4, 4, 8, 8)
        assert batches[0]["cls_id.cls"].shape == (4,)

    def test_rename_and_transform(self, tmp_path):
        shard = str(tmp_path / "s.tar")
        _write_shard(shard, 4)
        reader = WebDatasetReader(
            [shard], batch_size=2, repeat=False, prefetch=0,
            transforms={"latent.npy": lambda x: x * 2},
            rename={"latent": "latent.npy", "cls_id": "cls_id.cls"})
        batch = next(iter(reader))
        assert set(batch.keys()) >= {"latent", "cls_id"}
        ref = np.load(io.BytesIO(_latent_bytes(0)))
        np.testing.assert_allclose(batch["latent"][0], ref * 2, rtol=1e-6)

    def test_shuffle_and_repeat(self, tmp_path):
        shard = str(tmp_path / "s.tar")
        _write_shard(shard, 6)
        reader = WebDatasetReader([shard], batch_size=6, shuffle=4,
                                  repeat=True, prefetch=0, seed=1)
        it = iter(reader)
        b1, b2 = next(it), next(it)  # needs repeat to get a 2nd full batch
        assert b1["latent.npy"].shape == (6, 4, 8, 8)
        assert b2["latent.npy"].shape == (6, 4, 8, 8)

    def test_prefetch_thread(self, tmp_path):
        shard = str(tmp_path / "s.tar")
        _write_shard(shard, 8)
        reader = WebDatasetReader([shard], batch_size=4, repeat=False,
                                  prefetch=2)
        assert len(list(reader)) == 2

    def test_module_from_config(self, tmp_path):
        for i in range(2):
            _write_shard(str(tmp_path / f"data-{i:05d}.tar"), 4, start=4 * i)
        dm = WebDataModuleFromConfig(
            tar_base=str(tmp_path), batch_size=4, image_size=8,
            multinode=False,
            train={"shards": "data-{00000..00001}.tar", "shuffle": 0,
                   "rename": {"latent": "latent.npy", "cls_id": "cls_id.cls"}})
        loader = dm.train_dataloader()
        batch = next(iter(loader))
        assert batch["latent"].shape == (4, 4, 8, 8)

    def test_val_loader_is_finite(self, tmp_path):
        """Eval passes need StopIteration; only the train stream repeats."""
        for i in range(2):
            _write_shard(str(tmp_path / f"data-{i:05d}.tar"), 4, start=4 * i)
        spec = {"shards": "data-{00000..00001}.tar", "shuffle": 0,
                "rename": {"latent": "latent.npy", "cls_id": "cls_id.cls"}}
        dm = WebDataModuleFromConfig(
            tar_base=str(tmp_path), batch_size=4, image_size=8,
            multinode=False, train=spec, validation=spec, val_batch_size=4)
        batches = list(dm.val_dataloader())
        assert len(batches) == 2  # 8 samples / bs 4, exactly one epoch
        it = iter(dm.train_dataloader())
        for _ in range(4):  # train repeats past one epoch
            next(it)

        # a finite eval pass must keep the partial tail batch
        dm3 = WebDataModuleFromConfig(
            tar_base=str(tmp_path), batch_size=4, image_size=8,
            multinode=False, train=spec, validation=spec, val_batch_size=3)
        sizes = [b["latent"].shape[0] for b in dm3.val_dataloader()]
        assert sizes == [3, 3, 2]  # 8 samples -> 3+3+2, nothing dropped


def _latent_bytes(i):
    latent = np.random.default_rng(i).normal(size=(4, 8, 8)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, latent)
    return buf.getvalue()


class TestResilience:
    def test_corrupt_shard_skipped(self, tmp_path):
        """warn_and_continue semantics (wds_dataloader.py:153-165): a corrupt
        shard is skipped with a warning, the stream continues."""
        good = str(tmp_path / "good.tar")
        _write_shard(good, 4)
        bad = str(tmp_path / "bad.tar")
        with open(bad, "wb") as f:
            f.write(b"this is not a tar file" * 100)
        reader = WebDatasetReader([bad, good], batch_size=4, repeat=False,
                                  prefetch=0)
        batches = list(reader)
        assert len(batches) == 1
        assert batches[0]["latent.npy"].shape[0] == 4

    def test_corrupt_sample_skipped(self, tmp_path):
        """A sample whose member fails to decode is dropped, not fatal."""
        import tarfile as tf

        shard = str(tmp_path / "s.tar")
        _write_shard(shard, 3)
        with tf.open(shard, "a") as t:
            info = tf.TarInfo("zzz.latent.npy")  # invalid npy payload
            data = b"not-an-npy"
            info.size = len(data)
            t.addfile(info, io.BytesIO(data))
        reader = WebDatasetReader([shard], batch_size=1, repeat=False,
                                  prefetch=0)
        batches = list(reader)
        assert len(batches) == 3  # corrupt 4th sample dropped

    def test_prefetch_propagates_errors(self, tmp_path):
        """A collation-level crash must surface through the prefetch thread,
        not silently end the stream (per-sample decode errors are warned and
        skipped; batch assembly errors are real failures)."""
        shard = str(tmp_path / "s.tar")
        _write_shard(shard, 4)
        state = {"i": 0}

        def alternating_shapes(a):  # breaks np.stack in collation
            state["i"] += 1
            return a[: 1 + state["i"] % 2]

        reader = WebDatasetReader([shard], batch_size=2, repeat=False,
                                  prefetch=2,
                                  transforms={"latent.npy": alternating_shapes})
        with pytest.raises(Exception):
            list(reader)


class TestRemoteShards:
    """Remote shard streaming: pipe:/http(s) URLs (the reference's wds
    stack passes shard URL specs straight to wds.WebDataset,
    datasets/wds_dataloader.py:138-160)."""

    @staticmethod
    def _serve(directory):
        import http.server
        import threading

        handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
            *a, directory=str(directory), **kw)
        httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        return httpd, f"http://127.0.0.1:{httpd.server_address[1]}"

    def test_pipe_streaming(self, tmp_path):
        shard = str(tmp_path / "s.tar")
        _write_shard(shard, 4)
        local = list(tar_samples(shard))
        piped = list(tar_samples(f"pipe:cat {shard}"))
        assert len(piped) == len(local) == 4
        np.testing.assert_array_equal(
            np.frombuffer(piped[0]["latent.npy"], np.uint8),
            np.frombuffer(local[0]["latent.npy"], np.uint8))

    def test_http_streaming(self, tmp_path):
        from zigma_tpu.data import list_shards

        for i in range(2):
            _write_shard(str(tmp_path / f"shard-{i:04d}.tar"), 3, start=3 * i)
        httpd, base = self._serve(tmp_path)
        try:
            urls = list_shards(base, "shard-{0000..0001}.tar")
            assert urls == [f"{base}/shard-{i:04d}.tar" for i in range(2)]
            reader = WebDatasetReader(urls, batch_size=3, repeat=False,
                                      rename={"latent": "latent.npy",
                                              "cls_id": "cls_id.cls"},
                                      prefetch=0)
            batches = list(reader)
            assert len(batches) == 2
            assert batches[0]["latent"].shape == (3, 4, 8, 8)
        finally:
            httpd.shutdown()

    def test_unreadable_remote_shard_warns_and_continues(self, tmp_path):
        _write_shard(str(tmp_path / "ok.tar"), 2)
        httpd, base = self._serve(tmp_path)
        try:
            # 404 shard skipped, good shard still read (warn_and_continue)
            samples = list(tar_samples(f"{base}/missing.tar"))
            assert samples == []
            assert len(list(tar_samples(f"{base}/ok.tar"))) == 2
        finally:
            httpd.shutdown()

    def test_pipe_failure_warns(self):
        assert list(tar_samples("pipe:false")) == []

    def test_pipe_early_close_is_clean(self, tmp_path):
        """Abandoning a pipe: stream mid-shard (train_steps hit mid-epoch)
        SIGPIPEs the still-writing child; that's a healthy early stop, not
        an error (rc -13 direct / 141 via shell)."""
        import warnings

        shard = str(tmp_path / "big.tar")
        _write_shard(shard, 64)
        gen = tar_samples(f"pipe:cat {shard}")
        next(gen)
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # a spurious warn would raise
            gen.close()  # GeneratorExit -> stream close while cat writes

    def test_train_from_http_urls(self, tmp_path):
        """End to end: the train CLI reads its shards over HTTP."""
        import io as _io
        import shutil

        from zigma_tpu.cli.train import main
        from tests.test_cli import CONFIG_DIR

        shard_dir = tmp_path / "shards"
        shard_dir.mkdir()
        rng = np.random.default_rng(0)
        with tarfile.open(str(shard_dir / "train-000000.tar"), "w") as tar:
            for i in range(16):
                buf = _io.BytesIO()
                np.save(buf, rng.standard_normal((3, 8, 8)).astype(np.float32))
                for name, data in [("img.npy", buf.getvalue()),
                                   ("cls_id.cls", str(i % 5).encode())]:
                    info = tarfile.TarInfo(f"{i:03d}.{name}")
                    info.size = len(data)
                    tar.addfile(info, _io.BytesIO(data))
        httpd, base = self._serve(shard_dir)
        cfg_dir = tmp_path / "configs"
        shutil.copytree(CONFIG_DIR, cfg_dir)
        (cfg_dir / "data" / "tinyhttp.yaml").write_text(f"""name: tinyhttp
train_steps: 2
video_frames: 0
batch_size: 8
image_size: 8
num_classes: 5
sample_fid_n: 0
sample_fid_every: 1000000
tar_base: {base}
multinode: false
train:
  shards: 'train-000000.tar'
  rename:
    latent: img.npy
    cls_id: cls_id.cls
""")
        try:
            state = main([f"--config-dir={cfg_dir}", "data=tinyhttp",
                          "model.params.in_channels=3",
                          "model.params.embed_dim=32", "model.params.depth=2",
                          "model.params.img_dim=8", "model.params.patch_size=2",
                          "model.params.scan_type=zigzagN2",
                          "model.params.class_dropout_prob=0.2",
                          "mixed_precision=fp32", "is_latent=false",
                          "log_every=2", "ckpt_every=1000000",
                          "sample_every=1000000",
                          f"results_dir={tmp_path / 'out'}"])
            import jax
            assert int(jax.device_get(state.step)) == 2
        finally:
            httpd.shutdown()
