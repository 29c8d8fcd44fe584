"""MetricLogger: JSONL stream + wandb mirror incl. media (VERDICT r3 L9).

The reference logs scalar dicts, image grids, and ``wandb.Video`` grids
(train_acc.py:465-490,608-631).  Our primary artifacts are the JSONL
stream and on-disk PNG/GIF files; when wandb is enabled the same records
and media mirror into it.  wandb itself is absent in this environment, so
these tests inject a recording fake.
"""

import json
import sys
import types

import numpy as np
import pytest


class _FakeWandb(types.ModuleType):
    def __init__(self):
        super().__init__("wandb")
        self.logged = []
        self.inited = None

    def init(self, **kw):
        self.inited = kw

    def log(self, payload, step=None):
        self.logged.append((step, payload))

    class Image:
        def __init__(self, path):
            self.path = path

    class Video:
        def __init__(self, path):
            self.path = path


@pytest.fixture
def fake_wandb(monkeypatch):
    mod = _FakeWandb()
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


class TestMetricLogger:
    def test_jsonl_always_written(self, tmp_path):
        from zigma_tpu.utils.logging_utils import MetricLogger

        mlog = MetricLogger(str(tmp_path))
        mlog.log(1, loss=2.5)
        mlog.log(2, loss=np.float32(2.25))
        mlog.close()
        recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert [r["step"] for r in recs] == [1, 2]
        assert recs[1]["loss"] == 2.25

    def test_wandb_mirror_scalars_and_media(self, tmp_path, fake_wandb):
        from zigma_tpu.utils.logging_utils import (MetricLogger,
                                                   write_video_grid)
        from PIL import Image

        mlog = MetricLogger(str(tmp_path), use_wandb=True)
        assert fake_wandb.inited is not None
        mlog.log(3, loss=1.0)

        png = str(tmp_path / "vis.png")
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(png)
        mlog.log_media(3, png)

        gif = write_video_grid(
            np.zeros((2, 3, 3, 8, 8), np.float32), str(tmp_path / "v.gif"))
        mlog.log_media(4, gif, key="videos")
        mlog.close()

        assert fake_wandb.logged[0] == (3, {"loss": 1.0})
        step, payload = fake_wandb.logged[1]
        assert step == 3 and isinstance(payload["samples"], _FakeWandb.Image)
        step, payload = fake_wandb.logged[2]
        assert step == 4 and isinstance(payload["videos"], _FakeWandb.Video)
        assert payload["videos"].path == gif

    def test_media_noop_without_wandb(self, tmp_path):
        from zigma_tpu.utils.logging_utils import MetricLogger

        mlog = MetricLogger(str(tmp_path))
        mlog.log_media(1, str(tmp_path / "nonexistent.png"))  # must not raise
        mlog.close()
