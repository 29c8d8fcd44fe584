"""Scan-path parity: our generators vs the reference's utils_zigzag outputs."""

import sys

import numpy as np
import pytest

from zigma_tpu.ops import paths as zp

REFERENCE_UTILS = "/root/reference"


def _load_reference_zigzag():
    if REFERENCE_UTILS not in sys.path:
        sys.path.insert(0, REFERENCE_UTILS)
    try:
        from utils import utils_zigzag  # type: ignore

        return utils_zigzag
    except Exception:  # matplotlib or other deps missing
        return None


@pytest.mark.parametrize("N", [2, 4, 7, 16, 32])
def test_zigzag_paths_are_permutations(N):
    ps = zp.zigzag_path(N)
    assert len(ps) == 8
    for p in ps:
        assert sorted(p.tolist()) == list(range(N * N))


def test_zigzag_small_known():
    # first ordering is plain serpentine row-major from top-left
    p = zp.zigzag_path(2)[0]
    assert p.tolist() == [0, 1, 3, 2]


@pytest.mark.parametrize("N", [4, 16, 32])
def test_zigzag_matches_reference(N):
    ref = _load_reference_zigzag()
    if ref is None:
        pytest.skip("reference utils not importable")
    ours = zp.zigzag_path(N)
    theirs = ref.zigzag_path(N)
    assert len(ours) == len(theirs)
    for a, b in zip(ours, theirs):
        np.testing.assert_array_equal(a, np.asarray(b))


@pytest.mark.parametrize("N", [4, 8, 16, 32])
def test_hilbert_matches_reference(N):
    ref = _load_reference_zigzag()
    if ref is None:
        pytest.skip("reference utils not importable")
    ours = zp.hilbert_path(N)
    theirs = ref.hilbert_path(N)
    assert len(ours) == 8
    for a, b in zip(ours, theirs):
        np.testing.assert_array_equal(a, np.asarray(b))


@pytest.mark.parametrize("N", [3, 5, 12])
def test_hilbert_valid_for_non_pow2(N):
    for p in zp.hilbert_path(N):
        assert sorted(p.tolist()) == list(range(N * N))


def test_reverse_permutation():
    rng = np.random.default_rng(0)
    p = rng.permutation(37)
    r = zp.reverse_permutation(p)
    np.testing.assert_array_equal(p[r], np.arange(37))
    np.testing.assert_array_equal(r[p], np.arange(37))


def test_build_layer_paths_zigzag_cycling():
    paths, revs, st = zp.build_layer_paths("zigzagN8", depth=24, patch_side=8)
    assert st is None and len(paths) == 24
    base = zp.zigzag_path(8)
    for i in range(24):
        np.testing.assert_array_equal(paths[i], base[i % 8])
        np.testing.assert_array_equal(paths[i][revs[i]], np.arange(64))


def test_build_layer_paths_subset():
    paths, _, _ = zp.build_layer_paths("zigzagN2", depth=5, patch_side=4)
    base = zp.zigzag_path(4)
    np.testing.assert_array_equal(paths[2], base[0])
    np.testing.assert_array_equal(paths[3], base[1])


def test_build_layer_paths_video():
    depth, T = 6, 4
    paths, revs, st = zp.build_layer_paths(
        "zzvideo_sst", depth=depth, patch_side=4, video_frames=T
    )
    assert st == "sstsst"
    base = zp.zigzag_path(4)
    # spatial layers 0,1,3,4 use zigzag paths 0,1,2,3
    np.testing.assert_array_equal(paths[0], base[0])
    np.testing.assert_array_equal(paths[1], base[1])
    np.testing.assert_array_equal(paths[3], base[2])
    np.testing.assert_array_equal(paths[4], base[3])
    # temporal layers 2, 5: fwd then bwd, with the reference's quirky pairing
    np.testing.assert_array_equal(paths[2], np.arange(T))
    np.testing.assert_array_equal(revs[2], np.arange(T)[::-1])
    np.testing.assert_array_equal(paths[5], np.arange(T)[::-1])
    np.testing.assert_array_equal(revs[5], np.arange(T))


def test_random_paths_seeded():
    a = zp.random_paths(8, 3, seed=7)
    b = zp.random_paths(8, 3, seed=7)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
        assert sorted(x.tolist()) == list(range(64))
