"""Native (C++) RLE codec parity vs the pure-Python reference paths.

The native library is an optimization of fsgd_tpu/data/rle.py's loops
(reference parity target: pycocotools maskApi.c rleToString/rleFrString/
rleIou).  Every function must be bit-identical to the pure path.
"""

import numpy as np
import pytest

from fsgd_tpu.data import rle as R
from fsgd_tpu.native import load_rle


def _random_masks(n, h, w, seed):
    rng = np.random.RandomState(seed)
    masks = []
    for _ in range(n):
        m = np.zeros((h, w), np.uint8)
        for _ in range(rng.randint(1, 4)):
            y, x = rng.randint(0, h - 4), rng.randint(0, w - 4)
            bh, bw = rng.randint(2, h - y), rng.randint(2, w - x)
            m[y : y + bh, x : x + bw] = 1
        masks.append(m)
    return masks


def _pure(monkeypatch):
    monkeypatch.setattr(R, "_load_native_rle", lambda: None)


@pytest.fixture
def native_lib():
    lib = load_rle()
    if lib is None:
        pytest.skip("no native toolchain")
    return lib


def test_compress_parity(native_lib, monkeypatch):
    for seed in range(5):
        (mask,) = _random_masks(1, 37, 23, seed)
        counts = R._counts_from_mask(mask)
        fast = R._compress_counts(counts)
        _pure(monkeypatch)
        assert fast == R._compress_counts(counts)


def test_decompress_roundtrip_parity(native_lib, monkeypatch):
    for seed in range(5):
        (mask,) = _random_masks(1, 64, 41, seed + 10)
        enc = R.encode(mask)
        fast = R._decompress_counts(enc["counts"])
        _pure(monkeypatch)
        slow = R._decompress_counts(enc["counts"])
        assert fast == slow
        np.testing.assert_array_equal(R.decode(enc), mask)


def test_negative_delta_roundtrip(native_lib):
    # shrinking runs produce negative deltas -> exercises varint sign handling
    counts = [0, 500, 3, 497, 7, 490, 11, 1]
    comp = R._compress_counts(counts)
    assert R._decompress_counts(comp) == counts


def test_iou_matrix_parity(native_lib, monkeypatch):
    dets = [R.encode(m) for m in _random_masks(6, 48, 48, 1)]
    gts = [R.encode(m) for m in _random_masks(4, 48, 48, 2)]
    iscrowd = [False, True, False, True]
    fast = R.rle_iou(dets, gts, iscrowd)
    _pure(monkeypatch)
    slow = R.rle_iou(dets, gts, iscrowd)
    np.testing.assert_allclose(fast, slow, rtol=0, atol=0)
    assert fast.shape == (6, 4)


def test_empty_mask_roundtrip(native_lib):
    mask = np.zeros((16, 16), np.uint8)
    enc = R.encode(mask)
    np.testing.assert_array_equal(R.decode(enc), mask)
    full = np.ones((16, 16), np.uint8)
    enc = R.encode(full)
    np.testing.assert_array_equal(R.decode(enc), full)
    assert R.area(enc) == 256
