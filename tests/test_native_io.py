"""Native host-IO library: fused .npy read+transform must match the numpy
loader + transform chain exactly."""

import os

import numpy as np
import pytest

from tulip_tpu.data import native
from tulip_tpu.data.loaders import npy_loader
from tulip_tpu.data.transforms import (
    Compose, DownsampleTensor, FilterInvalidPixels, LogTransform, ScaleTensor,
    ToChannelFirst,
)


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native IO library unavailable (no g++?)")
    return True


def _write(tmp_path, name, arr):
    p = str(tmp_path / name)
    np.save(p, arr)
    return p


def test_npy_shape(built, tmp_path):
    p = _write(tmp_path, "a.npy", np.zeros((64, 128, 2), np.float32))
    assert native.npy_shape(p) == (64, 128, 2)


def test_plain_read_matches_npy_loader(built, tmp_path):
    arr = (np.random.rand(32, 64, 2) * 120).astype(np.float32)
    p = _write(tmp_path, "a.npy", arr)
    out = native.read_range_map(p)
    np.testing.assert_array_equal(out, npy_loader(p))


def test_fused_durlar_chain(built, tmp_path):
    """scale 1/120 -> gate [0.3/120, 1] -> row downsample x4 -> log1p =
    the DurLAR low-res transform chain (datasets.py:249-256)."""
    arr = (np.random.rand(128, 256, 2) * 130).astype(np.float32)
    p = _write(tmp_path, "a.npy", arr)

    ref = Compose([ToChannelFirst(), ScaleTensor(1 / 120),
                   FilterInvalidPixels(0.3 / 120, 1.0),
                   DownsampleTensor(128, 4), LogTransform()])(npy_loader(p))

    out = native.read_range_map(p, scale=1 / 120, min_r=0.3 / 120, max_r=1.0,
                                log1p=True, row_start=0, row_stride=4)
    np.testing.assert_allclose(out[None], ref, atol=1e-7)


def test_col_stride(built, tmp_path):
    arr = (np.random.rand(16, 64, 2) * 80).astype(np.float32)
    p = _write(tmp_path, "a.npy", arr)
    out = native.read_range_map(p, scale=1 / 80, col_stride=2)
    np.testing.assert_allclose(out, arr[:, ::2, 0] / 80, atol=1e-7)


def test_batch_read(built, tmp_path):
    paths = []
    arrs = []
    for i in range(6):
        a = (np.random.rand(32, 64, 2) * 120).astype(np.float32)
        paths.append(_write(tmp_path, f"{i}.npy", a))
        arrs.append(a)
    out = native.read_range_batch(paths, scale=1 / 120, min_r=0.3 / 120,
                                  max_r=1.0, log1p=True, out_shape=(32, 64),
                                  num_threads=3)
    assert out.shape == (6, 1, 32, 64)
    for i, a in enumerate(arrs):
        r = a[..., 0] / 120
        r = np.where((r >= 0.3 / 120) & (r <= 1.0), r, 0)
        np.testing.assert_allclose(out[i, 0], np.log1p(r), atol=1e-7)


def test_failure_returns_none(built, tmp_path):
    assert native.read_range_map(str(tmp_path / "missing.npy")) is None
