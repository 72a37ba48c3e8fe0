"""ETL parity: vectorized projections vs the reference's implementations."""

import sys
import types

import numpy as np
import pytest

from tulip_tpu.etl.kitti import create_range_map, load_from_bin
from tulip_tpu.etl.durlar import pcd_to_img


@pytest.fixture(scope="module")
def reference_kitti_etl(reference_tulip):
    sys.path.insert(0, "/root/reference/kitti_utils")
    if "cv2" not in sys.modules:
        sys.modules["cv2"] = types.ModuleType("cv2")
    if not hasattr(np, "round_"):  # reference targets numpy<2
        np.round_ = np.round
    import sample_kitti_dataset as ref_kitti
    return ref_kitti


@pytest.fixture(scope="module")
def reference_durlar_etl(reference_tulip):
    sys.path.insert(0, "/root/reference/durlar_utils")
    if "cv2" not in sys.modules:
        sys.modules["cv2"] = types.ModuleType("cv2")
    import bin_to_img as ref_bin_to_img
    return ref_bin_to_img


def test_kitti_range_map_matches_reference(reference_kitti_etl):
    rng = np.random.default_rng(0)
    n = 20000
    pts = np.zeros((n, 4), np.float32)
    r = rng.uniform(2, 80, n)
    az = rng.uniform(-np.pi, np.pi, n)
    el = rng.uniform(np.deg2rad(-24.8), np.deg2rad(2.0), n)
    pts[:, 0] = r * np.cos(el) * np.sin(az)
    pts[:, 1] = r * np.cos(el) * np.cos(az)
    pts[:, 2] = r * np.sin(el)
    pts[:, 3] = rng.uniform(0, 1, n)

    kw = dict(image_rows_full=64, image_cols=1024, ang_start_y=24.8,
              ang_res_y=26.8 / 63, ang_res_x=360 / 1024,
              max_range=120, min_range=0)
    ours = create_range_map(pts.copy(), **kw)
    ref = reference_kitti_etl.create_range_map(pts.copy(), **kw)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_durlar_projection_matches_reference(reference_durlar_etl):
    rng = np.random.default_rng(1)
    rows, cols = 32, 64  # small grid: the reference loops per pixel (slow)
    scan = rng.uniform(-50, 50, (rows * cols, 4)).astype(np.float32)
    ours_range, ours_int = pcd_to_img(scan, rows=rows, cols=cols)
    ref_range, ref_int = reference_durlar_etl.pcd_to_img(scan, rows=rows, cols=cols)
    np.testing.assert_allclose(ours_range, ref_range, atol=1e-5)
    np.testing.assert_allclose(ours_int, ref_int, atol=1e-6)


def test_durlar_projection_roundtrip():
    """Property test: project a synthetic scan and reproject back to 3D; the
    reprojection error must be small (the reference's own sanity check,
    bin_to_img.py:123-137)."""
    from tulip_tpu.eval.geometry import img_to_pcd_durlar
    rng = np.random.default_rng(2)
    rows, cols = 128, 2048
    # build a physically-consistent scan from the sensor model itself:
    # take a smooth range field, reproject to xyz, then project back
    ranges = rng.uniform(5, 100, (rows, cols))
    pts = img_to_pcd_durlar(ranges / 120.0, maximum_range=120)
    scan = np.concatenate([pts, np.zeros((pts.shape[0], 1))], axis=1).astype(np.float32)
    range_map, _ = pcd_to_img(scan, rows=rows, cols=cols)
    err = np.abs(range_map - ranges)
    assert np.median(err) < 0.05, float(np.median(err))


def test_load_from_bin(tmp_path):
    pts = np.random.rand(100, 4).astype(np.float32)
    path = str(tmp_path / "scan.bin")
    pts.tofile(path)
    np.testing.assert_array_equal(load_from_bin(path), pts)


def test_kitti_split_lists_shipped_and_used_by_default():
    """The canonical KITTI split lists (the exact data files the reference
    ships, kitti_utils/{train,val}_files.txt) must be present and be what
    the sampler CLI loads when no --train_split/--val_split is given."""
    import importlib.util
    import os
    here = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "kitti_utils")
    spec = importlib.util.spec_from_file_location(
        "repo_sample_kitti", os.path.join(here, "sample_kitti_dataset.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    train = mod._load_split(None, "train_files.txt", "/nonexistent")
    val = mod._load_split(None, "val_files.txt", "/nonexistent")
    assert len(train) == 45200, len(train)
    assert len(val) == 1776, len(val)
    # spot-check canonical entries (drive-per-line format)
    assert train[0] == "2011_10_03/2011_10_03_drive_0034_sync"
    assert all("/" in d for d in val[:10])
