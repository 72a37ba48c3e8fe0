"""End-to-end metric parity: our eval engines vs the reference torch engines.

Runs the reference ``evaluate``/``MCdrop``
(/root/reference/tulip/engine_upsampling.py:126-608) on CPU torch with the
CUDA ``chamfer_distance`` extension replaced by an exact numpy brute-force
nearest-neighbor, on a tiny synthetic dataset with shared weights (torch
state_dict exported through our importer), and asserts our
``results.txt``/``results_mcdrop.txt`` per-sample MAE/Chamfer/IoU/P/R/F1
match within the 1% contract (BASELINE.json), targeting ~1e-3.

This pins every metric-path quirk end to end: gate order, de-log, low-res
row re-injection, destagger projection, dynamic-extent voxelization.
"""

import json
import math
import os
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tulip_tpu.config import model_config
from tulip_tpu.models.tulip import build_model
from tulip_tpu.utils.checkpoint import import_torch_state_dict
from tulip_tpu.eval.engine import MCdrop as our_mcdrop
from tulip_tpu.eval.engine import evaluate as our_evaluate

# multi-minute CPU-backend compiles: full-model or full-step jits
pytestmark = pytest.mark.slow


class _DummyWriter:
    def add_scalar(self, *a, **k):
        pass

    def add_image(self, *a, **k):
        pass


class _Args:
    """Shared flag surface for both engines (reference get_args_parser)."""
    log_transform = True
    keep_close_scan = False
    save_pcd = False
    grid_size = 0.1
    num_mcdropout_iterations = 10
    noise_threshold = 0.03
    seed = 0

    def __init__(self, outdir, dataset, low, high):
        self.output_dir = outdir
        self.dataset_select = dataset
        self.img_size_low_res = low
        self.img_size_high_res = high


def _brute_chamfer(points1, points2, num_points=None):
    """Exact numpy NN chamfer with the CUDA extension's semantics:
    bidirectional *squared* distances, mean over each direction, summed
    (reference: util/evaluation.py:125-134)."""
    import torch

    a = np.asarray(points1, dtype=np.float64)
    b = np.asarray(points2, dtype=np.float64)

    def one_way(x, y):
        y2 = (y ** 2).sum(1)
        mins = np.empty(x.shape[0])
        step = 2048
        for i in range(0, x.shape[0], step):
            xx = x[i:i + step]
            d = (xx ** 2).sum(1)[:, None] + y2[None, :] - 2.0 * (xx @ y.T)
            mins[i:i + xx.shape[0]] = d.min(axis=1)
        return np.maximum(mins, 0.0)

    val = one_way(a, b).mean() + one_way(b, a).mean()
    return torch.tensor(val, dtype=torch.float64)


def _install_engine_stubs():
    """Stub deps the reference engine imports but never exercises here:
    torch._six (torch<=1.12 shim), trimesh (.ply export, save_pcd=False),
    torchvision.utils.make_grid (TB image grid -> dummy writer)."""
    if "torch._six" not in sys.modules:
        m = types.ModuleType("torch._six")
        m.inf = math.inf
        sys.modules["torch._six"] = m
    if "trimesh" not in sys.modules:
        m = types.ModuleType("trimesh")

        class PointCloud:  # pragma: no cover - save_pcd is always False
            def __init__(self, *a, **k):
                raise RuntimeError("trimesh stub")

        m.PointCloud = PointCloud
        sys.modules["trimesh"] = m
    if "torchvision" not in sys.modules:
        import torch

        tv = types.ModuleType("torchvision")
        utils = types.ModuleType("torchvision.utils")
        utils.make_grid = lambda tensors, nrow=1: torch.stack(list(tensors))
        tv.utils = utils
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = utils


@pytest.fixture(scope="module")
def reference_engine(reference_tulip):
    _install_engine_stubs()
    import engine_upsampling
    # Exact-NN replacement for the CUDA chamfer extension (star-imported
    # into the engine's namespace at engine_upsampling.py:23).
    engine_upsampling.chamfer_distance = _brute_chamfer
    return engine_upsampling


class _Loader:
    """Paired batch-1 samples in the PairDataset dict format.  Low-res is
    derived from high-res by strided row subsampling (DownsampleTensor
    semantics, datasets.py:252) so re-injection parity is meaningful."""

    def __init__(self, low, high, n, seed=0, as_torch=False):
        rng = np.random.default_rng(seed)
        factor = high[0] // low[0]
        self.items = []
        for _ in range(n):
            h = np.log1p(rng.uniform(0.05, 0.95,
                                     (1, 1, *high))).astype(np.float32)
            l = h[:, :, ::factor, :].copy()
            if as_torch:
                import torch
                self.items.append(({'sample': torch.from_numpy(l.copy())},
                                   {'sample': torch.from_numpy(h.copy())}))
            else:
                self.items.append(({'sample': l}, {'sample': h}))

    def __iter__(self):
        return iter(self.items)

    def __len__(self):
        return len(self.items)


def _build_pair(reference_tulip, variant, img_size, target_img_size):
    """Shared-weights model pair.  Random init gives predictions with
    std ~0.2 and ~30% of pixels inside the range gates, with <0.05% of
    pixels within 1e-4 of a gate boundary — so fp32 forward noise (~2e-5)
    flips at most a pixel or two of gating, well inside the 1% contract."""
    import torch
    torch.manual_seed(0)
    factory = getattr(reference_tulip, variant)
    ref = factory(img_size=img_size, target_img_size=target_img_size,
                  patch_size=(1, 4), in_chans=1, window_size=(2, 8),
                  swin_v2=False, pixel_shuffle=True, circular_padding=True,
                  log_transform=True, patch_unmerging=True)
    ref.eval()

    cfg = model_config(variant, img_size=img_size,
                       target_img_size=target_img_size, patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True)
    model = build_model(cfg)
    params = {k: jnp.asarray(v)
              for k, v in import_torch_state_dict(ref.state_dict()).items()}
    return ref, model, params


def _compare_results(ref_dir, our_dir, fname, mae_tol=2e-4, metric_tol=0.01):
    ref = json.load(open(os.path.join(ref_dir, fname)))
    ours = json.load(open(os.path.join(our_dir, fname)))
    assert set(ref) == set(ours)
    assert len(ref['mae']) == len(ours['mae']) and len(ref['mae']) > 0
    np.testing.assert_allclose(ours['mae'], ref['mae'], rtol=mae_tol,
                               err_msg='mae')
    for key in ('chamfer_dist', 'iou', 'precision', 'recall', 'f1'):
        np.testing.assert_allclose(ours[key], ref[key], rtol=metric_tol,
                                   err_msg=key)


def _run_both(reference_engine, reference_tulip, tmp_path, dataset, low, high,
              n, mode, variant="tulip_base"):
    import torch
    ref, model, params = _build_pair(reference_tulip, variant, low, high)

    ref_dir = str(tmp_path / "ref")
    our_dir = str(tmp_path / "ours")
    os.makedirs(ref_dir, exist_ok=True)
    os.makedirs(our_dir, exist_ok=True)

    ref_args = _Args(ref_dir, dataset, low, high)
    our_args = _Args(our_dir, dataset, low, high)

    ref_loader = _Loader(low, high, n, as_torch=True)
    our_loader = _Loader(low, high, n, as_torch=False)

    if mode == "evaluate":
        reference_engine.evaluate(ref_loader, ref, torch.device('cpu'),
                                  _DummyWriter(), args=ref_args)
        our_evaluate(our_loader, params, model, _DummyWriter(), args=our_args)
        fname = 'results.txt'
    else:
        reference_engine.MCdrop(ref_loader, ref, torch.device('cpu'),
                                _DummyWriter(), args=ref_args)
        our_mcdrop(our_loader, params, model, _DummyWriter(), args=our_args)
        fname = 'results_mcdrop.txt'

    _compare_results(ref_dir, our_dir, fname)


def test_evaluate_parity_carla(reference_engine, reference_tulip, tmp_path):
    _run_both(reference_engine, reference_tulip, tmp_path,
              'carla', (16, 256), (64, 256), n=3, mode="evaluate")


def test_evaluate_parity_durlar(reference_engine, reference_tulip, tmp_path):
    """DurLAR exercises the Ouster destagger projection + 0.3/120 gate."""
    _run_both(reference_engine, reference_tulip, tmp_path,
              'durlar', (32, 256), (128, 256), n=2, mode="evaluate")


def test_evaluate_parity_kitti(reference_engine, reference_tulip, tmp_path):
    """KITTI projection hardcodes 64x1024 (evaluation.py:57-60), so this
    runs the real eval geometry at full width."""
    _run_both(reference_engine, reference_tulip, tmp_path,
              'kitti', (16, 1024), (64, 1024), n=1, mode="evaluate")


def test_mcdrop_parity_carla(reference_engine, reference_tulip, tmp_path):
    _run_both(reference_engine, reference_tulip, tmp_path,
              'carla', (16, 256), (64, 256), n=2, mode="mcdrop")


def test_mcdrop_parity_durlar(reference_engine, reference_tulip, tmp_path):
    _run_both(reference_engine, reference_tulip, tmp_path,
              'durlar', (32, 256), (128, 256), n=1, mode="mcdrop")
