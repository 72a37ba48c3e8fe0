"""Eval-engine unit tests: MC-dropout semantics, gate/de-log ordering,
low-res re-injection, results file schema."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tulip_tpu.config import model_config
from tulip_tpu.models.tulip import build_model, init_params
from tulip_tpu.eval.engine import MCdrop, evaluate, _GATES
from tulip_tpu.utils.writer import TBWriter

# multi-minute CPU-backend compiles: full-model or full-step jits
pytestmark = pytest.mark.slow


class _FakeLoader:
    """Two (low, high) batch-1 samples in the PairDataset dict format."""

    def __init__(self, img, target, n=2, seed=0):
        rng = np.random.default_rng(seed)
        self.items = []
        for _ in range(n):
            low = rng.uniform(0.1, 0.9, (1, 1, *img)).astype(np.float32)
            high = rng.uniform(0.1, 0.9, (1, 1, *target)).astype(np.float32)
            self.items.append(({'sample': low}, {'sample': high}))

    def __iter__(self):
        return iter(self.items)

    def __len__(self):
        return len(self.items)


class _Args:
    img_size_low_res = (16, 256)
    img_size_high_res = (64, 256)
    dataset_select = 'carla'
    log_transform = True
    keep_close_scan = False
    save_pcd = False
    grid_size = 0.1
    num_mcdropout_iterations = 10
    noise_threshold = 0.03
    seed = 0

    def __init__(self, outdir):
        self.output_dir = outdir


@pytest.fixture(scope="module")
def tiny_model():
    cfg = model_config('tulip_base', img_size=(16, 256),
                       target_img_size=(64, 256), patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True)
    model = build_model(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return model, params


def test_evaluate_writes_results(tmp_path, tiny_model):
    model, params = tiny_model
    args = _Args(str(tmp_path))
    loader = _FakeLoader(args.img_size_low_res, args.img_size_high_res)
    writer = TBWriter(str(tmp_path / "tb"))
    metrics = evaluate(loader, params, model, writer, args=args)
    results = json.load(open(tmp_path / "results.txt"))
    assert len(results['mae']) == 2
    assert all(np.isfinite(v) for v in results['chamfer_dist'])
    assert all(0 <= v <= 1 for v in results['iou'])


def test_evaluate_skips_metrics_without_writer(tmp_path, tiny_model):
    """Parity: metrics accumulate only when log_writer is present
    (reference engine:174)."""
    model, params = tiny_model
    args = _Args(str(tmp_path))
    loader = _FakeLoader(args.img_size_low_res, args.img_size_high_res)
    metrics = evaluate(loader, params, model, None, args=args)
    assert metrics['mae'] == []


def test_mcdrop_zero_dropout_is_deterministic(tmp_path, tiny_model):
    """Shipped configs have all dropout rates 0: the 50 MC passes are
    identical, std == 0, no pixel removed (SURVEY.md 7.3.8) — the MCdrop
    result must equal plain evaluate's prediction path."""
    model, params = tiny_model
    args = _Args(str(tmp_path))
    loader = _FakeLoader(args.img_size_low_res, args.img_size_high_res)
    writer = TBWriter(str(tmp_path / "tb"))
    mc = MCdrop(loader, params, model, writer, args=args)
    ev = evaluate(loader, params, model, writer, args=args)
    np.testing.assert_allclose(mc['mae'], ev['mae'], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(mc['chamfer_dist'], ev['chamfer_dist'],
                               rtol=1e-4, atol=1e-7)
    assert os.path.exists(tmp_path / "results_mcdrop.txt")


def test_mcdrop_shortcut_matches_full_loop(tmp_path, tiny_model, monkeypatch):
    """At dropout rate 0 MCdrop takes the single-pass broadcast shortcut
    (all `iteration` passes are identical); TULIP_TPU_MC_FULL=1 forces the
    full chunked loop.  Both must produce the same per-sample metrics."""
    model, params = tiny_model
    args = _Args(str(tmp_path))
    loader = _FakeLoader(args.img_size_low_res, args.img_size_high_res)
    writer = TBWriter(str(tmp_path / "tb"))
    monkeypatch.setenv("TULIP_TPU_MC_FULL", "1")
    full = MCdrop(loader, params, model, writer, args=args)
    monkeypatch.setenv("TULIP_TPU_MC_FULL", "0")
    fast = MCdrop(loader, params, model, writer, args=args)
    for k in ('mae', 'chamfer_dist', 'iou', 'precision', 'recall', 'f1'):
        np.testing.assert_allclose(fast[k], full[k], rtol=1e-6, atol=1e-8,
                                   err_msg=k)


def test_gate_values_match_reference():
    assert _GATES['carla'] == (2 / 80, 1.0)
    assert _GATES['kitti'] == (2 / 80, 1.0)
    assert _GATES['durlar'] == (0.3 / 120, 1.0)
