"""End-to-end workflow tests: the public CLI (tulip/main_lidar_upsampling.py)
driven exactly as the bash_scripts drive it, on a synthetic CARLA-format
dataset — train for 2 epochs, checkpoint, then MC-dropout eval producing
results_mcdrop.txt (the reference's de-facto integration test, SURVEY.md 4)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

# subprocess CLI runs: full-model CPU compiles per case
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_rimg(path, img):
    """CARLA .rimg layout: (H, W) uint64 header + fp16 payload stored as
    (W, H), such that rimg_loader (reshape(size[1], size[0]) -> transpose ->
    flip) reconstructs `img`."""
    H, W = img.shape
    payload = np.flip(img).astype(np.float16).T  # (W, H)
    with open(path, "wb") as f:
        np.array([H, W], dtype=np.uint64).tofile(f)
        payload.tofile(f)


@pytest.fixture(scope="module")
def carla_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("carla")
    rng = np.random.default_rng(0)
    towns_train = ['Town01', 'Town02', 'Town03', 'Town04', 'Town05', 'Town06']
    towns_val = ['Town07', 'Town10HD']
    for town in towns_train + towns_val:
        for res, shape in (("16_256", (16, 256)), ("64_256", (64, 256))):
            d = root / town / res
            d.mkdir(parents=True)
            n = 2 if town in towns_train else 1
            for i in range(n):
                img = rng.uniform(2.5, 79.0, shape).astype(np.float32)
                _write_rimg(str(d / f"{i:04d}.rimg"), img)
    return str(root)


def _run_cli(extra_args, cwd=REPO, timeout=3000):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""   # skip axon TPU registration
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + \
        " --xla_force_host_platform_device_count=2"
    cmd = [sys.executable, "tulip/main_lidar_upsampling.py"] + extra_args
    return subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                          text=True, timeout=timeout)


COMMON = [
    "--model_select", "tulip_base",
    "--pixel_shuffle", "--circular_padding", "--patch_unmerging",
    "--log_transform",
    "--dataset_select", "carla",
    "--img_size_low_res", "16", "256",
    "--img_size_high_res", "64", "256",
    "--window_size", "2", "8",
    "--patch_size", "1", "4",
    "--in_chans", "1",
    "--num_workers", "2",
    "--wandb_disabled",
]


@pytest.mark.e2e
def test_train_then_eval_workflow(carla_dataset, tmp_path):
    out_dir = str(tmp_path / "run")
    r = _run_cli(COMMON + [
        "--data_path_low_res", carla_dataset,
        "--data_path_high_res", carla_dataset,
        "--batch_size", "2",
        "--epochs", "2",
        "--warmup_epochs", "1",
        "--lr", "1e-4",
        "--weight_decay", "0.01",
        "--save_frequency", "1",
        "--output_dir", out_dir,
        "--log_dir", out_dir,
        "--precision", "fp32",
    ])
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert os.path.exists(os.path.join(out_dir, "checkpoint-1.pth"))
    log_lines = open(os.path.join(out_dir, "log.txt")).read().splitlines()
    assert len(log_lines) == 2
    stats = json.loads(log_lines[-1])
    assert np.isfinite(stats["train_loss"])

    # evaluation with MC dropout off the produced checkpoint dir
    r2 = _run_cli(COMMON + [
        "--data_path_low_res", carla_dataset,
        "--data_path_high_res", carla_dataset,
        "--eval", "--mc_drop",
        "--noise_threshold", "0.03",
        "--num_mcdropout_iterations", "10",
        "--output_dir", out_dir,
        "--log_dir", out_dir,
    ])
    assert r2.returncode == 0, r2.stdout[-3000:] + r2.stderr[-3000:]
    results = json.load(open(os.path.join(out_dir, "results_mcdrop.txt")))
    assert set(results) == {"mae", "chamfer_dist", "iou", "precision",
                            "recall", "f1"}
    assert len(results["mae"]) == 2  # Town07 + Town10HD
    assert all(np.isfinite(v) for v in results["chamfer_dist"])


@pytest.mark.e2e
def test_plain_eval_workflow(carla_dataset, tmp_path):
    """--eval without --mc_drop goes through evaluate() -> results.txt."""
    out_dir = str(tmp_path / "run")
    os.makedirs(out_dir)
    # make an untrained checkpoint to evaluate
    import jax
    from tulip_tpu.config import model_config
    from tulip_tpu.models.tulip import init_params
    from tulip_tpu.utils.checkpoint import save_checkpoint
    cfg = model_config('tulip_base', img_size=(16, 256),
                       target_img_size=(64, 256), patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ckpt_path = os.path.join(out_dir, "checkpoint-0.pth")
    save_checkpoint(ckpt_path, params, None, 0, {})

    r = _run_cli(COMMON + [
        "--data_path_low_res", carla_dataset,
        "--data_path_high_res", carla_dataset,
        "--eval",
        "--output_dir", ckpt_path,   # .pth path resolution (main:233-239)
        "--log_dir", out_dir,
    ])
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    results = json.load(open(os.path.join(out_dir, "results.txt")))
    assert len(results["iou"]) == 2


@pytest.mark.e2e
def test_sp_training_workflow(tmp_path):
    """CLI training with --sp_degree 2 on a 4-virtual-device CPU mesh
    (dp2 x sp2): the full public workflow over the sequence-parallel train
    step (tulip_tpu/parallel/sp.py)."""
    root = tmp_path / "durlar"
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 1)):
        d = root / split
        d.mkdir(parents=True)
        for i in range(n):
            img = rng.uniform(2.5, 110.0, (128, 1024)).astype(np.float32)
            arr = np.stack([img, np.zeros_like(img)], axis=-1)
            np.save(str(d / f"{i:05d}.npy"), arr)

    out_dir = str(tmp_path / "run")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + \
        " --xla_force_host_platform_device_count=4"
    cmd = [sys.executable, "tulip/main_lidar_upsampling.py",
           "--model_select", "tulip_base",
           "--pixel_shuffle", "--circular_padding", "--patch_unmerging",
           "--log_transform",
           "--dataset_select", "durlar",
           "--data_path_low_res", str(root),
           "--data_path_high_res", str(root),
           "--img_size_low_res", "32", "1024",
           "--img_size_high_res", "128", "1024",
           "--window_size", "2", "8", "--patch_size", "1", "4",
           "--in_chans", "1",
           "--batch_size", "1", "--epochs", "1", "--warmup_epochs", "1",
           "--lr", "1e-4", "--num_workers", "2", "--wandb_disabled",
           "--sp_degree", "2",
           "--output_dir", out_dir, "--log_dir", out_dir]
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True, timeout=3000)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    stats = json.loads(open(os.path.join(out_dir, "log.txt")).read()
                       .splitlines()[-1])
    assert np.isfinite(stats["train_loss"])
