"""End-to-end eval / MC-dropout sweep throughput (VERDICT item 5 numbers).

Drives the real evaluation engines (tulip_tpu/eval/engine.py: evaluate and
MCdrop — reference loop shape tulip/engine_upsampling.py:126-356, 361-608)
over an in-memory synthetic dataset at the graded configs:

  - DurLAR 32x2048 -> 128x2048 (BASELINE.json config #5 sweep shape)
  - KITTI 16x1024 -> 64x1024 (config #4, tulip_large optional)

Measures the full per-sample path: jitted forward (+ MC chunks), de-log +
gating on device, host sensor-model projection, dynamic-extent voxelization,
and the Pallas chamfer sweep — i.e. what a user's evaluation run actually
costs, not just the forward.  Prints one JSON line per config.

Usage: python scripts/eval_bench.py [--samples 32] [--mc-iters 50]
"""

import argparse
import json
import os
import sys
import tempfile
import time
from types import SimpleNamespace

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class _NullWriter:
    """Minimal log_writer: engines only accumulate metrics when a writer is
    present (reference parity, engine_upsampling.py:174), so the bench needs
    one — but TB file IO is not part of the measured path."""

    def add_image(self, *a, **k):
        pass

    def add_scalar(self, *a, **k):
        pass


def _scan_like(rng, shape, max_range):
    """Structured synthetic range image: per-beam base range + smooth
    azimuthal variation, 3-45 m.  Uniform-random ranges up to max_range put
    262k points in a +-110 m ball, whose dynamic-extent 0.1 m voxel grids
    (reference semantics, evaluation.py:148-157) are tens of GB — a data
    artifact, not an engine cost.  Real scans cluster well under 50 m."""
    H, W = shape
    base = rng.uniform(3.0, 25.0, (H, 1))
    az = 1.0 + 0.5 * np.sin(np.linspace(0, 8 * np.pi, W))[None, :]
    r = np.clip(base * az + rng.uniform(-1, 1, (H, W)), 2.0, 45.0)
    return (r / max_range).astype(np.float32)


def _loader(n, low_shape, high_shape, seed=0, max_range=120.0):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n):
        # samples mimic the dataset transform chain output:
        # log1p(range / max_range)  (ScaleTensor + LogTransform)
        low = np.log1p(_scan_like(rng, low_shape, max_range))[None, None]
        high = np.log1p(_scan_like(rng, high_shape, max_range))[None, None]
        batches.append(({"sample": low}, {"sample": high}))
    return batches


def _pretrain(model, params, low_shape, high_shape, steps, max_range):
    """A few production train steps on synthetic pairs so the benched
    predictions have scene structure.  Random-init + the eval range gate
    yields an all-near-origin 262k-point pred cloud — a degenerate chamfer
    input no real evaluation produces (trained preds track the gt scene, so
    the hierarchical kernel's tile skipping engages), and an untested
    extreme on-chip.  ~Steps x 80 ms of device time buys a representative
    sweep."""
    import jax
    import jax.numpy as jnp

    from tulip_tpu.train.step import TrainState, make_optimizer, make_train_step

    rng = np.random.default_rng(3)
    factor = high_shape[0] // low_shape[0]
    tx = make_optimizer(weight_decay=0.05)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    train_step = make_train_step(model, tx)
    key = jax.random.PRNGKey(0)
    for i in range(steps):
        h = np.log1p(_scan_like(rng, high_shape, max_range))[None, None]
        h = np.repeat(h, 2, axis=0)
        l = h[:, :, ::factor, :]
        state, _ = train_step(state, jnp.asarray(l), jnp.asarray(h),
                              jnp.float32(1e-4), jax.random.fold_in(key, i))
    return state.params


def bench_config(name, dataset, low_shape, high_shape, model_name, samples,
                 mc_iters, noise_threshold, attn_impl="pallas",
                 pretrain_steps=48):
    import jax.numpy as jnp

    import jax
    from tulip_tpu.config import model_config
    from tulip_tpu.eval.engine import MCdrop, evaluate
    from tulip_tpu.models.tulip import build_model, init_params

    cfg = model_config(model_name, img_size=low_shape,
                       target_img_size=high_shape, patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True, attn_impl=attn_impl)
    model = build_model(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    if pretrain_steps:
        max_range = 120.0 if dataset == "durlar" else 80.0
        params = _pretrain(model, params, low_shape, high_shape,
                           pretrain_steps, max_range)

    with tempfile.TemporaryDirectory() as out_dir:
        args = SimpleNamespace(
            img_size_low_res=low_shape, img_size_high_res=high_shape,
            dataset_select=dataset, log_transform=True,
            keep_close_scan=False, grid_size=0.1, save_pcd=False,
            output_dir=out_dir, noise_threshold=noise_threshold,
            num_mcdropout_iterations=mc_iters, seed=0)
        writer = _NullWriter()

        max_range = 120.0 if dataset == "durlar" else 80.0
        results = {}
        for mode, fn in (("eval", evaluate), ("mcdrop", MCdrop)):
            # warmup run (compilation) on 2 samples, then the timed sweep
            fn(_loader(2, low_shape, high_shape, seed=1,
                       max_range=max_range), params, model,
               writer, args=args, compute_dtype=jnp.bfloat16)
            loader = _loader(samples, low_shape, high_shape,
                             max_range=max_range)
            t0 = time.perf_counter()
            fn(loader, params, model, writer, args=args,
               compute_dtype=jnp.bfloat16)
            dt = time.perf_counter() - t0
            results[mode] = samples / dt
            print(json.dumps({
                "config": name, "mode": mode, "model": model_name,
                "samples": samples, "samples_per_sec": round(samples / dt, 3),
                "ms_per_sample": round(dt / samples * 1e3, 1),
                "mc_iters": mc_iters if mode == "mcdrop" else None,
            }), flush=True)
        return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=32)
    ap.add_argument("--mc-iters", type=int, default=50)
    ap.add_argument("--configs", default="durlar,kitti",
                    help="comma list: durlar, kitti, kitti_large, carla, "
                         "carla_large")
    ap.add_argument("--attn", default="pallas",
                    choices=["xla", "grouped", "pallas"])
    ap.add_argument("--pretrain-steps", type=int, default=48)
    args = ap.parse_args()

    specs = {
        # (dataset, low, high, model, noise_threshold) — shapes/thresholds
        # from the reference eval scripts (bash_scripts/tulip_evaluation_*.sh)
        "durlar": ("durlar", (32, 2048), (128, 2048), "tulip_base", 0.0005),
        "kitti": ("kitti", (16, 1024), (64, 1024), "tulip_base", 0.03),
        "kitti_large": ("kitti", (16, 1024), (64, 1024), "tulip_large", 0.03),
        "carla": ("carla", (32, 2048), (128, 2048), "tulip_base", 0.03),
        # CARLA trains tulip_large (bash_scripts/tulip_upsampling_carla.sh)
        "carla_large": ("carla", (32, 2048), (128, 2048), "tulip_large", 0.03),
    }
    for key in args.configs.split(","):
        dataset, low, high, model_name, thr = specs[key.strip()]
        bench_config(key.strip(), dataset, low, high, model_name,
                     args.samples, args.mc_iters, thr, attn_impl=args.attn,
                     pretrain_steps=args.pretrain_steps)


if __name__ == "__main__":
    main()
