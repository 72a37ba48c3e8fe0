"""End-to-end training throughput with REAL file I/O (VERDICT r1 item 10).

Generates a synthetic DurLAR-layout dataset on disk (high-res 128x2048 .npy
frames; the low-res stream is the same files row-strided at load, exactly
like the real DurLAR setup where both --data_path flags point at the same
tree), then measures:

  1. loader-only throughput (native C++ fused read+transform pipeline,
     pairs/s) — the host-side ceiling;
  2. end-to-end train img/s over full epochs through the real DataLoader +
     jitted train step (first epoch excluded: compile).

Reference loop shape: tulip/engine_upsampling.py:46-124; the host pipeline
replaces torch DataLoader+DistributedSampler (main_lidar_upsampling.py:
172-217).

Usage: python scripts/e2e_io_bench.py [--frames 256] [--batch 16]
       [--epochs 3] [--workers 8]
"""

import argparse
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataset(root: str, frames: int) -> None:
    train = os.path.join(root, "train")
    os.makedirs(train, exist_ok=True)
    existing = [f for f in os.listdir(train) if f.endswith(".npy")]
    if len(existing) == frames:
        return
    rng = np.random.default_rng(0)
    for i in range(frames):
        # plausible range image: smooth field, metres in [0.5, 120], sparse
        # dropouts (invalid returns) like real LiDAR
        base = rng.uniform(2.0, 80.0, (8, 128)).astype(np.float32)
        img = np.kron(base, np.ones((16, 16), np.float32))
        img += rng.normal(0, 0.5, img.shape).astype(np.float32)
        img = np.clip(img, 0.5, 120.0)
        img[rng.uniform(size=img.shape) < 0.05] = 0.0
        np.save(os.path.join(train, f"{i:06d}.npy"), img)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--root", default="/tmp/e2e_durlar")
    ap.add_argument("--attn", default="pallas")
    ap.add_argument("--loader-only", action="store_true",
                    help="measure the host pipeline ceiling only (no device)")
    args = ap.parse_args()

    make_dataset(args.root, args.frames)

    import jax
    import jax.numpy as jnp

    from tulip_tpu.config import model_config
    from tulip_tpu.data.datasets import generate_dataset
    from tulip_tpu.data.pipeline import DataLoader, ShardedSampler
    from tulip_tpu.models.tulip import build_model, init_params
    from tulip_tpu.train.step import (init_train_state, make_optimizer,
                                      make_train_step)

    dargs = types.SimpleNamespace(
        dataset_select="durlar", data_path_low_res=args.root,
        data_path_high_res=args.root, img_size_low_res=(32, 2048),
        img_size_high_res=(128, 2048), log_transform=True, roll=False)
    dataset = generate_dataset(dargs, is_train=True)
    sampler = ShardedSampler(len(dataset), shuffle=True, seed=0,
                             drop_last=True)
    loader = DataLoader(dataset, batch_size=args.batch, sampler=sampler,
                        drop_last=True, num_workers=args.workers, prefetch=4)

    # --- 1. loader-only (host pipeline ceiling) ---------------------------
    n = 0
    t0 = time.perf_counter()
    for low, high in loader:
        n += low["sample"].shape[0]
    dt = time.perf_counter() - t0
    loader_rate = n / dt
    print(f"loader-only: {n} pairs in {dt:.2f}s = {loader_rate:.1f} pairs/s "
          f"({args.workers} workers, native={'yes' if n else '?'})")
    if args.loader_only:
        print(f"RESULT loader_pairs_per_s={loader_rate:.1f}")
        return

    # --- 2. end-to-end train epochs ---------------------------------------
    cfg = model_config("tulip_base", img_size=(32, 2048),
                       target_img_size=(128, 2048), patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True, attn_impl=args.attn)
    model = build_model(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(0.01)
    state = init_train_state(params, tx)
    step = make_train_step(model, tx, compute_dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    rates = []
    for epoch in range(args.epochs):
        sampler.set_epoch(epoch)
        n = 0
        t0 = time.perf_counter()
        last = None
        for it, (low, high) in enumerate(loader):
            lo = np.ascontiguousarray(low["sample"], np.float32)
            hi = np.ascontiguousarray(high["sample"], np.float32)
            state, (total, pixel) = step(
                state, lo, hi, np.float32(1e-4),
                jax.random.fold_in(key, epoch * 10000 + it))
            if last is not None:
                float(last[0])  # one-step-late loss read (engine.py:49-53)
            last = (total, pixel)
            n += lo.shape[0]
        tl = float(last[0])
        dt = time.perf_counter() - t0
        tag = "compile, excluded" if epoch == 0 else "steady"
        if epoch > 0:
            rates.append(n / dt)
        print(f"epoch {epoch}: {n} imgs in {dt:.2f}s = {n/dt:.1f} img/s "
              f"({tag}); loss={tl:.4f}")

    if rates:
        e2e = float(np.mean(rates))
        print(f"RESULT loader_pairs_per_s={loader_rate:.1f} "
              f"e2e_train_img_per_s={e2e:.1f} "
              f"host_bound={'yes' if e2e < 0.9 * loader_rate else 'no'}")


if __name__ == "__main__":
    main()
