"""Train-step component profiler on the real TPU.

Times the full train step, forward-only, and the attention-core custom VJP
(fwd and bwd separately) per stage geometry, to locate where the
train-vs-infer MFU gap lives (VERDICT round 1, item 3).

Usage: python scripts/train_profile.py [--batch 16] [--parts full,attn,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def serialize_time(fn, args, iters=10, warmup=2):
    """Median-free simple timing with salt chaining (block_until_ready is
    unreliable on axon)."""
    @jax.jit
    def chained(salt, *a):
        o = fn(*a)
        s = salt
        # force EVERY leaf: anything not contributing to the returned salt
        # is dead code and XLA deletes it (summing 27M grad params costs
        # ~0.1 ms — negligible next to the step)
        for l in jax.tree_util.tree_leaves(o):
            s = s + jnp.sum(l.astype(jnp.float32)) * 0.0
        return s

    salt = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        salt = chained(salt, *args)
    _ = float(salt)
    t0 = time.perf_counter()
    for _ in range(iters):
        salt = chained(salt, *args)
    _ = float(salt)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--parts", default="full,fwd,attn,mlp")
    ap.add_argument("--attn", default="pallas")
    args = ap.parse_args()
    parts = args.parts.split(",")
    B = args.batch

    from tulip_tpu.config import model_config
    from tulip_tpu.models.tulip import apply_model, build_model, init_params

    cfg = model_config('tulip_base', img_size=(32, 2048),
                       target_img_size=(128, 2048), patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True, attn_impl=args.attn)
    model = build_model(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    low = jnp.asarray(rng.uniform(0, 1, (B, 1, 32, 2048)).astype(np.float32))
    high = jnp.asarray(rng.uniform(0, 1, (B, 1, 128, 2048)).astype(np.float32))

    if "full" in parts:
        from tulip_tpu.train.step import (init_train_state, make_optimizer,
                                          make_train_step)
        tx = make_optimizer(0.01)
        pc = jax.tree_util.tree_map(jnp.array, params)
        state = init_train_state(pc, tx)
        step = make_train_step(model, tx, compute_dtype=jnp.bfloat16,
                               donate=False)
        # return the FULL (state, losses) tuple: dropping the state lets XLA
        # dead-code the whole backward+optimizer (fixed — earlier numbers
        # measured forward-only here)
        dt = serialize_time(
            lambda s, lo, hi: step(s, lo, hi, np.float32(1e-4),
                                   jax.random.PRNGKey(1)),
            (state, low, high), iters=args.iters)
        print(f"full train step        {dt*1000:8.2f} ms  "
              f"({B/dt:7.1f} img/s)")

        def fwdbwd(p, lo, hi):
            def loss_fn(pp):
                _, tl, _ = apply_model(pp, model, lo, hi, mode="train",
                                       rng=jax.random.PRNGKey(1),
                                       compute_dtype=jnp.bfloat16)
                return tl
            return jax.value_and_grad(loss_fn)(p)
        dt = serialize_time(fwdbwd, (params, low, high), iters=args.iters)
        print(f"fwd+bwd (no optim)     {dt*1000:8.2f} ms  "
              f"({B/dt:7.1f} img/s)")

    if "fwd" in parts:
        def fwd_train(p, lo, hi):
            return apply_model(p, model, lo, hi, mode="train",
                               rng=jax.random.PRNGKey(1),
                               compute_dtype=jnp.bfloat16)[1]
        dt = serialize_time(fwd_train, (params, low, high), iters=args.iters)
        print(f"fwd only (train mode)  {dt*1000:8.2f} ms  "
              f"({B/dt:7.1f} img/s)")
        def fwd_eval(p, lo):
            return apply_model(p, model, lo, None, mode="eval", mc_drop=True,
                               compute_dtype=jnp.bfloat16)
        dt = serialize_time(fwd_eval, (params, low), iters=args.iters)
        print(f"fwd only (eval fused)  {dt*1000:8.2f} ms  "
              f"({B/dt:7.1f} img/s)")

    if "attn" in parts:
        from tulip_tpu.ops.pallas.attn_core import (attn_core,
                                                    natural_token_perm)
        # stage geometries: (H, W, C, nh) token grids for DurLAR base
        stages = [(32, 512, 96, 3), (16, 256, 192, 6), (8, 128, 384, 12),
                  (4, 64, 768, 24)]
        for (H, W, C, nh) in stages:
            wh, ww = 2, 8
            L = wh * ww
            # group target 8 windows (models/swin._grouped_statics)
            G = min(8, W // ww)
            GL = G * L
            nH = H // wh
            R = B * nH
            qkv = jnp.asarray(rng.standard_normal(
                (R, wh, W, 3 * C)).astype(np.float32)).astype(jnp.bfloat16)
            bias_cat = jnp.asarray(rng.standard_normal(
                (GL, nh * GL)).astype(np.float32))
            gmask = jnp.zeros((1, GL, GL), jnp.bfloat16)
            scale = (C // nh) ** -0.5

            fwd = lambda q, b, g: attn_core(q, b, g, nh, scale, nH)
            dt_f = serialize_time(fwd, (qkv, bias_cat, gmask),
                                  iters=args.iters)

            def fwdbwd(q, b, g):
                out, vjp = jax.vjp(lambda qq, bb: attn_core(
                    qq, bb, g, nh, scale, nH), q, b)
                return vjp(out)
            dt_fb = serialize_time(fwdbwd, (qkv, bias_cat, gmask),
                                   iters=args.iters)
            print(f"attn_core {H}x{W} C={C:4d} nh={nh:3d}: "
                  f"fwd {dt_f*1000:7.2f} ms, fwd+bwd {dt_fb*1000:7.2f} ms, "
                  f"bwd~{(dt_fb-dt_f)*1000:7.2f} ms")

    if "mlp" in parts:
        from tulip_tpu.ops.pallas.mlp import fused_two_matmul_vjp
        for (H, W, C) in [(32, 512, 96), (16, 256, 192), (8, 128, 384),
                          (4, 64, 768)]:
            N = B * H * W
            x = jnp.asarray(rng.standard_normal(
                (N, C)).astype(np.float32)).astype(jnp.bfloat16)
            lnw = jnp.ones((1, C), jnp.bfloat16)
            lnb = jnp.zeros((1, C), jnp.bfloat16)
            w1 = jnp.asarray(rng.standard_normal(
                (C, 4 * C)).astype(np.float32)).astype(jnp.bfloat16)
            b1 = jnp.zeros((1, 4 * C), jnp.bfloat16)
            w2 = jnp.asarray(rng.standard_normal(
                (4 * C, C)).astype(np.float32)).astype(jnp.bfloat16)
            b2 = jnp.zeros((1, C), jnp.bfloat16)

            def fb(x, w1, w2):
                def f(xx, a, b):
                    return jnp.sum(fused_two_matmul_vjp(
                        xx, lnw, lnb, a, b1, b, b2, 1e-6, "gelu", True,
                        False).astype(jnp.float32))
                return jax.grad(f, argnums=(0, 1, 2))(x, w1, w2)
            dt = serialize_time(fb, (x, w1, w2), iters=args.iters)
            print(f"mlp vjp {H}x{W} C={C:4d}: fwd+bwd {dt*1000:7.2f} ms")


if __name__ == "__main__":
    main()
