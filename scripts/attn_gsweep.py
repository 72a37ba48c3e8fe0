"""Sweep the window-group size G for the attention-core kernel: the grouped
formulation wastes ~G*nh/(useful) flops via block-diagonal masking, so
smaller G means fewer computed flops but smaller (possibly latency-bound)
matmuls.  Finds the per-stage sweet spot for the training path.

Inner-chains CALLS_PER_DISPATCH kernel calls per dispatch to amortize the
~3-5 ms axon dispatch overhead out of the measurement.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

CALLS = 4


def bench(fn, args, iters=10, warmup=2):
    @jax.jit
    def chained(salt, *a):
        s = salt
        for _ in range(CALLS):
            o = fn(s, *a)
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
    return (time.perf_counter() - t0) / (iters * CALLS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--groups", default="2,4,8")
    args = ap.parse_args()
    B = args.batch

    from tulip_tpu.ops.pallas.attn_core import attn_core

    rng = np.random.default_rng(0)
    stages = [(32, 512, 96, 3), (16, 256, 192, 6), (8, 128, 384, 12),
              (4, 64, 768, 24)]
    for (H, W, C, nh) in stages:
        wh, ww = 2, 8
        L = wh * ww
        nH = H // wh
        R = B * nH
        qkv = jnp.asarray(rng.standard_normal(
            (R, wh, W, 3 * C)).astype(np.float32)).astype(jnp.bfloat16)
        scale = (C // nh) ** -0.5
        row = []
        for G in [int(g) for g in args.groups.split(",")]:
            if G * ww > W:
                continue
            GL = G * L
            bias_cat = jnp.asarray(rng.standard_normal(
                (GL, nh * GL)).astype(np.float32))
            gmask = jnp.zeros((1, GL, GL), jnp.bfloat16)

            def fwd(salt, q, b, g):
                return attn_core(q + salt.astype(q.dtype), b, g, nh, scale,
                                 nH)

            def fwdbwd(salt, q, b, g):
                out, vjp = jax.vjp(
                    lambda qq, bb: attn_core(qq, bb, g, nh, scale, nH),
                    q + salt.astype(q.dtype), b)
                return vjp(out)

            tf = bench(fwd, (qkv, bias_cat, gmask), iters=args.iters)
            tfb = bench(fwdbwd, (qkv, bias_cat, gmask), iters=args.iters)
            row.append(f"G={G}: fwd {tf*1000:6.2f} fwd+bwd {tfb*1000:6.2f}")
        print(f"stage {H}x{W} C={C:4d} nh={nh:3d}:  " + "   ".join(row))


if __name__ == "__main__":
    main()
