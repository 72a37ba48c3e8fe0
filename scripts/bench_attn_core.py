"""Microbench the differentiable attention core (fwd and fwd+bwd) at each
stage's shapes for the DurLAR batch-16 config."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tulip_tpu.ops.pallas.attn_core import attn_core

B = 16
# (name, Bg, GL, C, nh) per stage of tulip_base 32x2048 (encoder; decoder mirrors)
STAGES = [
    ("s0 32x512 C96",  B * 16 * 8, 128, 96, 3),
    ("s1 16x256 C192", B * 8 * 4, 128, 192, 6),
    ("s2 8x128 C384",  B * 4 * 2, 128, 384, 12),
    ("s3 4x64 C768",   B * 2 * 1, 128, 768, 24),
]


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1000:8.3f} ms", flush=True)
    return dt


total_f, total_b = 0.0, 0.0
for name, Bg, GL, C, nh in STAGES:
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((Bg, GL, 3 * C)).astype(np.float32)).astype(jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((nh, GL, GL)).astype(np.float32))
    gmask = jnp.zeros((1, GL, GL), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((Bg, GL, C)).astype(np.float32)).astype(jnp.bfloat16)
    scale = (C // nh) ** -0.5

    def split(qkv):
        hd = C // nh
        q3 = qkv.reshape(Bg, GL, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        return tuple(q3[i].reshape(Bg * nh, GL, hd) for i in range(3))

    def merge(ao):
        hd = C // nh
        return ao.reshape(Bg, nh, GL, hd).transpose(0, 2, 1, 3).reshape(Bg, GL, C)

    f = jax.jit(lambda qkv: merge(attn_core(*split(qkv), bias, gmask, nh, scale)))
    tf = timeit(f"fwd  {name}", f, qkv)

    def loss(qkv):
        return jnp.sum(merge(attn_core(*split(qkv), bias, gmask, nh, scale)).astype(jnp.float32) * cot.astype(jnp.float32))
    g = jax.jit(jax.grad(loss))
    tb = timeit(f"grad {name}", g, qkv)
    total_f += tf
    total_b += tb

print(f"\nper-block: fwd {total_f*1000:.2f} ms, fwd+bwd {total_b*1000:.2f} ms")
print("model has ~14 attention blocks across enc+dec (stage mix differs); "
      "these 4 shapes x2 blocks approximate the encoder")
