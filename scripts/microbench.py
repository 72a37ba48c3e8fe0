"""Component-level microbenchmark on the real TPU: where do the 4.6 ms/image
go?  Times each forward sub-component with serialized iterations."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tulip_tpu.config import model_config
from tulip_tpu.models.tulip import (build_model, init_params, apply_model,
                                    _patch_embed, _patch_merging, _ps_head,
                                    _run_blocks)
from tulip_tpu.models import layers as L
from tulip_tpu.models.swin import window_attention_v1, mlp, swin_block_v1

B = 8
cfg = model_config('tulip_base', img_size=(32, 2048),
                   target_img_size=(128, 2048), patch_size=(1, 4),
                   window_size=(2, 8), pixel_shuffle=True,
                   circular_padding=True, log_transform=True,
                   patch_unmerging=True)
model = build_model(cfg)
params = init_params(jax.random.PRNGKey(0), cfg)
params_bf16 = {k: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v
               for k, v in params.items()}

rng = np.random.default_rng(0)


def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    # serialized loop via salt chaining
    @jax.jit
    def chained(salt, *a):
        o = fn(*a)
        leaf = jax.tree_util.tree_leaves(o)[0]
        return salt + jnp.sum(leaf.astype(jnp.float32)) * 0.0
    salt = jnp.zeros((), jnp.float32)
    salt = chained(salt, *args)
    jax.block_until_ready(salt)
    t0 = time.perf_counter()
    for _ in range(iters):
        salt = chained(salt, *args)
    _ = float(salt)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1000:8.2f} ms  ({dt*1000/B:6.3f} ms/img)")
    return dt


x_img = jnp.asarray(rng.uniform(0, 1, (B, 32, 2048, 1)).astype(np.float32)).astype(jnp.bfloat16)

# full forward
def full(p, x):
    from tulip_tpu.models.tulip import forward_features
    return forward_features(p, model, x)
timeit("full forward (bf16)", full, params_bf16, x_img)

# patch embed
e = jax.jit(lambda p, x: _patch_embed(p, cfg, x))(params_bf16, x_img)
timeit("patch_embed", lambda p, x: _patch_embed(p, cfg, x), params_bf16, x_img)

# stage-0 sized tensor
x0 = jnp.asarray(rng.standard_normal((B, 32, 512, 96)).astype(np.float32)).astype(jnp.bfloat16)
st0 = model.enc_blocks[0][0]   # unshifted
st0s = model.enc_blocks[0][1]  # shifted

timeit("stage0 block (unshifted)",
       lambda p, x: swin_block_v1(p, "layers.0.blocks.0", x, st0, eps=1e-6),
       params_bf16, x0)
timeit("stage0 block (shifted)",
       lambda p, x: swin_block_v1(p, "layers.0.blocks.1", x, st0s, eps=1e-6),
       params_bf16, x0)
timeit("stage0 attention only",
       lambda p, x: window_attention_v1(p, "layers.0.blocks.0.attn", x, st0),
       params_bf16, x0)
timeit("stage0 LN only",
       lambda p, x: L.layer_norm(p, "layers.0.blocks.0.norm1", x, 1e-6),
       params_bf16, x0)
timeit("stage0 MLP only",
       lambda p, x: mlp(p, "layers.0.blocks.0.mlp", x),
       params_bf16, x0)
timeit("stage0 roll x2",
       lambda x: jnp.roll(jnp.roll(x, (-1, -4), (1, 2)), (1, 4), (1, 2)),
       x0)
timeit("stage0 qkv matmul",
       lambda p, x: L.linear(p, "layers.0.blocks.0.attn.qkv", x), params_bf16, x0)

# deepest stage
x3 = jnp.asarray(rng.standard_normal((B, 4, 64, 768)).astype(np.float32)).astype(jnp.bfloat16)
st3 = model.enc_blocks[3][0]
timeit("stage3 block (unshifted)",
       lambda p, x: swin_block_v1(p, "layers.3.blocks.0", x, st3, eps=1e-6),
       params_bf16, x3)

# head
xh = jnp.asarray(rng.standard_normal((B, 32, 512, 96)).astype(np.float32)).astype(jnp.bfloat16)
timeit("ps_head", lambda p, x: _ps_head(p, x, cfg), params_bf16, xh)
