"""Ablation round 2: grouped-attention model, batch 32."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tulip_tpu.config import model_config
from tulip_tpu.models import layers as L
from tulip_tpu.models import swin as S
from tulip_tpu.models import tulip as T

B = 32
ITERS = 10
cfg = model_config('tulip_base', img_size=(32, 2048),
                   target_img_size=(128, 2048), patch_size=(1, 4),
                   window_size=(2, 8), pixel_shuffle=True,
                   circular_padding=True, log_transform=True,
                   patch_unmerging=True)
model = T.build_model(cfg)
params = T.init_params(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)
x_in = jnp.asarray(rng.uniform(0, 1, (B, 32, 2048, 1)).astype(np.float32))


def run(name):
    def fwd(p, x, salt):
        out = T.forward_features(p, model, (x + salt).astype(jnp.bfloat16))
        return jnp.sum(out.astype(jnp.float32)) * 0.0
    f = jax.jit(fwd)
    salt = jnp.zeros(())
    salt = f(params, x_in, salt)
    _ = float(salt)
    salt = f(params, x_in, salt)
    _ = float(salt)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        salt = f(params, x_in, salt)
    _ = float(salt)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:46s} {dt*1000:8.1f} ms  ({dt*1000/B:6.3f} ms/img)", flush=True)
    return dt


orig_grouped = S.ATTN_IMPLS["grouped"]
orig_ln = L.layer_norm
orig_mlp = S.mlp

run("baseline (grouped attn)")

def attn_matmuls_only(p, prefix, x, st, **kw):
    qkv = L.linear(p, f"{prefix}.qkv", x)
    v = qkv[..., 2 * x.shape[-1]:]
    return L.linear(p, f"{prefix}.proj", v)
S.ATTN_IMPLS["grouped"] = attn_matmuls_only
run("attn = qkv+proj matmuls only")
S.ATTN_IMPLS["grouped"] = lambda p, prefix, x, st, **kw: x
run("attn = identity")

# attention without the fp32 logits (bf16 softmax) — timing probe
def attn_bf16_logits(p, prefix, x, st, **kw):
    B_, H, W, C = x.shape
    wh, ww = st.window
    sh, sw = st.shift
    nh = st.num_heads
    hd = C // nh
    Lw = wh * ww
    G, GL = st.group, st.group * Lw
    nH, nWg = H // wh, W // ww // G
    if sh or sw:
        x = jnp.roll(x, shift=(-sh, -sw), axis=(1, 2))
    xg = x.reshape(B_, nH, wh, nWg, G, ww, C).transpose(0, 1, 3, 4, 2, 5, 6)
    xg = xg.reshape(B_ * nH * nWg, GL, C)
    qkv = L.linear(p, f"{prefix}.qkv", xg)
    qkv = qkv.reshape(-1, GL, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jnp.einsum("bnld,bnmd->bnlm", q * (hd ** -0.5), k)  # bf16 out
    table = p[f"{prefix}.relative_position_bias_table"].astype(x.dtype)
    bias = table[jnp.asarray(st.rel_index.reshape(-1))].reshape(Lw, Lw, nh).transpose(2, 0, 1)
    wt = st.win_token
    big_bias = bias[:, jnp.asarray(wt[:, None]), jnp.asarray(wt[None, :])]
    gmask = jnp.asarray(st.group_mask).astype(x.dtype)
    if gmask.shape[0] == 1:
        attn = attn + (big_bias + gmask)[None]
    else:
        attn = attn.reshape(B_, nH * nWg, nh, GL, GL) + big_bias[None, None] + gmask[None, :, None]
        attn = attn.reshape(-1, nh, GL, GL)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bnlm,bnmd->bnld", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(-1, GL, C)
    out = L.linear(p, f"{prefix}.proj", out)
    out = out.reshape(B_, nH, nWg, G, wh, ww, C).transpose(0, 1, 4, 2, 3, 5, 6).reshape(B_, H, W, C)
    if sh or sw:
        out = jnp.roll(out, shift=(sh, sw), axis=(1, 2))
    return out
S.ATTN_IMPLS["grouped"] = attn_bf16_logits
run("attn grouped, bf16 logits+softmax")
S.ATTN_IMPLS["grouped"] = orig_grouped

L.layer_norm = lambda p, prefix, x, eps=1e-6: x
run("LN = identity")
L.layer_norm = orig_ln

S.mlp = lambda p, prefix, x, **kw: x
run("MLP = identity")

# MLP with fused dims (single reshape-free path) — probe bigger N matmul
def mlp_probe(p, prefix, x, **kw):
    B_, H, W, C = x.shape
    x2 = x.reshape(-1, C)
    y = x2 @ p[f"{prefix}.fc1.weight"].astype(x.dtype) + p[f"{prefix}.fc1.bias"].astype(x.dtype)
    y = jax.nn.gelu(y, approximate=True)
    y = y @ p[f"{prefix}.fc2.weight"].astype(x.dtype) + p[f"{prefix}.fc2.bias"].astype(x.dtype)
    return y.reshape(B_, H, W, C)
S.mlp = mlp_probe
run("MLP tanh-gelu, 2d reshape")
S.mlp = orig_mlp
