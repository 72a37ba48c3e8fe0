"""Train-step ablation on the real TPU: attribute the fwd+bwd ms/img.

Times (batch B):
  1. full train step (grouped XLA attention, the current training path)
  2. forward-only loss (grouped)
  3. forward-only loss (pallas fused inference path)
  4. full train step with attention stubbed to identity (bwd sans attention)
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tulip_tpu.config import model_config
from tulip_tpu.models import swin as S
from tulip_tpu.models import tulip as T
from tulip_tpu.train.step import init_train_state, make_optimizer, make_train_step

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = 10

rng = np.random.default_rng(0)
low = jnp.asarray(rng.uniform(0, 1, (B, 1, 32, 2048)).astype(np.float32))
high = jnp.asarray(rng.uniform(0, 1, (B, 1, 128, 2048)).astype(np.float32))


def build(attn):
    cfg = model_config('tulip_base', img_size=(32, 2048),
                       target_img_size=(128, 2048), patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True, attn_impl=attn)
    model = T.build_model(cfg)
    params = T.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, model, params


def time_train(name, model, params):
    tx = make_optimizer(0.01)
    params_copy = jax.tree_util.tree_map(jnp.array, params)
    state = init_train_state(params_copy, tx)
    step = make_train_step(model, tx, compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    state, (tl, _) = step(state, low, high, np.float32(1e-4), key)
    _ = float(tl)
    state, (tl, _) = step(state, low, high, np.float32(1e-4), key)
    _ = float(tl)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, (tl, _) = step(state, low, high, np.float32(1e-4), key)
    _ = float(tl)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:46s} {dt*1000:8.1f} ms  ({B/dt:7.1f} img/s)", flush=True)
    return dt


def time_fwd(name, model, params):
    def fwd(p, lo, hi, salt):
        _, total, _ = T.apply_model(p, model, lo + salt, hi, mode="eval",
                                    compute_dtype=jnp.bfloat16)
        return total * 0.0
    f = jax.jit(fwd)
    salt = jnp.zeros(())
    salt = f(params, low, high, salt)
    salt = f(params, low, high, salt)
    _ = float(salt)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        salt = f(params, low, high, salt)
    _ = float(salt)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:46s} {dt*1000:8.1f} ms  ({B/dt:7.1f} img/s)", flush=True)
    return dt


cfg, model, params = build("grouped")
time_fwd("fwd-only loss (grouped XLA)", model, params)
time_train("train step (grouped XLA)", model, params)

cfg_p, model_p, params_p = build("pallas")
time_fwd("fwd-only loss (pallas fused)", model_p, params_p)

time_train("train step (pallas attn core VJP)", model_p, params_p)

# component stubs: attribute the remaining train-step ms
orig_attn = dict(S.ATTN_IMPLS)
orig_train = S.window_attention_pallas_train
orig_mlp = S.mlp

S.ATTN_IMPLS["grouped"] = lambda p, prefix, x, st, **kw: x
S.window_attention_pallas_train = lambda p, prefix, x, st, **kw: x
try:
    time_train("train step (attention = identity)", model, params)
finally:
    S.ATTN_IMPLS.update(orig_attn)
    S.window_attention_pallas_train = orig_train

S.mlp = lambda p, prefix, x, **kw: x
try:
    time_train("train step (pallas attn, MLP = identity)", model_p, params_p)
finally:
    S.mlp = orig_mlp

import tulip_tpu.models.tulip as T2
orig_ps = T2._ps_head

def time_fwd_mode(name, model, params, mode):
    def fwd(p, lo, hi, salt):
        _, total, _ = T.apply_model(p, model, lo + salt, hi, mode=mode,
                                    rng=jax.random.PRNGKey(0) if mode == "train" else None,
                                    compute_dtype=jnp.bfloat16)
        return total * 0.0
    f = jax.jit(fwd)
    salt = jnp.zeros(())
    salt = f(params, low, high, salt); salt = f(params, low, high, salt)
    _ = float(salt)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        salt = f(params, low, high, salt)
    _ = float(salt)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:46s} {dt*1000:8.1f} ms  ({B/dt:7.1f} img/s)", flush=True)
    return dt

time_fwd_mode("fwd train-mode (pallas, unfused head+droppath)", model_p, params_p, "train")

# patch-embed stub: replace conv with reshape (1,4) patches -> linear? just tile
orig_pe = T2._patch_embed
def pe_stub(p, cfg, x):
    ph, pw = cfg.patch_size
    B, H, W, _ = x.shape
    y = x.reshape(B, H // ph, ph, W // pw, pw).mean((2, 4))
    return jnp.broadcast_to(y[..., None], (B, H // ph, W // pw, cfg.embed_dim)) * 1.0
T2._patch_embed = pe_stub
try:
    time_train("train step (pallas attn, patch_embed stub)", model_p, params_p)
finally:
    T2._patch_embed = orig_pe

# unfused-head cost: stub ps_head+decoder_pred with broadcast
orig_ln_up = None
def ps_stub(p, x, cfg):
    s = cfg.upscale_factor
    B, H, W, C = x.shape
    y = jnp.broadcast_to(x[..., :1], (B, H, W, s * s)) * 1.0
    from tulip_tpu.models.tulip import _pixel_shuffle_nhwc
    return jnp.concatenate([_pixel_shuffle_nhwc(y, s)] * cfg.embed_dim, -1)[..., :cfg.embed_dim]
T2._ps_head = ps_stub
try:
    time_train("train step (pallas attn, ps_head stub)", model_p, params_p)
finally:
    T2._ps_head = orig_ps
