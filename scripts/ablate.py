"""Full-forward ablation at batch 32 (compute >> dispatch overhead): replace
one component at a time with a cheap stand-in to attribute the 4.7 ms/img."""

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
    salt = f(params, x_in, salt)
    jax.block_until_ready(salt)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        salt = f(params, x_in, salt)
    _ = float(salt)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:42s} {dt*1000:8.1f} ms  ({dt*1000/B:6.3f} ms/img)", flush=True)
    return dt


orig_attn = S.window_attention_v1
orig_ln = L.layer_norm
orig_mlp = S.mlp

run("baseline")

# 1. attention -> proj only (keeps qkv+proj matmuls, drops windowing+attn)
def attn_matmuls_only(p, prefix, x, st, **kw):
    qkv = L.linear(p, f"{prefix}.qkv", x)
    v = qkv[..., 2 * x.shape[-1]:]
    return L.linear(p, f"{prefix}.proj", v)
S.window_attention_v1 = attn_matmuls_only
run("attn = qkv+proj matmuls only")

# 2. attention -> identity entirely
S.window_attention_v1 = lambda p, prefix, x, st, **kw: x
run("attn = identity")
S.window_attention_v1 = orig_attn

# 3. LN -> bf16 accumulate
def ln_bf16(p, prefix, x, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p[f"{prefix}.weight"].astype(x.dtype) + p[f"{prefix}.bias"].astype(x.dtype)
L.layer_norm = ln_bf16
run("LN in bf16")

# 4. LN -> identity
L.layer_norm = lambda p, prefix, x, eps=1e-6: x
run("LN = identity")
L.layer_norm = orig_ln

# 5. MLP -> identity
S.mlp = lambda p, prefix, x, **kw: x
run("MLP = identity")
S.mlp = orig_mlp

# 6. no shift (rolls + masks gone; math changes, timing only)
import tulip_tpu.models.swin as swin_mod
def attn_noshift(p, prefix, x, st, **kw):
    st2 = st._replace(shift=(0, 0), mask=None)
    return orig_attn(p, prefix, x, st2, **kw)
S.window_attention_v1 = attn_noshift
run("no shift/mask")
S.window_attention_v1 = orig_attn

# 7. no rel-pos bias
def attn_nobias(p, prefix, x, st, **kw):
    import numpy as _np
    st2 = st._replace(rel_index=_np.zeros_like(st.rel_index))
    return orig_attn(p, prefix, x, st2, **kw)
S.window_attention_v1 = attn_nobias
run("rel-pos bias index all-zero (gather trivial)")
S.window_attention_v1 = orig_attn
