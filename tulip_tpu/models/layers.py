"""Primitive layers over a flat parameter dict.

Parameters live in a flat ``dict[str, jnp.ndarray]`` keyed by the *reference
torch state_dict names* (tulip/model/tulip.py module tree) but stored in JAX
layouts:

- Linear ``weight``: (in, out)  [torch stores (out, in)]
- Conv2d ``weight``: HWIO       [torch stores OIHW]
- LayerNorm / bias vectors: unchanged

Keeping torch key names makes the .pth checkpoint importer a pure layout
transpose (tulip_tpu/utils/checkpoint.py) and lets parity tests diff
activations key-by-key against the reference.

Precision policy: matmuls/convs run in the compute dtype (bf16 on TPU);
LayerNorm and softmax accumulate in fp32, mirroring torch AMP autocast
behaviour so released-checkpoint numerics transfer.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]


def linear(p: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    w = p[f"{prefix}.weight"].astype(x.dtype)
    y = x @ w
    b = p.get(f"{prefix}.bias")
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def conv2d(p: Params, prefix: str, x: jnp.ndarray, stride=(1, 1),
           padding="VALID") -> jnp.ndarray:
    """NHWC conv with HWIO kernel.

    1x1 stride-1 convs (all the model's pointwise convs: patch unmerging,
    ps_head expand, decoder_pred) lower to a plain channel matmul — XLA's
    conv op measured ~7 ms/step slower than the equivalent dot in the
    batch-16 train step on v5e."""
    w = p[f"{prefix}.weight"].astype(x.dtype)
    b = p.get(f"{prefix}.bias")
    if w.shape[0] == 1 and w.shape[1] == 1 and tuple(stride) == (1, 1):
        y = x @ w[0, 0]
    else:
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=stride, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def layer_norm(p: Params, prefix: str, x: jnp.ndarray,
               eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm over the last axis, fp32 accumulation."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p[f"{prefix}.weight"].astype(jnp.float32) \
        + p[f"{prefix}.bias"].astype(jnp.float32)
    return y.astype(dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU.  fp32 path: exact erf, matching torch.nn.GELU default (needed
    for released-checkpoint parity).  bf16 path: tanh approximation — the
    erf/tanh difference (<3e-3 absolute) is below bf16 resolution while erf's
    transcendental chain costs ~16% of the whole forward on v5e (measured)."""
    approx = x.dtype == jnp.bfloat16
    return jax.nn.gelu(x, approximate=approx)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array],
            active: bool) -> jnp.ndarray:
    if not active or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def drop_path(x: jnp.ndarray, rate: float, rng: Optional[jax.Array],
              active: bool) -> jnp.ndarray:
    """Per-sample stochastic depth (reference: tulip/model/tulip.py:16-30)."""
    if not active or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Initializers (torch-default-matching, for from-scratch training parity)
# ---------------------------------------------------------------------------

def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """torch trunc_normal_(std=std) with default absolute bounds (-2, 2);
    at std=0.02 that is +/-100 sigma, i.e. effectively untruncated."""
    lo, hi = -2.0 / std, 2.0 / std
    return std * jax.random.truncated_normal(key, lo, hi, shape, dtype)


def torch_conv_init(key, out_c, in_c, kh, kw, bias=True, dtype=jnp.float32):
    """PyTorch Conv2d default init (kaiming_uniform a=sqrt(5)) in HWIO layout.
    The reference's TULIP.init_weights (tulip.py:586-594) only re-inits Linear
    and LayerNorm, so convs keep this torch default."""
    k1, k2 = jax.random.split(key)
    fan_in = in_c * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(k1, (kh, kw, in_c, out_c), dtype, -bound, bound)
    out = {"weight": w}
    if bias:
        out["bias"] = jax.random.uniform(k2, (out_c,), dtype, -bound, bound)
    return out


def torch_linear_trunc_init(key, in_f, out_f, bias=True, dtype=jnp.float32):
    """Linear init per TULIP.init_weights: trunc_normal(std=.02) weight,
    zero bias (tulip/model/tulip.py:586-591).  Stored as (in, out)."""
    w = trunc_normal(key, (in_f, out_f), 0.02, dtype)
    out = {"weight": w}
    if bias:
        out["bias"] = jnp.zeros((out_f,), dtype)
    return out


def layer_norm_init(dim, dtype=jnp.float32):
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


# ---------------------------------------------------------------------------
# Static (config-time) attention geometry, computed in numpy
# ---------------------------------------------------------------------------

def relative_position_index(window) -> np.ndarray:
    """Pairwise relative-position index for a rectangular window
    (reference: tulip/model/tulip.py:228-240).  Shape (L, L), values in
    [0, (2wh-1)(2ww-1))."""
    wh, ww = window
    coords_h = np.arange(wh)
    coords_w = np.arange(ww)
    coords = np.stack(np.meshgrid(coords_h, coords_w, indexing="ij"))  # 2,wh,ww
    coords_flat = coords.reshape(2, -1)
    rel = coords_flat[:, :, None] - coords_flat[:, None, :]            # 2,L,L
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


def shift_attention_mask(grid, window, shift) -> np.ndarray:
    """Additive 0/-100 attention mask for shifted windows
    (reference: tulip/model/tulip.py:254-280).  Returns (nW, L, L) float32.

    Reproduces the reference construction exactly, including its use of
    python slices on the *already shifted* image and the 0/-100 fill values
    (the reference does not mask the cylindrical W-boundary specially even
    with circular padding enabled — preserved for parity)."""
    H, W = grid
    wh, ww = window
    sh, sw = shift
    assert H % wh == 0 and W % ww == 0, "H or W is not divisible by window_size"
    img_mask = np.zeros((H, W), dtype=np.float32)
    h_slices = (slice(0, -wh), slice(-wh, -sh), slice(-sh, None))
    w_slices = (slice(0, -ww), slice(-ww, -sw), slice(-sw, None))
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img_mask[hs, ws] = cnt
            cnt += 1
    # window partition of the mask image
    m = img_mask.reshape(H // wh, wh, W // ww, ww)
    m = m.transpose(0, 2, 1, 3).reshape(-1, wh * ww)           # nW, L
    attn_mask = m[:, None, :] - m[:, :, None]                  # nW, L, L
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
