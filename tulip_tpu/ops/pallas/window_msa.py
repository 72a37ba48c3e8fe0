"""Pallas fused shifted-window MSA kernel.

Replaces the hottest op of the model (BASELINE.json north star; ~40% of
forward time in the XLA grouped implementation, measured on v5e).  The XLA
path materializes qkv, fp32 logits and probabilities in HBM every block;
this kernel computes qkv -> per-window attention -> softmax -> PV -> proj
entirely in VMEM, so HBM traffic per block drops to x-in + out + weights.

Works on the grouped window layout of models/swin.py (G windows fused to
GL = G * L <= 128 tokens, block-diagonal additive mask — see
_grouped_statics): the per-group attention matmuls are 128x128-shaped for
the MXU, and the group mask/relative-position bias arrive as precomputed
fp32 arrays.

Grid: (B, nG / BG) where BG groups are processed per step; weights and the
bias table use constant index maps so Pallas keeps them resident in VMEM
across steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
            bproj_ref, bias_ref, gmask_ref, o_ref, *, nh: int, scale: float,
            mask_per_group: bool, fuse_ln: bool, residual: bool,
            eps: float):
    BG, GL, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    hd = C // nh

    x = x_ref[0].reshape(BG * GL, C)                          # bf16
    if fuse_ln:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        xn = (x32 - mean) * jax.lax.rsqrt(var + eps)
        xn = (xn * lnw_ref[0].astype(jnp.float32)
              + lnb_ref[0].astype(jnp.float32)).astype(x.dtype)
    else:
        xn = x
    qkv = jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)

    # Per-(group, head) 2-D slices only: Mosaic does not support reshapes
    # that split the lane (minor) dimension, so heads are peeled with static
    # lane slices and the (GL, GL) dots stay 2-D.
    outs = []
    for g in range(BG):
        rows = slice(g * GL, (g + 1) * GL)
        head_outs = []
        for h in range(nh):
            q = qkv[rows, h * hd:(h + 1) * hd]
            k = qkv[rows, C + h * hd:C + (h + 1) * hd]
            v = qkv[rows, 2 * C + h * hd:2 * C + (h + 1) * hd]
            attn = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # (GL, GL) fp32
            attn = attn * scale + bias_ref[h]
            attn = attn + (gmask_ref[g] if mask_per_group else gmask_ref[0])
            attn = attn - jnp.max(attn, axis=-1, keepdims=True)
            e = jnp.exp(attn)
            pr = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
            head_outs.append(jnp.dot(pr, v,
                                     preferred_element_type=jnp.float32))
        outs.append(jnp.concatenate(head_outs, axis=-1))      # (GL, C)
    out = jnp.concatenate(outs, axis=0).astype(x.dtype)       # (BG*GL, C)

    out = jnp.dot(out, wproj_ref[:], preferred_element_type=jnp.float32)
    out = out + bproj_ref[0].astype(jnp.float32)
    if residual:
        out = out + x.astype(jnp.float32)
    o_ref[0] = out.astype(x.dtype).reshape(BG, GL, C)


@functools.partial(jax.jit, static_argnames=("nh", "scale_inv_sqrt_hd",
                                             "interpret", "eps"))
def fused_window_msa(xg, lnw, lnb, wqkv, bqkv, wproj, bproj, bias_big,
                     gmask, *, nh: int, scale_inv_sqrt_hd: float,
                     interpret: bool = False, eps: float = 0.0):
    """xg: (B, nG, GL, C) grouped-window tokens (bf16 or fp32).
    bias_big: (nh, GL, GL) fp32 relative-position bias (block-diag expanded).
    gmask: (nG, GL, GL) or (1, GL, GL) fp32 additive mask (cross-window -1e9
    and, for shifted blocks, the boundary shift mask).

    When ``lnw`` is not None the kernel also fuses the pre-attention
    LayerNorm and the residual add (out = x + proj(attn(LN(x)))) — the whole
    first half of a Swin block in one VMEM-resident pass."""
    B, nG, GL, C = xg.shape
    mask_per_group = gmask.shape[0] != 1
    interpret = interpret or jax.default_backend() == "cpu"

    # groups per grid step: big enough that grid-step overhead amortizes
    # (hundreds of tiny steps dominated wall time), bounded by VMEM (~4 MB of
    # transient attention buffers per step)
    BG = max(1, min(nG, 3072 // C, 32))
    while nG % BG:
        BG -= 1

    grid = (B, nG // BG)
    fuse_ln = lnw is not None
    if not fuse_ln:
        lnw = jnp.zeros((1, C), xg.dtype)
        lnb = jnp.zeros((1, C), xg.dtype)
    kernel = functools.partial(_kernel, nh=nh, scale=scale_inv_sqrt_hd,
                               mask_per_group=mask_per_group,
                               fuse_ln=fuse_ln, residual=fuse_ln, eps=eps)
    if mask_per_group:
        gmask_spec = pl.BlockSpec((BG, GL, GL), lambda i, j: (j, 0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        gmask_spec = pl.BlockSpec((1, GL, GL), lambda i, j: (0, 0, 0),
                                  memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BG, GL, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, GL, GL), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            gmask_spec,
        ],
        out_specs=pl.BlockSpec((1, BG, GL, C), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xg.shape, xg.dtype),
        interpret=interpret,
    )(xg, lnw, lnb, wqkv, bqkv, wproj, bproj, bias_big, gmask)
