"""Differentiable Pallas attention core for the grouped window layout.

Training-path complement to ops/pallas/window_msa.py: that kernel fuses the
whole half-block (LN + qkv + attention + proj + residual) but has no VJP, so
the train step fell back to the XLA grouped implementation — whose backward
saves the fp32 attention probabilities to HBM (~400 MB per stage-0 block at
batch 16) and reads them back, dominating the step time (measured: attention
fwd+bwd was 110 of 175 ms at batch 16 on v5e).

Here the custom-VJP boundary is the *attention core* only:

    ao = core(qkv, bias, gmask)   # peel heads -> QK^T -> softmax -> PV

All O(GL^2) tensors (logits, probs, their gradients) live and die in VMEM in
both passes — the backward FlashAttention-style *recomputes* the probs from
qkv instead of loading them.  The dense, linear-size matmuls around the core
(LN, qkv projection, output projection) stay in XLA, which runs them at
roofline and autodiffs them for free; their HBM traffic is linear in tokens,
not quadratic in window size.

Layouts (grouped windows, see models/swin._grouped_statics):
  qkv:   (Bg, GL, 3C)  — Bg = B * nH * nWg group rows, GL = G*L <= 128 tokens
  bias:  (nh, GL, GL) fp32 — block-diag relative-position bias (differentiable;
         its cotangent chains into the bias-table gather in XLA)
  gmask: (nG, GL, GL) or (1, GL, GL) fp32 additive mask (constant)
  ao:    (Bg, GL, C)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _peel(qkv, BG: int, GL: int, C: int, nh: int):
    """(BG*GL, 3C) -> three (BG*nh, GL, hd) stacks via 2-D lane slices
    (Mosaic cannot split the lane dim in a reshape)."""
    hd = C // nh
    qs, ks, vs = [], [], []
    for g in range(BG):
        rows = slice(g * GL, (g + 1) * GL)
        for h in range(nh):
            qs.append(qkv[rows, h * hd:(h + 1) * hd])
            ks.append(qkv[rows, C + h * hd:C + (h + 1) * hd])
            vs.append(qkv[rows, 2 * C + h * hd:2 * C + (h + 1) * hd])
    return jnp.stack(qs), jnp.stack(ks), jnp.stack(vs)


def _probs(q, k, bias_ref, gmask_ref, *, BG, nh, scale, mask_per_group, sm_t):
    """fp32 logits -> softmax in sm_t.  Shapes (BG*nh, GL, GL)."""
    attn = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    attn = attn.astype(sm_t)
    attn = attn * jnp.asarray(scale, sm_t) \
        + jnp.tile(bias_ref[:], (BG, 1, 1)).astype(sm_t)
    if mask_per_group:
        attn = attn + jnp.repeat(gmask_ref[:], nh, axis=0).astype(sm_t)
    else:
        attn = attn + gmask_ref[0][None].astype(sm_t)
    attn = attn - jnp.max(attn, axis=-1, keepdims=True)
    e = jnp.exp(attn)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(qkv_ref, bias_ref, gmask_ref, o_ref, *, nh: int, scale: float,
                mask_per_group: bool):
    BG, GL = qkv_ref.shape[0], qkv_ref.shape[1]
    C = qkv_ref.shape[2] // 3
    qkv = qkv_ref[:].reshape(BG * GL, 3 * C)
    q, k, v = _peel(qkv, BG, GL, C, nh)

    sm_t = jnp.float32 if qkv.dtype == jnp.float32 else qkv.dtype
    pr = _probs(q, k, bias_ref, gmask_ref, BG=BG, nh=nh, scale=scale,
                mask_per_group=mask_per_group, sm_t=sm_t).astype(qkv.dtype)

    pv = jax.lax.dot_general(
        pr, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (BG*nh, GL, hd)
    outs = [jnp.concatenate([pv[g * nh + h] for h in range(nh)], axis=-1)
            for g in range(BG)]
    out = jnp.concatenate(outs, axis=0)                      # (BG*GL, C) fp32
    o_ref[:] = out.astype(qkv.dtype).reshape(BG, GL, C)


def _bwd_kernel(qkv_ref, bias_ref, gmask_ref, dao_ref, dqkv_ref, dbias_ref,
                *, nh: int, scale: float, mask_per_group: bool):
    BG, GL = qkv_ref.shape[0], qkv_ref.shape[1]
    C = qkv_ref.shape[2] // 3
    hd = C // nh
    qkv = qkv_ref[:].reshape(BG * GL, 3 * C)
    q, k, v = _peel(qkv, BG, GL, C, nh)

    # recompute probs in fp32 (the forward's bf16 rounding of pr is below
    # bf16 gradient noise; fp32 here keeps the softmax-backward stable)
    pr32 = _probs(q, k, bias_ref, gmask_ref, BG=BG, nh=nh, scale=scale,
                  mask_per_group=mask_per_group, sm_t=jnp.float32)
    pr = pr32.astype(qkv.dtype)

    # peel dao to per-(group, head) stacks, mirroring the fwd concat
    dao = dao_ref[:].reshape(BG * GL, C)
    daos = []
    for g in range(BG):
        rows = slice(g * GL, (g + 1) * GL)
        for h in range(nh):
            daos.append(dao[rows, h * hd:(h + 1) * hd])
    dao_h = jnp.stack(daos)                                  # (BG*nh, GL, hd)

    # dv = pr^T @ dao ; dpr = dao @ v^T
    dv = jax.lax.dot_general(
        pr, dao_h, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (BG*nh, GL, hd)
    dpr = jax.lax.dot_general(
        dao_h, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (BG*nh, GL, GL)

    # softmax backward (fp32): ds = pr * (dpr - rowsum(dpr * pr))
    ds = pr32 * (dpr - jnp.sum(dpr * pr32, axis=-1, keepdims=True))

    # bias cotangent: sum over groups in this block, accumulated over grid
    dbias = ds.reshape(BG, nh, GL, GL).sum(0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dbias_ref[:] = dbias

    @pl.when(pl.program_id(0) > 0)
    def _():
        dbias_ref[:] = dbias_ref[:] + dbias

    ds16 = (ds * jnp.asarray(scale, jnp.float32)).astype(qkv.dtype)
    dq = jax.lax.dot_general(
        ds16, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (BG*nh, GL, hd)
    dk = jax.lax.dot_general(
        ds16, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (BG*nh, GL, hd)

    outs = []
    for g in range(BG):
        cols = ([dq[g * nh + h] for h in range(nh)]
                + [dk[g * nh + h] for h in range(nh)]
                + [dv[g * nh + h] for h in range(nh)])
        outs.append(jnp.concatenate(cols, axis=-1))          # (GL, 3C)
    dqkv = jnp.concatenate(outs, axis=0)                     # (BG*GL, 3C)
    dqkv_ref[:] = dqkv.astype(qkv.dtype).reshape(BG, GL, 3 * C)


def _block_groups(Bg: int, nG: int, GL: int, C: int, nh: int,
                  bwd: bool) -> int:
    """Groups per grid step, bounded by a per-step VMEM estimate and by the
    constraint that the per-image group count nG stays divisible (so the
    gmask block index j % (nG // BG) is exact)."""
    hd = C // nh
    per_group = (GL * 3 * C * (2 + 4)            # qkv tile + fp32 copies
                 + nh * GL * GL * 4 * (3 if not bwd else 5)  # logits/probs/(ds,dpr)
                 + 3 * nh * GL * hd * 4)         # head stacks
    if bwd:
        per_group += GL * 3 * C * 4 + GL * C * 4  # dqkv, dao tiles
    budget = 8 * 1024 * 1024
    BG = max(1, min(nG, budget // per_group, 32))
    while nG % BG or Bg % BG:
        BG -= 1
    return BG


def _core_fwd_impl(qkv, bias, gmask, nh: int, scale: float, interpret: bool):
    Bg, GL, C3 = qkv.shape
    C = C3 // 3
    mask_per_group = gmask.shape[0] != 1
    nG = gmask.shape[0] if mask_per_group else Bg
    BG = _block_groups(Bg, nG, GL, C, nh, bwd=False)
    nGB = (nG // BG) if mask_per_group else 1
    if mask_per_group:
        gmask_spec = pl.BlockSpec((BG, GL, GL), lambda j: (j % nGB, 0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        gmask_spec = pl.BlockSpec((1, GL, GL), lambda j: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, nh=nh, scale=scale,
                               mask_per_group=mask_per_group)
    return pl.pallas_call(
        kernel,
        grid=(Bg // BG,),
        in_specs=[
            pl.BlockSpec((BG, GL, 3 * C), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, GL, GL), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            gmask_spec,
        ],
        out_specs=pl.BlockSpec((BG, GL, C), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bg, GL, C), qkv.dtype),
        interpret=interpret,
    )(qkv, bias, gmask)


def _core_bwd_impl(qkv, bias, gmask, dao, nh: int, scale: float,
                   interpret: bool):
    Bg, GL, C3 = qkv.shape
    C = C3 // 3
    mask_per_group = gmask.shape[0] != 1
    nG = gmask.shape[0] if mask_per_group else Bg
    BG = _block_groups(Bg, nG, GL, C, nh, bwd=True)
    nGB = (nG // BG) if mask_per_group else 1
    if mask_per_group:
        gmask_spec = pl.BlockSpec((BG, GL, GL), lambda j: (j % nGB, 0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        gmask_spec = pl.BlockSpec((1, GL, GL), lambda j: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, nh=nh, scale=scale,
                               mask_per_group=mask_per_group)
    dqkv, dbias = pl.pallas_call(
        kernel,
        grid=(Bg // BG,),
        in_specs=[
            pl.BlockSpec((BG, GL, 3 * C), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, GL, GL), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            gmask_spec,
            pl.BlockSpec((BG, GL, C), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BG, GL, 3 * C), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, GL, GL), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bg, GL, 3 * C), qkv.dtype),
            jax.ShapeDtypeStruct((nh, GL, GL), jnp.float32),
        ],
        interpret=interpret,
    )(qkv, bias, gmask, dao)
    return dqkv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def attn_core(qkv: jnp.ndarray, bias: jnp.ndarray, gmask: jnp.ndarray,
              nh: int, scale: float) -> jnp.ndarray:
    """Grouped window attention core with a Pallas forward AND backward.

    qkv (Bg, GL, 3C) -> ao (Bg, GL, C).  bias is differentiable (chains to
    the relative-position-bias table); gmask is a constant additive mask.
    """
    interpret = jax.default_backend() == "cpu"
    return _core_fwd_impl(qkv, bias, gmask, nh, scale, interpret)


def _vjp_fwd(qkv, bias, gmask, nh, scale):
    interpret = jax.default_backend() == "cpu"
    ao = _core_fwd_impl(qkv, bias, gmask, nh, scale, interpret)
    return ao, (qkv, bias, gmask)


def _vjp_bwd(nh, scale, res, dao):
    qkv, bias, gmask = res
    interpret = jax.default_backend() == "cpu"
    dqkv, dbias = _core_bwd_impl(qkv, bias, gmask, dao.astype(qkv.dtype),
                                 nh, scale, interpret)
    return dqkv, dbias.astype(bias.dtype), jnp.zeros_like(gmask)


attn_core.defvjp(_vjp_fwd, _vjp_bwd)
