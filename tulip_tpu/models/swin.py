"""Swin blocks (v1 rectangular-window and v2 cosine-attention variants) as
pure functions over a flat param dict.

Parity targets:
- v1: WindowAttention / SwinTransformerBlock (tulip/model/tulip.py:203-352)
- v2: WindowAttention / SwinTransformerBlockV2
  (tulip/model/swin_transformer_v2.py:69-311)

All shape decisions (window fallback, shift masks, relative-position index)
are static, computed at config time (tulip_tpu/config.py,
tulip_tpu/models/layers.py) — nothing here depends on runtime values, so the
whole forward traces to a single XLA program with static shapes.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StageConfig
from ..parallel.halo import roll_hw
from . import layers as L
from .layers import Params


_NEG_INF = -1e9  # exp(-1e9 - max) underflows to exactly 0 in fp32 softmax


class BlockStatic(NamedTuple):
    """Static per-block geometry: everything attention needs besides params."""
    grid: tuple            # (H, W) token grid
    window: tuple          # effective partition window (wh, ww)
    shift: tuple           # (sh, sw); (0, 0) for unshifted blocks
    num_heads: int
    rel_index: np.ndarray  # (L, L) int — built from the ORIGINAL config window
    mask: Optional[np.ndarray]  # (nW, L, L) additive mask or None
    drop_path: float
    # --- grouped-attention statics (TPU fast path) ---
    group: int = 1                       # windows fused per attention call
    win_token: Optional[np.ndarray] = None   # (G*L,) within-window index
    group_mask: Optional[np.ndarray] = None  # (nGroups|1, G*L, G*L) additive


def _grouped_statics(grid, window, shift, mask, group_target: int = 8):
    """Build the statics for block-diagonal grouped window attention.

    TPU rationale: a (2, 8) window is 16 tokens — a 16x16 attention matmul
    uses ~1.5% of the 128x128 MXU.  Fusing G=8 adjacent windows (along W)
    into one 128-token attention with an additive block-diagonal mask makes
    the QK^T / PV matmuls 128x128-shaped while computing the *identical*
    result: cross-window logits sit at -1e9 and underflow to exactly 0 in
    the fp32 softmax."""
    H, W = grid
    wh, ww = window
    Lw = wh * ww
    n_w = W // ww
    group = max(1, min(group_target, 128 // Lw, n_w))
    while n_w % group:
        group -= 1
    GL = group * Lw

    win_token = np.tile(np.arange(Lw), group)                     # (GL,)
    win_id = np.repeat(np.arange(group), Lw)                      # (GL,)
    cross = np.where(win_id[:, None] == win_id[None, :], 0.0,
                     _NEG_INF).astype(np.float32)                 # (GL, GL)

    if mask is None:
        group_mask = cross[None]                                  # (1, GL, GL)
    else:
        # mask: (nH*nW, L, L) in window order (hi, wi); place each window's
        # shift mask on the diagonal of its group
        nH = H // wh
        nWg = n_w // group
        m = mask.reshape(nH, nWg, group, Lw, Lw)
        group_mask = np.tile(cross, (nH * nWg, 1, 1)).reshape(
            nH * nWg, GL, GL)
        for g in range(group):
            s = g * Lw
            group_mask[:, s:s + Lw, s:s + Lw] += m[:, :, g].reshape(-1, Lw, Lw)
    return group, win_token, group_mask.astype(np.float32)


def make_block_static(stage: StageConfig, block_idx: int,
                      config_window) -> BlockStatic:
    """Resolve one block's static geometry.

    NOTE (parity): when the H-fallback flattens the partition window to
    (1, wh*ww), the reference keeps indexing the relative-position-bias table
    with the index precomputed for the ORIGINAL window (the buffer is built in
    __init__ at tulip/model/tulip.py:228-240 and never rebuilt after the
    runtime mutation at :284-287).  We reproduce that: ``rel_index`` always
    derives from ``config_window``."""
    shifted = block_idx % 2 == 1
    shift = stage.shift if shifted else (0, 0)
    rel_index = L.relative_position_index(config_window)
    mask = None
    if shifted:
        mask = L.shift_attention_mask(stage.grid, stage.window, stage.shift)
    # TULIP_TPU_MSA_GROUP: windows fused per attention group (default 8 =
    # 128-token GL).  Smaller groups shrink the masked 8x-redundant logits
    # area (VPU softmax) at the price of narrower matmul tiles — A/B knob.
    gt = int(os.environ.get("TULIP_TPU_MSA_GROUP", "8"))
    group, win_token, group_mask = _grouped_statics(
        stage.grid, stage.window, shift, mask, group_target=gt)
    return BlockStatic(grid=stage.grid, window=stage.window, shift=shift,
                       num_heads=stage.num_heads, rel_index=rel_index,
                       mask=mask, drop_path=stage.drop_path[block_idx],
                       group=group, win_token=win_token, group_mask=group_mask)


# ---------------------------------------------------------------------------
# Window partition / reverse (pure reshapes — XLA fuses these away)
# ---------------------------------------------------------------------------

def window_partition(x: jnp.ndarray, wh: int, ww: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nH*nW, wh*ww, C), windows ordered (b, nh, nw)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * (H // wh) * (W // ww), wh * ww, C)


def window_reverse(x: jnp.ndarray, wh: int, ww: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of window_partition."""
    nH, nW = H // wh, W // ww
    B = x.shape[0] // (nH * nW)
    x = x.reshape(B, nH, nW, wh, ww, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


# ---------------------------------------------------------------------------
# v1 window attention (reference: tulip/model/tulip.py:203-324)
# ---------------------------------------------------------------------------

def window_attention_v1(p: Params, prefix: str, x: jnp.ndarray,
                        st: BlockStatic, *, attn_drop: float = 0.0,
                        proj_drop: float = 0.0, rng=None,
                        dropout_active: bool = False) -> jnp.ndarray:
    """Shifted-window MSA with learned relative position bias.

    x: (B, H, W, C).  All-window attention runs as batched matmuls so the
    thousands of 16-token windows per range image land on the MXU as one
    large contraction.
    """
    B, H, W, C = x.shape
    wh, ww = st.window
    sh, sw = st.shift
    nh = st.num_heads
    hd = C // nh
    scale = hd ** -0.5
    Lw = wh * ww

    if sh or sw:
        x = roll_hw(x, -sh, -sw)

    xw = window_partition(x, wh, ww)                       # (Bn, L, C)
    Bn = xw.shape[0]

    qkv = L.linear(p, f"{prefix}.qkv", xw)                 # (Bn, L, 3C)
    qkv = qkv.reshape(Bn, Lw, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]                       # (Bn, nh, L, hd)

    attn = jnp.einsum("bnld,bnmd->bnlm", q * scale, k,
                      preferred_element_type=jnp.float32)  # (Bn, nh, L, L)

    table = p[f"{prefix}.relative_position_bias_table"].astype(jnp.float32)
    bias = table[jnp.asarray(st.rel_index.reshape(-1))]
    bias = bias.reshape(Lw, Lw, nh).transpose(2, 0, 1)     # (nh, L, L)
    attn = attn + bias[None]

    if st.mask is not None:
        nWin = st.mask.shape[0]
        mask = jnp.asarray(st.mask, dtype=jnp.float32)
        attn = attn.reshape(Bn // nWin, nWin, nh, Lw, Lw) + mask[None, :, None]
        attn = attn.reshape(Bn, nh, Lw, Lw)

    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    if dropout_active and attn_drop > 0.0 and rng is not None:
        rng, sub = jax.random.split(rng)
        attn = L.dropout(attn, attn_drop, sub, True)

    out = jnp.einsum("bnlm,bnmd->bnld", attn, v)           # (Bn, nh, L, hd)
    out = out.transpose(0, 2, 1, 3).reshape(Bn, Lw, C)
    out = L.linear(p, f"{prefix}.proj", out)
    if dropout_active and proj_drop > 0.0 and rng is not None:
        rng, sub = jax.random.split(rng)
        out = L.dropout(out, proj_drop, sub, True)

    out = window_reverse(out, wh, ww, H, W)
    if sh or sw:
        out = roll_hw(out, sh, sw)
    return out


def window_attention_grouped(p: Params, prefix: str, x: jnp.ndarray,
                             st: BlockStatic, *, attn_drop: float = 0.0,
                             proj_drop: float = 0.0, rng=None,
                             dropout_active: bool = False) -> jnp.ndarray:
    """Block-diagonal grouped shifted-window MSA — numerically identical to
    window_attention_v1 (see _grouped_statics), MXU-shaped.

    Stage-0 of the DurLAR config has 1024 windows of 16 tokens per image;
    per-window attention lowers to thousands of 16x16x32 matmuls (~1.5% MXU
    utilization and ~55% of total forward time measured on v5e).  Grouping 8
    W-adjacent windows turns those into 128x128x32 matmuls.
    """
    B, H, W, C = x.shape
    wh, ww = st.window
    sh, sw = st.shift
    nh = st.num_heads
    hd = C // nh
    scale = hd ** -0.5
    Lw = wh * ww
    G = st.group
    GL = G * Lw
    nH = H // wh
    nWg = W // ww // G

    if sh or sw:
        x = roll_hw(x, -sh, -sw)

    # grouped partition: token order (g, i, j) within each group
    xg = x.reshape(B, nH, wh, nWg, G, ww, C)
    xg = xg.transpose(0, 1, 3, 4, 2, 5, 6).reshape(B * nH * nWg, GL, C)
    Bg = xg.shape[0]

    qkv = L.linear(p, f"{prefix}.qkv", xg)
    qkv = qkv.reshape(Bg, GL, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]                       # (Bg, nh, GL, hd)

    attn = jnp.einsum("bnld,bnmd->bnlm", q * scale, k,
                      preferred_element_type=jnp.float32)  # (Bg, nh, GL, GL)

    table = p[f"{prefix}.relative_position_bias_table"].astype(jnp.float32)
    bias = table[jnp.asarray(st.rel_index.reshape(-1))]
    bias = bias.reshape(Lw, Lw, nh).transpose(2, 0, 1)     # (nh, L, L)
    wt = st.win_token
    big_bias = bias[:, jnp.asarray(wt[:, None]), jnp.asarray(wt[None, :])]

    gmask = jnp.asarray(st.group_mask)                     # (nG|1, GL, GL)
    if gmask.shape[0] == 1:
        attn = attn + (big_bias + gmask)[None]
    else:
        attn = attn.reshape(B, nH * nWg, nh, GL, GL)
        attn = attn + big_bias[None, None] + gmask[None, :, None]
        attn = attn.reshape(Bg, nh, GL, GL)

    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    if dropout_active and attn_drop > 0.0 and rng is not None:
        rng, sub = jax.random.split(rng)
        attn = L.dropout(attn, attn_drop, sub, True)

    out = jnp.einsum("bnlm,bnmd->bnld", attn, v)           # (Bg, nh, GL, hd)
    out = out.transpose(0, 2, 1, 3).reshape(Bg, GL, C)
    out = L.linear(p, f"{prefix}.proj", out)
    if dropout_active and proj_drop > 0.0 and rng is not None:
        rng, sub = jax.random.split(rng)
        out = L.dropout(out, proj_drop, sub, True)

    out = out.reshape(B, nH, nWg, G, wh, ww, C)
    out = out.transpose(0, 1, 4, 2, 3, 5, 6).reshape(B, H, W, C)
    if sh or sw:
        out = roll_hw(out, sh, sw)
    return out


def window_attention_pallas(p: Params, prefix: str, x: jnp.ndarray,
                            st: BlockStatic, *, attn_drop: float = 0.0,
                            proj_drop: float = 0.0, rng=None,
                            dropout_active: bool = False,
                            interpret: bool = False) -> jnp.ndarray:
    """Fused-VMEM window MSA (ops/pallas/window_msa.py) on the grouped
    layout; numerically equivalent to window_attention_grouped.  Falls back
    to the XLA grouped path when attention/proj dropout is active (shipped
    configs have both rates at 0, tulip/model/tulip.py:741-743)."""
    if dropout_active and (attn_drop > 0.0 or proj_drop > 0.0) and rng is not None:
        return window_attention_grouped(
            p, prefix, x, st, attn_drop=attn_drop, proj_drop=proj_drop,
            rng=rng, dropout_active=dropout_active)

    from ..ops.pallas.window_msa import fused_window_msa

    B, H, W, C = x.shape
    wh, ww = st.window
    sh, sw = st.shift
    nh = st.num_heads
    hd = C // nh
    Lw = wh * ww
    G, GL = st.group, st.group * Lw
    nH, nWg = H // wh, W // ww // G

    if sh or sw:
        x = roll_hw(x, -sh, -sw)

    xg = x.reshape(B, nH, wh, nWg, G, ww, C)
    xg = xg.transpose(0, 1, 3, 4, 2, 5, 6).reshape(B, nH * nWg, GL, C)

    # block-diag relative-position bias, fp32 (tiny gather, done in XLA)
    table = p[f"{prefix}.relative_position_bias_table"].astype(jnp.float32)
    bias = table[jnp.asarray(st.rel_index.reshape(-1))]
    bias = bias.reshape(Lw, Lw, nh).transpose(2, 0, 1)
    wt = st.win_token
    bias_big = bias[:, jnp.asarray(wt[:, None]), jnp.asarray(wt[None, :])]

    wqkv = p[f"{prefix}.qkv.weight"].astype(x.dtype)
    bqkv = p.get(f"{prefix}.qkv.bias")
    bqkv = (jnp.zeros((3 * C,), x.dtype) if bqkv is None
            else bqkv.astype(x.dtype))
    wproj = p[f"{prefix}.proj.weight"].astype(x.dtype)
    bproj = p[f"{prefix}.proj.bias"].astype(x.dtype)

    out = fused_window_msa(
        xg, None, None, wqkv, bqkv.reshape(1, -1), wproj,
        bproj.reshape(1, -1), bias_big, jnp.asarray(st.group_mask),
        nh=nh, scale_inv_sqrt_hd=hd ** -0.5, interpret=interpret)

    out = out.reshape(B, nH, nWg, G, wh, ww, C)
    out = out.transpose(0, 1, 4, 2, 3, 5, 6).reshape(B, H, W, C)
    if sh or sw:
        out = roll_hw(out, sh, sw)
    return out


_BIAS_ONEHOT_CACHE: dict = {}


def _bias_onehot_nat(st: BlockStatic, perm: np.ndarray) -> np.ndarray:
    """Static (GL*GL, table_rows) one-hot matrix M with
    M[i*GL+j, t] = 1 iff t == rel_index[wt[perm[i]], wt[perm[j]]], so that
    ``M @ table`` materializes the natural-order relative-position bias as a
    matmul instead of a gather chain (whose transpose is scatter-add)."""
    key = (st.grid, st.window, st.group)
    got = _BIAS_ONEHOT_CACHE.get(key)
    if got is None:
        wtp = st.win_token[perm]
        m = st.rel_index[wtp[:, None], wtp[None, :]]       # (GL, GL)
        # rel_index is built from the ORIGINAL config window (see
        # make_block_static), whose corner displacements always attain the
        # table's last row — so max+1 == table rows exactly
        tsz = int(st.rel_index.max()) + 1
        got = np.eye(tsz, dtype=np.float32)[m.reshape(-1)]
        _BIAS_ONEHOT_CACHE[key] = got
    return got


def window_attention_pallas_train(p: Params, prefix: str, x: jnp.ndarray,
                                  st: BlockStatic, *, attn_drop: float = 0.0,
                                  proj_drop: float = 0.0, rng=None,
                                  dropout_active: bool = False) -> jnp.ndarray:
    """Differentiable grouped window MSA with the Pallas attention core.

    The training-path variant: qkv / proj matmuls and the bias gather stay in
    XLA (roofline dense matmuls, free autodiff), while the O(GL^2) part —
    logits, softmax, PV and their backward — runs in ops/pallas/attn_core.py
    with a custom VJP that recomputes the probs in VMEM instead of saving
    them to HBM (XLA's autodiff of the grouped impl spills ~400 MB of fp32
    probabilities per stage-0 block at batch 16).  Numerics match
    window_attention_grouped (same math, same fp32 softmax).
    """
    if dropout_active and (attn_drop > 0.0 or proj_drop > 0.0) and rng is not None:
        return window_attention_grouped(
            p, prefix, x, st, attn_drop=attn_drop, proj_drop=proj_drop,
            rng=rng, dropout_active=dropout_active)

    from ..ops.pallas.attn_core import attn_core, natural_token_perm

    B, H, W, C = x.shape
    wh, ww = st.window
    sh, sw = st.shift
    nh = st.num_heads
    hd = C // nh
    Lw = wh * ww
    G, GL = st.group, st.group * Lw
    nH = H // wh

    if sh or sw:
        x = roll_hw(x, -sh, -sw)
    # natural layout: (B*nH, wh, W, C) row-strips — pure reshape, NO window
    # partition transpose.  The kernel attends over contiguous (wh, G*ww)
    # tiles; the static bias/mask tables are permuted to natural token
    # order instead (attention conjugated by a permutation).
    x4 = x.reshape(B * nH, wh, W, C)

    qkv = L.linear(p, f"{prefix}.qkv", x4)                 # (R, wh, W, 3C)

    # relative-position bias in natural token order via ONE static one-hot
    # matmul: bias_nat[h,i,j] = table[rel_index[wt[perm[i]], wt[perm[j]]], h].
    # The equal-valued 3-gather chain (table[rel_index] -> win_token ->
    # perm) costs three scatter-adds in the BACKWARD (scatter is the
    # transpose of gather; measured ~50 us each x 14 blocks on v5e);
    # onehot @ table and its transpose are tiny MXU matmuls.  Cross-window
    # entries hold garbage table values either way — the -1e9 group mask
    # zeroes their softmax probs exactly, so no gradient flows to them.
    table = p[f"{prefix}.relative_position_bias_table"].astype(jnp.float32)
    perm = natural_token_perm(wh, ww, G)
    onehot = _bias_onehot_nat(st, perm)                    # (GL*GL, tsz)
    bias_flat = jnp.asarray(onehot) @ table                # (GL*GL, nh)

    gmask_nat = st.group_mask[:, perm[:, None], perm[None, :]]
    gmask = jnp.asarray(gmask_nat, dtype=jnp.bfloat16)
    bias_cat = bias_flat.reshape(GL, GL, nh).transpose(0, 2, 1)
    out = attn_core(qkv, bias_cat.reshape(GL, nh * GL), gmask,
                    nh, hd ** -0.5, nH)                    # (R, wh, W, C)
    out = L.linear(p, f"{prefix}.proj", out)

    out = out.reshape(B, H, W, C)
    if sh or sw:
        out = roll_hw(out, sh, sw)
    return out


def fused_half_block_pallas(p: Params, prefix: str, x: jnp.ndarray,
                            st: BlockStatic, eps: float,
                            frame=None):
    """First half of a Swin block fully fused: x + attn(LN1(x)).

    The residual is added inside the kernel in grouped layout — valid because
    roll/partition are permutations, so x + P^-1(attn(P(x))) ==
    P^-1(P(x) + attn(P(x))).

    ``frame`` (frame-threaded mode, inference stage loops): x is
    roll_hw(x_true, -frame) — the storage frame left by the previous block.
    The kernel wants its input in frame st.shift; on the masked-nat path the
    (st.shift - frame) change is folded into the kernel's halo reads
    (window_msa.masked_nat_halo_ok) so the XLA roll copies (whole-activation
    HBM read+write, 2x per shifted block) vanish; the output stays in frame
    st.shift and (out, frame) is returned for the caller to thread.  With
    frame=None behaves as a self-contained block (rolls in XLA, frame-0
    output) and returns just out."""
    from ..ops.pallas.window_msa import (fused_window_msa,
                                         fused_window_msa_nat,
                                         masked_nat_halo_ok)

    B, H, W, C = x.shape
    wh, ww = st.window
    sh, sw = st.shift
    nh = st.num_heads
    hd = C // nh
    Lw = wh * ww
    G, GL = st.group, st.group * Lw
    nH, nWg = H // wh, W // ww // G

    threaded = frame is not None
    halo_mode = False
    dh = dw = 0
    if threaded:
        from ..ops.pallas.window_msa import _use_masked
        dh, dw = sh - frame[0], sw - frame[1]
        mask_per_group = st.group_mask.shape[0] != 1
        halo_mode = ((dh, dw) == (0, 0) and frame == (0, 0)) or (
            _use_masked(nh)
            and os.environ.get("TULIP_TPU_MSA_GROUPED") != "1"
            and masked_nat_halo_ok((B * nH, wh, W, C), GL, nh, nH,
                                   x.dtype, mask_per_group, dh))
        if not halo_mode:
            # ineligible geometry: materialize frame 0 and fall through to
            # the self-contained path below (which rolls for sh/sw itself)
            if frame != (0, 0):
                x = roll_hw(x, frame[0], frame[1])
            dh = dw = 0

    if (sh or sw) and not halo_mode:
        x = roll_hw(x, -sh, -sw)

    table = p[f"{prefix}.attn.relative_position_bias_table"].astype(jnp.float32)
    bias = table[jnp.asarray(st.rel_index.reshape(-1))]
    bias = bias.reshape(Lw, Lw, nh).transpose(2, 0, 1)
    wt = st.win_token
    bias_big = bias[:, jnp.asarray(wt[:, None]), jnp.asarray(wt[None, :])]

    d = x.dtype
    bqkv = p.get(f"{prefix}.attn.qkv.bias")
    bqkv = jnp.zeros((3 * C,), d) if bqkv is None else bqkv.astype(d)
    common = (
        p[f"{prefix}.norm1.weight"].astype(d).reshape(1, -1),
        p[f"{prefix}.norm1.bias"].astype(d).reshape(1, -1),
        p[f"{prefix}.attn.qkv.weight"].astype(d),
        bqkv.reshape(1, -1),
        p[f"{prefix}.attn.proj.weight"].astype(d),
        p[f"{prefix}.attn.proj.bias"].astype(d).reshape(1, -1),
    )

    from ..ops.pallas.window_msa import _use_masked
    # Natural-layout path: row-strip reshape only, NO partition transpose
    # (saves ~730 MB/step of HBM copies at batch 16, r3 trace).  Default
    # wherever the masked-head core applies (small nh — where the nat
    # kernel matches the grouped kernel's in-VMEM speed); the deep peel
    # stages keep the grouped layout, whose transposes are cheap there.
    # TULIP_TPU_MSA_NAT=1 forces nat everywhere, TULIP_TPU_MSA_GROUPED=1
    # forces the grouped layout everywhere (A/B revert).
    use_nat = (os.environ.get("TULIP_TPU_MSA_NAT") == "1"
               or (os.environ.get("TULIP_TPU_MSA_GROUPED") != "1"
                   and _use_masked(nh)))
    if use_nat:
        # bias/mask tables permuted to natural token order
        from ..ops.pallas.attn_core import natural_token_perm
        perm = natural_token_perm(wh, ww, G)
        bias_nat = bias_big[:, jnp.asarray(perm[:, None]),
                            jnp.asarray(perm[None, :])]
        gmask_nat = jnp.asarray(st.group_mask[:, perm[:, None],
                                              perm[None, :]])
        x4 = x.reshape(B * nH, wh, W, C)
        out = fused_window_msa_nat(
            x4, *common, bias_nat, gmask_nat,
            nh=nh, scale_inv_sqrt_hd=hd ** -0.5, nH=nH, eps=eps,
            dh=dh, dw=dw)
        out = out.reshape(B, H, W, C)
    else:
        xg = x.reshape(B, nH, wh, nWg, G, ww, C)
        xg = xg.transpose(0, 1, 3, 4, 2, 5, 6).reshape(B, nH * nWg, GL, C)
        out = fused_window_msa(
            xg, *common, bias_big, jnp.asarray(st.group_mask),
            nh=nh, scale_inv_sqrt_hd=hd ** -0.5, eps=eps)
        out = out.reshape(B, nH, nWg, G, wh, ww, C)
        out = out.transpose(0, 1, 4, 2, 3, 5, 6).reshape(B, H, W, C)
    if (sh or sw) and not halo_mode:
        out = roll_hw(out, sh, sw)
    if threaded:
        return out, ((sh, sw) if halo_mode else (0, 0))
    return out


def fused_swin_block_pallas(p: Params, prefix: str, x: jnp.ndarray,
                            st: BlockStatic, eps: float, frame=None):
    """Whole Swin block as two fused Pallas kernels (inference path):
    x = x + attn(LN1(x)); x = x + MLP(LN2(x)).

    (A one-kernel whole-block variant — MLP chained after the masked-nat
    attention inside the same pallas_call — was built and measured in r4:
    691.6 vs 715.6 img/s for this composition.  The intermediate's HBM
    round-trip is NOT the bottleneck at these geometries — the kernels are
    VPU/softmax-bound and the in-kernel MLP GEMMs ran from a worse layout.
    Deleted per the delete-losers policy; numbers in BASELINE.md.)"""
    from ..ops.pallas.mlp import fused_ln_mlp

    threaded = frame is not None
    if threaded:
        # frame-threaded: the MLP half is per-token (frame-equivariant), so
        # it runs directly in whatever frame the attn half wrote
        x, frame = fused_half_block_pallas(p, prefix, x, st, eps, frame)
    else:
        x = fused_half_block_pallas(p, prefix, x, st, eps)
    B, H, W, C = x.shape
    d = x.dtype
    y = fused_ln_mlp(
        x.reshape(-1, C),
        p[f"{prefix}.norm2.weight"].astype(d).reshape(1, -1),
        p[f"{prefix}.norm2.bias"].astype(d).reshape(1, -1),
        p[f"{prefix}.mlp.fc1.weight"].astype(d),
        p[f"{prefix}.mlp.fc1.bias"].astype(d).reshape(1, -1),
        p[f"{prefix}.mlp.fc2.weight"].astype(d),
        p[f"{prefix}.mlp.fc2.bias"].astype(d).reshape(1, -1),
        eps=eps)
    y = y.reshape(B, H, W, C)
    return (y, frame) if threaded else y


ATTN_IMPLS = {"xla": window_attention_v1, "grouped": window_attention_grouped,
              "pallas": window_attention_pallas}


def mlp(p: Params, prefix: str, x: jnp.ndarray, *, drop: float = 0.0,
        rng=None, dropout_active: bool = False) -> jnp.ndarray:
    """(reference: tulip/model/tulip.py:181-200)"""
    x = L.linear(p, f"{prefix}.fc1", x)
    x = L.gelu(x)
    if dropout_active and drop > 0.0 and rng is not None:
        rng, sub = jax.random.split(rng)
        x = L.dropout(x, drop, sub, True)
    x = L.linear(p, f"{prefix}.fc2", x)
    if dropout_active and drop > 0.0 and rng is not None:
        rng, sub = jax.random.split(rng)
        x = L.dropout(x, drop, sub, True)
    return x


def swin_block_v1(p: Params, prefix: str, x: jnp.ndarray, st: BlockStatic, *,
                  eps: float, drop: float = 0.0, attn_drop: float = 0.0,
                  rng=None, dropout_active: bool = False,
                  droppath_active: bool = False,
                  attn_impl: str = "grouped") -> jnp.ndarray:
    """Pre-norm Swin block (reference: tulip/model/tulip.py:326-352).

    attn_impl=pallas (bf16): inference (drop-path inactive) uses the fully
    fused half-block kernels of ops/pallas/window_msa.py, whose in-kernel
    qkv/proj GEMMs batch over ~32 groups per grid step; training uses the
    v4 composition — LN/qkv/proj as whole-tensor XLA GEMMs around the
    natural-layout attention-core custom VJP, plus the fused LN+MLP VJP
    kernel.  (A per-group fully-fused trainable half-block was tried and
    reverted: fragmenting the dense GEMMs to (GL, C) granularity cost more
    than the fusion saved — see ops/pallas/attn_core.py docstring.)"""
    if (attn_impl == "pallas" and x.dtype == jnp.bfloat16
            and not droppath_active
            and not (dropout_active and (drop > 0.0 or attn_drop > 0.0))):
        return fused_swin_block_pallas(p, prefix, x, st, eps)

    def next_rng():
        nonlocal rng
        if rng is None:
            return None
        rng, sub = jax.random.split(rng)
        return sub

    shortcut = x
    if (attn_impl == "pallas" and x.dtype == jnp.bfloat16
            and os.environ.get("TULIP_TPU_LN_PALLAS") == "1"):
        # Pallas LN custom VJP (ops/pallas/ln.py) — opt-in A/B flag.
        # Measured on v5e (batch 16): the step's relayout copies are
        # NOT caused by the XLA LN fusions (they persist with LN in
        # Pallas), and XLA folds the LN into neighbouring fusions
        # nearly for free, so this trades ~1.9 ms of fusions for
        # ~3.2 ms of standalone kernels (87.1 -> 90.5 ms/step).  Kept
        # for geometries where the LN dominates differently.
        from ..ops.pallas.ln import layer_norm_vjp
        B_, H_, W_, C_ = x.shape
        y = layer_norm_vjp(
            x.reshape(-1, C_),
            p[f"{prefix}.norm1.weight"].reshape(1, -1),
            p[f"{prefix}.norm1.bias"].reshape(1, -1),
            eps).reshape(B_, H_, W_, C_)
    else:
        y = L.layer_norm(p, f"{prefix}.norm1", x, eps)
    if attn_impl == "pallas":
        attn_fn = window_attention_pallas_train
    else:
        attn_fn = ATTN_IMPLS[attn_impl]
    y = attn_fn(p, f"{prefix}.attn", y, st, attn_drop=attn_drop,
                proj_drop=drop, rng=next_rng(),
                dropout_active=dropout_active)
    y = L.drop_path(y, st.drop_path, next_rng(), droppath_active)
    x = x + y

    if (attn_impl == "pallas" and x.dtype == jnp.bfloat16
            and not (dropout_active and drop > 0.0)):
        # training MLP half on the fused kernel (custom VJP: Pallas forward,
        # recompute backward — the (N, 4C) hidden never hits HBM in fwd);
        # residual + drop-path stay outside so stochastic depth composes.
        # Burn the rng split the XLA branch hands to mlp(): every impl must
        # consume the SAME number of splits per block, or the drop-path
        # masks of all downstream blocks diverge between attn_impls and
        # training becomes impl-dependent (found as a phantom "gradient
        # bug": pallas-vs-grouped grads differed ~35% on cancellation-
        # dominated tensors purely from different stochastic-depth draws).
        next_rng()
        from ..ops.pallas.mlp import fused_two_matmul_vjp
        B, H, W, C = x.shape
        d = x.dtype
        y = fused_two_matmul_vjp(
            x.reshape(-1, C),
            p[f"{prefix}.norm2.weight"].astype(d).reshape(1, -1),
            p[f"{prefix}.norm2.bias"].astype(d).reshape(1, -1),
            p[f"{prefix}.mlp.fc1.weight"].astype(d),
            p[f"{prefix}.mlp.fc1.bias"].astype(d).reshape(1, -1),
            p[f"{prefix}.mlp.fc2.weight"].astype(d),
            p[f"{prefix}.mlp.fc2.bias"].astype(d).reshape(1, -1),
            eps, "gelu", True, False).reshape(B, H, W, C)
    else:
        y = L.layer_norm(p, f"{prefix}.norm2", x, eps)
        y = mlp(p, f"{prefix}.mlp", y, drop=drop, rng=next_rng(),
                dropout_active=dropout_active)
    y = L.drop_path(y, st.drop_path, next_rng(), droppath_active)
    return x + y


# ---------------------------------------------------------------------------
# v2 (cosine attention, post-norm) — reference:
# tulip/model/swin_transformer_v2.py:69-311.  Square windows only, matching
# the reference (SwinTransformerBlockV2 takes a scalar window_size).
# ---------------------------------------------------------------------------

def _cpb_table(p: Params, prefix: str, window, nh: int) -> jnp.ndarray:
    """Continuous position bias: 2-layer MLP over a log-spaced coord table,
    then 16*sigmoid (reference: swin_transformer_v2.py:94-115, 161-165)."""
    wh, ww = window
    ch = np.arange(-(wh - 1), wh, dtype=np.float32)
    cw = np.arange(-(ww - 1), ww, dtype=np.float32)
    table = np.stack(np.meshgrid(ch, cw, indexing="ij"), axis=-1)  # (2wh-1,2ww-1,2)
    table[..., 0] /= max(wh - 1, 1)
    table[..., 1] /= max(ww - 1, 1)
    table *= 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    t = jnp.asarray(table.reshape(-1, 2), dtype=jnp.float32)
    h = L.linear(p, f"{prefix}.cpb_mlp.0", t)
    h = jnp.maximum(h, 0.0)
    h = L.linear(p, f"{prefix}.cpb_mlp.2", h)   # ((2wh-1)(2ww-1), nh)
    return h


def window_attention_v2(p: Params, prefix: str, xw: jnp.ndarray,
                        st: BlockStatic) -> jnp.ndarray:
    """Cosine attention over pre-partitioned windows (Bn, L, C)."""
    Bn, Lw, C = xw.shape
    nh = st.num_heads
    hd = C // nh

    w = p[f"{prefix}.qkv.weight"].astype(xw.dtype)         # (C, 3C)
    qb = p.get(f"{prefix}.q_bias")
    if qb is not None:
        vb = p[f"{prefix}.v_bias"]
        bias = jnp.concatenate([qb, jnp.zeros_like(vb), vb]).astype(xw.dtype)
        qkv = xw @ w + bias
    else:
        qkv = xw @ w
    qkv = qkv.reshape(Bn, Lw, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]

    qn = q / jnp.maximum(jnp.linalg.norm(q.astype(jnp.float32), axis=-1,
                                         keepdims=True), 1e-12).astype(q.dtype)
    kn = k / jnp.maximum(jnp.linalg.norm(k.astype(jnp.float32), axis=-1,
                                         keepdims=True), 1e-12).astype(k.dtype)
    attn = jnp.einsum("bnld,bnmd->bnlm", qn, kn,
                      preferred_element_type=jnp.float32)
    logit_scale = jnp.exp(jnp.minimum(
        p[f"{prefix}.logit_scale"].astype(jnp.float32), np.log(1.0 / 0.01)))
    attn = attn * logit_scale[None]                        # (nh,1,1) broadcast

    table = _cpb_table(p, prefix, st.window, nh)
    bias = table[jnp.asarray(st.rel_index.reshape(-1))]
    bias = bias.reshape(Lw, Lw, nh).transpose(2, 0, 1)
    bias = 16.0 * jax.nn.sigmoid(bias)
    attn = attn + bias[None]

    if st.mask is not None:
        nWin = st.mask.shape[0]
        mask = jnp.asarray(st.mask, dtype=jnp.float32)
        attn = attn.reshape(Bn // nWin, nWin, nh, Lw, Lw) + mask[None, :, None]
        attn = attn.reshape(Bn, nh, Lw, Lw)

    attn = jax.nn.softmax(attn, axis=-1).astype(xw.dtype)
    out = jnp.einsum("bnlm,bnmd->bnld", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(Bn, Lw, C)
    return L.linear(p, f"{prefix}.proj", out)


def swin_block_v2(p: Params, prefix: str, x: jnp.ndarray, st: BlockStatic, *,
                  eps: float, rng=None, dropout_active: bool = False,
                  droppath_active: bool = False) -> jnp.ndarray:
    """Post-norm Swin-v2 block (reference: swin_transformer_v2.py:272-311)."""
    B, H, W, C = x.shape
    wh, ww = st.window
    sh, sw = st.shift

    def next_rng():
        nonlocal rng
        if rng is None:
            return None
        rng, sub = jax.random.split(rng)
        return sub

    shortcut = x
    if sh or sw:
        x = roll_hw(x, -sh, -sw)
    xw = window_partition(x, wh, ww)
    xw = window_attention_v2(p, f"{prefix}.attn", xw, st)
    x = window_reverse(xw, wh, ww, H, W)
    if sh or sw:
        x = roll_hw(x, sh, sw)
    y = L.layer_norm(p, f"{prefix}.norm1", x, eps)
    x = shortcut + L.drop_path(y, st.drop_path, next_rng(), droppath_active)

    y = mlp(p, f"{prefix}.mlp", x, rng=next_rng(), dropout_active=dropout_active)
    y = L.layer_norm(p, f"{prefix}.norm2", y, eps)
    return x + L.drop_path(y, st.drop_path, next_rng(), droppath_active)
