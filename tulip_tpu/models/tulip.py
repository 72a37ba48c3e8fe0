"""TULIP Swin U-Net as a pure-functional JAX model.

Parity target: class TULIP (tulip/model/tulip.py:530-755).  Parameters are a
flat dict keyed by the reference torch state_dict names (JAX layouts — see
models/layers.py), so the released .pth checkpoints import via pure layout
transposes and activations can be diffed key-by-key.

Architecture (base, durlar config): (B,1,32,2048) -> patch-embed (1,4) ->
token grid 32x512x96 -> 4 encoder stages with patch merging -> 4x64x768 ->
first patch expanding -> 3 decoder stages with linear-fused skips ->
32x512x96 -> pixel-shuffle head (x4) -> 1x1 conv -> (B,1,128,2048).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, StageConfig, model_config
from ..parallel.halo import circular_pad_w
from . import layers as L
from .layers import Params
from .swin import (
    BlockStatic, make_block_static, swin_block_v1, swin_block_v2,
)


class TulipModel(NamedTuple):
    """A model config bundled with its static per-block geometry."""
    cfg: ModelConfig
    enc_blocks: Tuple[Tuple[BlockStatic, ...], ...]
    dec_blocks: Tuple[Tuple[BlockStatic, ...], ...]


def build_model(cfg: ModelConfig) -> TulipModel:
    def stage_blocks(stage: StageConfig):
        # v2 blocks build their relative-position machinery from the resolved
        # (possibly fallback) window; v1 keeps the original config window
        # (see make_block_static docstring).
        cw = stage.window if cfg.swin_v2 else cfg.window_size
        return tuple(make_block_static(stage, j, cw) for j in range(stage.depth))

    enc = tuple(stage_blocks(s) for s in cfg.encoder_stages)
    dec = tuple(stage_blocks(s) for s in cfg.decoder_stages)
    return TulipModel(cfg=cfg, enc_blocks=enc, dec_blocks=dec)


# ---------------------------------------------------------------------------
# Parameter initialization (torch-default-matching)
# ---------------------------------------------------------------------------

def _attn_params(key, dim, nh, window, qkv_bias, swin_v2, dtype):
    ks = jax.random.split(key, 6)
    p = {}
    if swin_v2:
        p["qkv"] = {"weight": L.trunc_normal(ks[0], (dim, dim * 3), 0.02, dtype)}
        if qkv_bias:
            p["q_bias"] = jnp.zeros((dim,), dtype)
            p["v_bias"] = jnp.zeros((dim,), dtype)
        p["logit_scale"] = jnp.full((nh, 1, 1), math.log(10.0), dtype)
        p["cpb_mlp.0"] = L.torch_linear_trunc_init(ks[1], 2, 512, True, dtype)
        p["cpb_mlp.2"] = L.torch_linear_trunc_init(ks[2], 512, nh, False, dtype)
    else:
        p["qkv"] = L.torch_linear_trunc_init(ks[0], dim, dim * 3, qkv_bias, dtype)
        wh, ww = window
        p["relative_position_bias_table"] = L.trunc_normal(
            ks[1], ((2 * wh - 1) * (2 * ww - 1), nh), 0.02, dtype)
    p["proj"] = L.torch_linear_trunc_init(ks[3], dim, dim, True, dtype)
    return p


def _block_params(key, dim, nh, window, cfg: ModelConfig, dtype):
    ks = jax.random.split(key, 4)
    hidden = int(dim * cfg.mlp_ratio)
    return {
        "norm1": L.layer_norm_init(dim, dtype),
        "norm2": L.layer_norm_init(dim, dtype),
        "attn": _attn_params(ks[0], dim, nh, window, cfg.qkv_bias,
                             cfg.swin_v2, dtype),
        "mlp": {
            "fc1": L.torch_linear_trunc_init(ks[1], dim, hidden, True, dtype),
            "fc2": L.torch_linear_trunc_init(ks[2], hidden, dim, True, dtype),
        },
    }


def _merge_params(key, dim, swin_v2, dtype):
    if swin_v2:  # PatchMergingV2: reduction then norm(2C) (swin_transformer_v2.py:341-346)
        return {"reduction": L.torch_linear_trunc_init(key, 4 * dim, 2 * dim, False, dtype),
                "norm": L.layer_norm_init(2 * dim, dtype)}
    return {"norm": L.layer_norm_init(4 * dim, dtype),  # tulip.py:76-81
            "reduction": L.torch_linear_trunc_init(key, 4 * dim, 2 * dim, False, dtype)}


def _upsample_params(key, dim, cfg: ModelConfig, dtype):
    if cfg.patch_unmerging:  # PatchUnmerging conv (tulip.py:109-123)
        return {"expand": L.torch_conv_init(key, 2 * dim, dim, 1, 1, True, dtype)}
    return {"expand": L.torch_linear_trunc_init(key, dim, 2 * dim, False, dtype),
            "norm": L.layer_norm_init(dim // 2, dtype)}


def _flatten(nested, prefix="", out=None):
    if out is None:
        out = {}
    for k, v in nested.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            _flatten(v, key, out)
        else:
            out[key] = v
    return out


def init_params(key: jax.Array, cfg: ModelConfig,
                dtype=jnp.float32) -> Params:
    """Initialize the full parameter dict, matching the reference init
    semantics (TULIP.init_weights + torch module defaults,
    tulip/model/tulip.py:586-594)."""
    nested: Dict = {}
    n_keys = 16 + 8 * sum(cfg.depths)
    keys = iter(jax.random.split(key, n_keys))

    # patch embed (tulip.py:33-73)
    kh = cfg.patch_size[0]
    kw = 8 if cfg.circular_padding else cfg.patch_size[1]
    nested["patch_embed"] = {
        "proj": L.torch_conv_init(next(keys), cfg.embed_dim, cfg.in_chans,
                                  kh, kw, True, dtype)}
    if cfg.patch_norm:
        nested["patch_embed"]["norm"] = L.layer_norm_init(cfg.embed_dim, dtype)

    # encoder stages
    for i, stage in enumerate(cfg.encoder_stages):
        sp = {"blocks": {}}
        for j in range(stage.depth):
            sp["blocks"][str(j)] = _block_params(
                next(keys), stage.dim, stage.num_heads,
                stage.window if cfg.swin_v2 else cfg.window_size, cfg, dtype)
        if i < cfg.num_layers - 1:
            sp["downsample"] = _merge_params(next(keys), stage.dim, cfg.swin_v2, dtype)
        nested[f"layers.{i}"] = sp

    # first patch expanding at the bottleneck (tulip.py:562-565)
    bottleneck_dim = cfg.embed_dim * 2 ** (cfg.num_layers - 1)
    nested["first_patch_expanding"] = _upsample_params(
        next(keys), bottleneck_dim, cfg, dtype)

    # decoder stages
    for i, stage in enumerate(cfg.decoder_stages):
        sp = {"blocks": {}}
        for j in range(stage.depth):
            sp["blocks"][str(j)] = _block_params(
                next(keys), stage.dim, stage.num_heads,
                stage.window if cfg.swin_v2 else cfg.window_size, cfg, dtype)
        if i < cfg.num_layers - 2:  # last up stage has Identity upsample
            sp["upsample"] = _upsample_params(next(keys), stage.dim, cfg, dtype)
        nested[f"layers_up.{i}"] = sp

    # skip-connection fusers (tulip.py:682-688)
    for i, stage in enumerate(cfg.decoder_stages):
        nested[f"skip_connection_layers.{i}"] = L.torch_linear_trunc_init(
            next(keys), stage.dim * 2, stage.dim, True, dtype)

    nested["norm_up"] = L.layer_norm_init(cfg.embed_dim, dtype)

    # head
    if cfg.pixel_shuffle:  # PixelShuffleHead (tulip.py:161-178)
        nested["ps_head"] = {"conv_expand.0": L.torch_conv_init(
            next(keys), cfg.embed_dim * cfg.upscale_factor ** 2,
            cfg.embed_dim, 1, 1, True, dtype)}
    else:  # FinalPatchExpanding (tulip.py:144-159)
        nested["final_patch_expanding"] = {
            "expand": L.torch_linear_trunc_init(
                next(keys), cfg.embed_dim,
                cfg.upscale_factor ** 2 * cfg.embed_dim, False, dtype),
            "norm": L.layer_norm_init(cfg.embed_dim, dtype)}

    nested["decoder_pred"] = {"weight": L.torch_conv_init(
        next(keys), cfg.in_chans, cfg.embed_dim, 1, 1, False, dtype)["weight"]}

    return _flatten(nested)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _patch_embed(p: Params, cfg: ModelConfig, x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 1) -> (B, H/ph, W/pw, C).  Circular padding pads W by (2, 2)
    wrap and widens the kernel to (ph, 8) (reference: tulip.py:41, 59-61).

    TPU note: implemented as strided-slice im2col + one matmul, NOT as a
    conv.  With in_chans=1 the conv's channel dim maps to a single lane of
    the 8x128 VPU/MXU tiles, and XLA's conv (and especially its transposed
    backward) runs ~10x off roofline — measured ~22 ms of a 129 ms train
    step at batch 16 on v5e.  The im2col form is a (tokens, kh*kw*in) x
    (kh*kw*in, C) matmul whose forward and backward are plain MXU work;
    numerics are identical (same contraction, fp32 accumulation)."""
    ph, pw = cfg.patch_size
    B, H, W, Cin = x.shape
    assert H % ph == 0 and W % pw == 0, (
        f"input {H}x{W} not divisible by patch {cfg.patch_size}")
    if cfg.circular_padding:
        x = circular_pad_w(x, 2, 2)
        kw = 8
    else:
        kw = pw
    Wp = x.shape[2]
    Wo = W // pw

    # gather the kw kernel taps as strided W slices: tap k of output column w
    # reads padded column pw*w + k
    taps = [x[:, :, k:k + pw * (Wo - 1) + 1:pw] for k in range(kw)]
    # order (ph, kw, in) to match the HWIO weight flattening
    patches = jnp.stack(taps, axis=3)                 # (B, H, Wo, kw, Cin)
    patches = patches.reshape(B, H // ph, ph, Wo, kw, Cin)
    patches = patches.transpose(0, 1, 3, 2, 4, 5)     # (B, Ho, Wo, ph, kw, Cin)
    patches = patches.reshape(B, H // ph, Wo, ph * kw * Cin)

    w = p["patch_embed.proj.weight"].astype(x.dtype)  # (ph, kw, Cin, C)
    w = w.reshape(ph * kw * Cin, -1)
    y = patches @ w + p["patch_embed.proj.bias"].astype(x.dtype)
    if cfg.patch_norm:
        y = L.layer_norm(p, "patch_embed.norm", y, cfg.layer_norm_eps)
    return y


def _patch_merging(p: Params, prefix: str, x: jnp.ndarray, swin_v2: bool,
                   eps: float, frame=None) -> jnp.ndarray:
    """2x2 space-to-depth + linear 4C->2C.  Concat order (0,0),(1,0),(0,1),(1,1)
    (reference: tulip.py:92-99 / swin_transformer_v2.py:361-365).

    ``frame``: storage frame left by a frame-threaded stage (inference) —
    when the fused merge kernel applies, the frame restore + space-to-depth
    + LN + reduction all run in ONE Pallas pass; otherwise the frame is
    materialized here and the plain path follows.  (An r3 merge kernel
    measured a wash, but it replaced only the LN+linear — the r5 win is
    keeping the layout work in bf16 and absorbing the roll, r5 trace.)"""
    B, H, W, C = x.shape
    if frame is not None and frame != (0, 0):
        # A fully-folded merge kernel (frame restore + space-to-depth + LN
        # + reduction in one pass) was built and killed in r5: Mosaic
        # cannot lower the 2-sublane->lane fold at 192 unaligned lanes
        # ("unsupported shape cast"), and every workaround (strided slices
        # trace as >2D gathers; padded-lane folds; roll+select pairing)
        # re-spends the ~1 ms it was meant to save.  The frame restore
        # stays a plain XLA roll; the LN+reduction below is still fused.
        from ..parallel.halo import roll_hw
        x = roll_hw(x, frame[0], frame[1])
    if H % 2 or W % 2:
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        H, W = x.shape[1], x.shape[2]
    # reshape/transpose space-to-depth, channel blocks ordered
    # (hp, wp) = (0,0),(1,0),(0,1),(1,1) like the reference concat.  The
    # strided-slice form (x[:, 0::2, 0::2] ... concat) is equal-valued but
    # its BACKWARD is four chained scatter-adds (slice-transpose lowers to
    # scatter on TPU, ~0.2 ms each at stage-0 batch 16); a transpose's
    # backward is a transpose.
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 4, 2, 5)            # B, H/2, W/2, wp, hp, C
    x = x.reshape(B, H // 2, W // 2, 4 * C)
    if swin_v2:
        x = L.linear(p, f"{prefix}.reduction", x)
        return L.layer_norm(p, f"{prefix}.norm", x, eps)
    if x.dtype == jnp.bfloat16 and f"{prefix}.reduction.bias" not in p:
        # fused LN+reduction kernel (custom VJP): keeps the space-to-depth
        # layout copies in bf16 — XLA otherwise hoists the LN's fp32
        # convert above them and runs the mean/var as separate kLoop
        # fusions (~1.2 ms/step at stage 0, batch-32 flagship, r5 trace)
        from ..ops.pallas.mlp import fused_ln_linear
        B2, H2, W2, C4 = x.shape
        lnw = p[f"{prefix}.norm.weight"].astype(x.dtype).reshape(1, C4)
        lnb = p[f"{prefix}.norm.bias"].astype(x.dtype).reshape(1, C4)
        w1 = p[f"{prefix}.reduction.weight"].astype(x.dtype)
        out = fused_ln_linear(x.reshape(-1, C4), lnw, lnb, w1, eps)
        return out.reshape(B2, H2, W2, -1)
    x = L.layer_norm(p, f"{prefix}.norm", x, eps)
    return L.linear(p, f"{prefix}.reduction", x)


def _pixel_shuffle_nhwc(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch.nn.PixelShuffle in NHWC: channel index c*r*r + i*r + j maps to
    output (h*r+i, w*r+j, c)."""
    B, H, W, CR2 = x.shape
    C = CR2 // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)        # B, H, r, W, r, C
    return x.reshape(B, H * r, W * r, C)


def _patch_unmerging(p: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv C->2C then PixelShuffle(2) -> C/2 at 2x res
    (reference: tulip.py:109-123)."""
    x = L.conv2d(p, f"{prefix}.expand", x)
    return _pixel_shuffle_nhwc(x, 2)


def _patch_expanding(p: Params, prefix: str, x: jnp.ndarray,
                     eps: float) -> jnp.ndarray:
    """Linear C->2C then rearrange '(P1 P2 C)' P1=P2=2, norm(C/2)
    (reference: tulip.py:126-140).  Channel split order (p1, p2, c)."""
    x = L.linear(p, f"{prefix}.expand", x)
    B, H, W, C2 = x.shape
    C = C2 // 4
    x = x.reshape(B, H, W, 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * 2, W * 2, C)
    return L.layer_norm(p, f"{prefix}.norm", x, eps)


def _upsample(p: Params, prefix: str, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    if cfg.patch_unmerging:
        return _patch_unmerging(p, prefix, x)
    return _patch_expanding(p, prefix, x, cfg.layer_norm_eps)


def _final_patch_expanding(p: Params, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Linear C->s^2*C, rearrange P1=P2=s (channel order p1,p2,c), norm(C)
    (reference: tulip.py:144-159)."""
    s = cfg.upscale_factor
    x = L.linear(p, "final_patch_expanding.expand", x)
    B, H, W, _ = x.shape
    C = cfg.embed_dim
    x = x.reshape(B, H, W, s, s, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * s, W * s, C)
    return L.layer_norm(p, "final_patch_expanding.norm", x, cfg.layer_norm_eps)


def _ps_head(p: Params, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """1x1 conv C->C*s^2 + LeakyReLU + PixelShuffle(s)
    (reference: tulip.py:161-178)."""
    x = L.conv2d(p, "ps_head.conv_expand.0", x)
    x = L.leaky_relu(x)
    return _pixel_shuffle_nhwc(x, cfg.upscale_factor)


def _ps_head_pred_fused(p: Params, x: jnp.ndarray, cfg: ModelConfig,
                        with_norm_up: bool = False) -> jnp.ndarray:
    """[norm_up +] ps_head + decoder_pred as one fused Pallas kernel.

    The 1x1 prediction conv commutes with PixelShuffle: subpixel s = i*s+j of
    output pixel (h, w) reads expanded channels {c*s^2 + s : c}, so folding
    decoder_pred into a sparse (C*s^2, s^2) second matmul avoids ever
    materializing the (B, H, W, C*s^2) expansion in HBM.  Numerically equal
    to _ps_head + decoder_pred (matmul reassociation only).
    """
    from ..ops.pallas.mlp import fused_two_matmul_vjp

    B, H, W, C = x.shape
    s = cfg.upscale_factor
    r2 = s * s
    d = x.dtype

    w1 = p["ps_head.conv_expand.0.weight"].reshape(C, C * r2).astype(d)
    b1 = p["ps_head.conv_expand.0.bias"].reshape(1, C * r2).astype(d)
    wpred = p["decoder_pred.weight"].reshape(C).astype(d)   # HWIO (1,1,C,1)
    rows = jnp.arange(C * r2)
    w2 = jnp.zeros((C * r2, r2), d).at[rows, rows % r2].set(
        jnp.repeat(wpred, r2))
    b2 = jnp.zeros((1, r2), d)

    if with_norm_up:
        lnw = p["norm_up.weight"].astype(d).reshape(1, -1)
        lnb = p["norm_up.bias"].astype(d).reshape(1, -1)
    else:
        lnw = jnp.zeros((1, C), d)
        lnb = jnp.zeros((1, C), d)
    out = fused_two_matmul_vjp(x.reshape(-1, C), lnw, lnb, w1, b1, w2, b2,
                               cfg.layer_norm_eps, "leaky", with_norm_up,
                               False)
    out = out.reshape(B, H, W, s, s)
    out = out.transpose(0, 1, 3, 2, 4).reshape(B, H * s, W * s, 1)
    return out


def _run_blocks(p: Params, prefix: str, x: jnp.ndarray, blocks, cfg: ModelConfig,
                rng, dropout_active, droppath_active, return_frame=False):
    block_fn = swin_block_v2 if cfg.swin_v2 else swin_block_v1
    # Frame-threaded fused inference: shifted-window rolls become in-kernel
    # halo reads (swin.fused_half_block_pallas frame mode) — the storage
    # frame alternates across the stage and is restored once at the end, so
    # the 2-per-shifted-block XLA roll copies collapse to at most one roll
    # per stage.  With ``return_frame`` the restore is left to the caller
    # (patch merging folds it into its own kernel).  TULIP_TPU_NO_HALO=1
    # reverts to self-contained blocks (A/B).
    if (not cfg.swin_v2 and cfg.attn_impl == "pallas"
            and x.dtype == jnp.bfloat16
            and not droppath_active
            and not (dropout_active and (cfg.drop_rate > 0.0
                                         or cfg.attn_drop_rate > 0.0))
            and os.environ.get("TULIP_TPU_NO_HALO") != "1"):
        from .swin import fused_swin_block_pallas
        from ..parallel.halo import roll_hw
        frame = (0, 0)
        for j, st in enumerate(blocks):
            x, frame = fused_swin_block_pallas(
                p, f"{prefix}.blocks.{j}", x, st, cfg.layer_norm_eps, frame)
        if return_frame:
            return x, frame
        if frame != (0, 0):
            x = roll_hw(x, frame[0], frame[1])
        return x
    if return_frame:
        x = _run_blocks(p, prefix, x, blocks, cfg, rng, dropout_active,
                        droppath_active)
        return x, (0, 0)
    # TULIP_TPU_REMAT_BLOCKS=1: jax.checkpoint each block — the backward
    # recomputes LN/qkv/attention instead of reading their saved residuals
    # from HBM (one extra block-forward of FLOPs for ~300 MB less traffic
    # per stage-0 block).  Perf experiment flag; default off.
    remat = os.environ.get("TULIP_TPU_REMAT_BLOCKS") == "1" and droppath_active
    for j, st in enumerate(blocks):
        sub = None
        if rng is not None:
            rng, sub = jax.random.split(rng)
        if cfg.swin_v2:
            fn = lambda pp, xx, ss: block_fn(
                pp, f"{prefix}.blocks.{j}", xx, st, eps=cfg.layer_norm_eps,
                rng=ss, dropout_active=dropout_active,
                droppath_active=droppath_active)
        else:
            fn = lambda pp, xx, ss: block_fn(
                pp, f"{prefix}.blocks.{j}", xx, st, eps=cfg.layer_norm_eps,
                drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate, rng=ss,
                dropout_active=dropout_active,
                droppath_active=droppath_active, attn_impl=cfg.attn_impl)
        x = (jax.checkpoint(fn) if remat else fn)(p, x, sub)
    return x


def forward_features(params: Params, model: TulipModel, x: jnp.ndarray, *,
                     rng=None, dropout_active=False, droppath_active=False
                     ) -> jnp.ndarray:
    """Full forward from NHWC input image to NHWC prediction
    (reference: TULIP.forward, tulip.py:702-731)."""
    cfg = model.cfg
    p = params

    def next_rng():
        nonlocal rng
        if rng is None:
            return None
        rng, sub = jax.random.split(rng)
        return sub

    x = _patch_embed(p, cfg, x)
    x = L.dropout(x, cfg.drop_rate, next_rng(), dropout_active)  # pos_drop

    # encoder
    x_save = []
    for i in range(cfg.num_layers):
        x_save.append(x)
        if i < cfg.num_layers - 1:
            x, fr = _run_blocks(p, f"layers.{i}", x, model.enc_blocks[i],
                                cfg, next_rng(), dropout_active,
                                droppath_active, return_frame=True)
            x = _patch_merging(p, f"layers.{i}.downsample", x, cfg.swin_v2,
                               cfg.layer_norm_eps, frame=fr)
        else:
            x = _run_blocks(p, f"layers.{i}", x, model.enc_blocks[i], cfg,
                            next_rng(), dropout_active, droppath_active)

    x = _upsample(p, "first_patch_expanding", x, cfg)

    # decoder with linear-fused skip connections (tulip.py:714-717)
    for i in range(cfg.num_layers - 1):
        skip = x_save[cfg.num_layers - i - 2]
        x = jnp.concatenate([x, skip], axis=-1)
        x = L.linear(p, f"skip_connection_layers.{i}", x)
        x = _run_blocks(p, f"layers_up.{i}", x, model.dec_blocks[i], cfg,
                        next_rng(), dropout_active, droppath_active)
        if i < cfg.num_layers - 2:
            x = _upsample(p, f"layers_up.{i}.upsample", x, cfg)

    # The fused head has no residual/dropout interior, so unlike the block
    # kernels it serves training too (custom VJP: Pallas forward, recompute
    # backward) — only pos_drop-style dropout between norm_up and the head
    # would invalidate it, and none exists in the model.
    fused_head = (cfg.attn_impl == "pallas" and x.dtype == jnp.bfloat16)
    if cfg.pixel_shuffle and fused_head and cfg.in_chans == 1:
        # norm_up + ps_head + decoder_pred in one fused kernel
        return _ps_head_pred_fused(p, x, cfg, with_norm_up=True)

    x = L.layer_norm(p, "norm_up", x, cfg.layer_norm_eps)
    if cfg.pixel_shuffle:
        x = _ps_head(p, x, cfg)
    else:
        x = _final_patch_expanding(p, x, cfg)

    return L.conv2d(p, "decoder_pred", x)   # (B, H_t, W_t, in_chans)


def forward_loss(pred: jnp.ndarray, target: jnp.ndarray,
                 log_transform: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """L1 loss (+ de-logged pixel loss when log_transform)
    (reference: tulip.py:690-700).  fp32 accumulation."""
    pred32 = pred.astype(jnp.float32)
    tgt32 = target.astype(jnp.float32)
    loss = jnp.mean(jnp.abs(pred32 - tgt32))
    if log_transform:
        pixel_loss = jnp.mean(jnp.abs(jnp.expm1(pred32) - jnp.expm1(tgt32)))
    else:
        pixel_loss = loss
    return loss, pixel_loss


def apply_model(params: Params, model: TulipModel, x: jnp.ndarray,
                target: Optional[jnp.ndarray] = None, *, mode: str = "eval",
                rng: Optional[jax.Array] = None, mc_drop: bool = False,
                compute_dtype=jnp.float32):
    """Public forward.  ``x``/``target`` are NCHW (torch convention at the
    API boundary, NHWC internally).  ``mode``:

    - 'train': dropout + drop-path active (needs ``rng``)
    - 'eval':  deterministic
    - 'mc':    dropout active, drop-path inactive — the semantics of
      model.eval() + enable_dropout (reference: engine_upsampling.py:39-43)

    Returns pred (NCHW) if ``mc_drop`` else (pred, total_loss, pixel_loss),
    matching TULIP.forward's return arity (tulip.py:733-737).
    """
    dropout_active = mode in ("train", "mc")
    droppath_active = mode == "train"
    x = jnp.transpose(x, (0, 2, 3, 1)).astype(compute_dtype)
    # fp32 runs want exact fp32 matmuls (checkpoint parity); bf16 runs use the
    # MXU's native bf16 path.  JAX's default matmul precision is the fast
    # (bf16-passes) mode on both CPU and TPU, so pin it explicitly.
    precision = "highest" if compute_dtype == jnp.float32 else "default"
    with jax.default_matmul_precision(precision):
        pred = forward_features(params, model, x, rng=rng,
                                dropout_active=dropout_active,
                                droppath_active=droppath_active)
    pred = jnp.transpose(pred, (0, 3, 1, 2))
    if mc_drop:
        return pred
    total_loss, pixel_loss = forward_loss(pred, target, model.cfg.log_transform)
    return pred, total_loss, pixel_loss


# ---------------------------------------------------------------------------
# Factories (reference: tulip/model/tulip.py:739-755)
# ---------------------------------------------------------------------------

def tulip_base(**kwargs) -> TulipModel:
    return build_model(model_config("tulip_base", **kwargs))


def tulip_large(**kwargs) -> TulipModel:
    return build_model(model_config("tulip_large", **kwargs))
