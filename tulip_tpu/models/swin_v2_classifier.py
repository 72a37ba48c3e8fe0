"""Swin-Transformer-V2 image classifier.

API-surface parity: the reference carries the full SwinTransformerV2
classifier (tulip/model/swin_transformer_v2.py:384-641 — PatchEmbed,
BasicLayer, avg-pool head), unreachable from the TULIP runtime but part of
the model library.  Rebuilt here functionally on our swin_block_v2 /
patch-merging primitives with the same state_dict key scheme.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StageConfig
from . import layers as L
from .layers import Params
from .swin import BlockStatic, make_block_static, swin_block_v2
from .tulip import _flatten, _patch_merging


class SwinV2Classifier(NamedTuple):
    img_size: Tuple[int, int]
    patch_size: int
    in_chans: int
    num_classes: int
    embed_dim: int
    depths: Tuple[int, ...]
    num_heads: Tuple[int, ...]
    window_size: int
    mlp_ratio: float
    qkv_bias: bool
    layer_norm_eps: float
    stages: Tuple[Tuple[BlockStatic, ...], ...]


def build_swin_v2(img_size=(224, 224), patch_size=4, in_chans=3,
                  num_classes=1000, embed_dim=96, depths=(2, 2, 6, 2),
                  num_heads=(3, 6, 12, 24), window_size=7, mlp_ratio=4.0,
                  qkv_bias=True, drop_path_rate=0.1,
                  layer_norm_eps=1e-5) -> SwinV2Classifier:
    grid = (img_size[0] // patch_size, img_size[1] // patch_size)
    total = sum(depths)
    dpr = [drop_path_rate * i / max(total - 1, 1) for i in range(total)]
    stages, ofs = [], 0
    g = grid
    for i, d in enumerate(depths):
        # v2 fallback: when min(grid) <= window, the window clamps to
        # min(grid) and shifted blocks drop their shift
        # (reference: swin_transformer_v2.py:230-233)
        if min(g) <= window_size:
            w, shift = min(g), (0, 0)
        else:
            w, shift = window_size, (window_size // 2, window_size // 2)
        stage = StageConfig(dim=embed_dim * 2 ** i, depth=d,
                            num_heads=num_heads[i], grid=g, window=(w, w),
                            shift=shift, drop_path=tuple(dpr[ofs:ofs + d]))
        blocks = tuple(make_block_static(stage, j, (w, w)) for j in range(d))
        stages.append(blocks)
        ofs += d
        if i < len(depths) - 1:
            g = (g[0] // 2, g[1] // 2)
    return SwinV2Classifier(
        img_size=tuple(img_size), patch_size=patch_size, in_chans=in_chans,
        num_classes=num_classes, embed_dim=embed_dim, depths=tuple(depths),
        num_heads=tuple(num_heads), window_size=window_size,
        mlp_ratio=mlp_ratio, qkv_bias=qkv_bias,
        layer_norm_eps=layer_norm_eps, stages=tuple(stages))


def init_swin_v2_params(key, model: SwinV2Classifier,
                        dtype=jnp.float32) -> Params:
    from .tulip import _block_params, _merge_params
    from ..config import ModelConfig

    class _CfgShim:
        mlp_ratio = model.mlp_ratio
        qkv_bias = model.qkv_bias
        swin_v2 = True

    nested: Dict = {}
    keys = iter(jax.random.split(key, 8 + 4 * sum(model.depths)))
    nested["patch_embed"] = {
        "proj": L.torch_conv_init(next(keys), model.embed_dim, model.in_chans,
                                  model.patch_size, model.patch_size, True,
                                  dtype),
        "norm": L.layer_norm_init(model.embed_dim, dtype)}
    for i, blocks in enumerate(model.stages):
        dim = model.embed_dim * 2 ** i
        sp = {"blocks": {}}
        for j in range(model.depths[i]):
            sp["blocks"][str(j)] = _block_params(
                next(keys), dim, model.num_heads[i],
                model.stages[i][j].window, _CfgShim, dtype)
        if i < len(model.depths) - 1:
            sp["downsample"] = _merge_params(next(keys), dim, True, dtype)
        nested[f"layers.{i}"] = sp
    final_dim = model.embed_dim * 2 ** (len(model.depths) - 1)
    nested["norm"] = L.layer_norm_init(final_dim, dtype)
    nested["head"] = L.torch_linear_trunc_init(next(keys), final_dim,
                                               model.num_classes, True, dtype)
    return _flatten(nested)


def apply_swin_v2(params: Params, model: SwinV2Classifier,
                  x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, C, H, W) -> logits (B, num_classes)."""
    eps = model.layer_norm_eps
    x = jnp.transpose(x, (0, 2, 3, 1))
    x = L.conv2d(params, "patch_embed.proj", x,
                 stride=(model.patch_size, model.patch_size))
    x = L.layer_norm(params, "patch_embed.norm", x, eps)
    for i, blocks in enumerate(model.stages):
        for j, st in enumerate(blocks):
            x = swin_block_v2(params, f"layers.{i}.blocks.{j}", x, st, eps=eps)
        if i < len(model.stages) - 1:
            x = _patch_merging(params, f"layers.{i}.downsample", x,
                               swin_v2=True, eps=eps)
    x = L.layer_norm(params, "norm", x, eps)
    x = jnp.mean(x, axis=(1, 2))          # global average pool
    return L.linear(params, "head", x)
