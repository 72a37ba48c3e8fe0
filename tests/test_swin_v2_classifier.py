"""Swin-v2 classifier tests.

NOTE: the reference's own SwinTransformerV2.forward is unrunnable — its
PatchEmbed flattens to (B, L, C) while its blocks/merging were rewritten for
TULIP's 4-D (B, H, W, C) layout (swin_transformer_v2.py:46 unpacks 4 dims).
So full-model parity is checked against a manual 4-D composition of the
reference modules (patch conv -> blocks -> merge -> norm -> pool -> head),
which is what the classifier computes when its layout bug is fixed.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tulip_tpu.models.swin_v2_classifier import (
    apply_swin_v2, build_swin_v2, init_swin_v2_params,
)
from tulip_tpu.utils.checkpoint import import_torch_state_dict


def test_swin_v2_classifier_parity(reference_tulip):
    import torch
    import model.swin_transformer_v2 as ref_v2
    torch.manual_seed(0)
    kw = dict(img_size=64, patch_size=4, in_chans=3, num_classes=10,
              embed_dim=48, depths=(2, 2), num_heads=(3, 6), window_size=4,
              mlp_ratio=4.0, qkv_bias=True, drop_path_rate=0.0, ape=False,
              patch_norm=True)
    ref = ref_v2.SwinTransformerV2(**kw)
    ref.eval()

    model = build_swin_v2(img_size=(64, 64), patch_size=4, in_chans=3,
                          num_classes=10, embed_dim=48, depths=(2, 2),
                          num_heads=(3, 6), window_size=4,
                          drop_path_rate=0.0)
    params = {k: jnp.asarray(v) for k, v in
              import_torch_state_dict(ref.state_dict(),
                                      legacy_remap=False).items()}
    # drop the (unused here) absolute-pos / unreferenced extras if any
    ours_init = init_swin_v2_params(jax.random.PRNGKey(0), model)
    assert set(ours_init) == set(params), sorted(set(ours_init) ^ set(params))[:8]

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)

    # manual 4-D composition of the reference modules
    with torch.no_grad():
        t = ref.patch_embed.proj(torch.from_numpy(x))      # (B, C, H', W')
        t = t.permute(0, 2, 3, 1)                          # (B, H', W', C)
        t = ref.patch_embed.norm(t)
        for layer in ref.layers:
            for blk in layer.blocks:
                t = blk(t)
            if layer.downsample is not None:
                t = layer.downsample(t)
        t = ref.norm(t)
        t = t.mean(dim=(1, 2))
        ref_out = ref.head(t).numpy()

    with jax.default_matmul_precision("highest"):
        ours = apply_swin_v2(params, model, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=5e-5, rtol=1e-4)


def test_swin_v2_classifier_jits():
    model = build_swin_v2(img_size=(32, 32), patch_size=4, in_chans=3,
                          num_classes=5, embed_dim=48, depths=(2, 2),
                          num_heads=(3, 6), window_size=4)
    params = init_swin_v2_params(jax.random.PRNGKey(0), model)
    x = jnp.zeros((2, 3, 32, 32))
    logits = jax.jit(lambda p, x: apply_swin_v2(p, model, x))(params, x)
    assert logits.shape == (2, 5)
    assert np.all(np.isfinite(np.asarray(logits)))