"""Coverage for the auxiliary utils (reference parity of the 'dead-code'
API surface: lars, lr_decay, pos_embed, filter, crop, profiler)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_lars_step_moves_weights_with_trust_ratio():
    from tulip_tpu.utils.lars import lars
    tx = lars(learning_rate=0.1, weight_decay=1e-4, momentum=0.9)
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    grads = {"w": jnp.full((4, 4), 0.5), "b": jnp.full((4,), 0.5)}
    state = tx.init(params)
    updates, state = tx.update(grads, state, params)
    # weight update scaled by trust ratio; bias update plain momentum*lr
    assert np.all(np.asarray(updates["w"]) < 0)
    np.testing.assert_allclose(np.asarray(updates["b"]),
                               -0.1 * (0.5 + 1e-4 * 1.0), rtol=1e-5)
    # trust ratio = tc * ||p|| / ||g+wd p||: |update_w| << |update_b|
    assert np.abs(np.asarray(updates["w"])).max() < np.abs(
        np.asarray(updates["b"])).max()


def test_lr_decay_layer_ids_and_scales():
    from tulip_tpu.utils.lr_decay import get_layer_id, lr_scale_tree
    assert get_layer_id("patch_embed.proj.weight", 4) == 0
    assert get_layer_id("layers.2.blocks.0.attn.qkv.weight", 4) == 3
    assert get_layer_id("norm_up.weight", 4) == 4
    params = {"patch_embed.proj.weight": 1, "layers.0.blocks.0.mlp.fc1.weight": 1,
              "decoder_pred.weight": 1}
    scales = lr_scale_tree(params, 4, layer_decay=0.5)
    assert scales["decoder_pred.weight"] == 1.0
    assert scales["patch_embed.proj.weight"] == 0.5 ** 4


def test_sincos_pos_embed_shapes_and_interpolation():
    from tulip_tpu.utils.pos_embed import (get_2d_sincos_pos_embed,
                                           interpolate_pos_embed)
    pe = get_2d_sincos_pos_embed(64, (4, 8), cls_token=True)
    assert pe.shape == (1 + 32, 64)
    resized = interpolate_pos_embed(pe[None], (8, 16), (4, 8),
                                    num_extra_tokens=1)
    assert resized.shape == (1, 1 + 128, 64)
    # corner values preserved by bilinear resize
    np.testing.assert_allclose(resized[0, 1], pe[1], atol=1e-6)


def test_sobel_filters_detect_edges():
    from tulip_tpu.utils.filter import horizontal_edges, vertical_edges
    img = np.zeros((1, 1, 8, 8), np.float32)
    img[:, :, 4:, :] = 1.0      # horizontal edge at row 4
    h = np.asarray(horizontal_edges(jnp.asarray(img)))
    v = np.asarray(vertical_edges(jnp.asarray(img)))
    assert np.abs(h[0, 0, 3:5, 2:6]).max() > 1.0
    assert np.abs(v[0, 0, :, 2:6]).max() < 1e-5


def test_random_resized_crop_shape():
    from tulip_tpu.utils.crop import RandomResizedCrop
    np.random.seed(0)
    t = RandomResizedCrop((16, 32))
    out = t(np.random.rand(1, 64, 128).astype(np.float32))
    assert out.shape == (1, 16, 32)


def test_device_memory_stats_keys():
    from tulip_tpu.utils.profiler import device_memory_stats
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_profiler_trace_writes(tmp_path):
    from tulip_tpu.utils.profiler import trace
    with trace(str(tmp_path / "prof")):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    import os
    assert os.path.isdir(tmp_path / "prof")


def test_initialize_decoder_weights_matches_reference(reference_tulip):
    """Behavioral parity of the dead enc<-dec key-transplant helper
    (reference: tulip/util/misc.py:218-249) on a synthetic state dict."""
    import sys
    sys.path.insert(0, "tests")
    from test_engine_parity import _install_engine_stubs
    _install_engine_stubs()
    import util.misc as ref_misc

    def make_sd():
        keys = []
        for i in range(3):
            keys += [f"layers.{i}.blocks.0.attn.qkv.weight",
                     f"layers.{i}.downsample.reduction.weight",
                     f"layers_up.{i}.blocks.0.attn.qkv.weight"]
        keys += ["layers_up.0.upsample.expand.weight",
                 "layers_up.1.upsample.expand.weight",
                 "patch_embed.proj.weight", "norm_up.weight",
                 # NB 'skip_connection_layers.0' would itself match the
                 # 'layers.0' substring remap and KeyError in the reference
                 # too; use an index outside 0-2 for the happy path
                 "decoder_pred.weight", "skip_connection_layers.4.weight",
                 "first_patch_expanding.expand.weight", "layers.3.blocks.0.x"]
        return {k: i for i, k in enumerate(keys)}

    from tulip_tpu.utils.checkpoint import initialize_decoder_weights
    ours = make_sd()
    theirs = make_sd()
    # layers.i.downsample -> layers_up.j.upsample.reduction never exists in a
    # real TULIP state dict (upsample keys are .expand), so the reference
    # KeyErrors on those; drop them to exercise the happy path both sides.
    for sd in (ours, theirs):
        for i in range(3):
            del sd[f"layers.{i}.downsample.reduction.weight"]
    out_ours = initialize_decoder_weights(ours)
    out_theirs = ref_misc.initialize_decoder_weights(theirs)
    assert out_ours == out_theirs
