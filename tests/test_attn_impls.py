"""Kernel-impl equivalence: every window-attention implementation must agree
with the reference-shaped 'xla' per-window implementation to float tolerance
(the golden-activation pinning strategy of SURVEY.md 7.2 step 5)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tulip_tpu.config import model_config
from tulip_tpu.models.tulip import apply_model, build_model, init_params

# multi-minute CPU-backend compiles: full-model or full-step jits
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("impl", ["grouped", "pallas"])
@pytest.mark.parametrize("variant,img,target", [
    ("tulip_base", (32, 256), (128, 256)),
    ("tulip_large", (16, 1024), (64, 1024)),   # exercises window fallback
])
def test_impls_match_per_window(variant, img, target, impl):
    """'grouped' (XLA block-diag) and 'pallas' (fused kernels incl. the
    folded ps_head+decoder_pred) must match the reference-shaped per-window
    'xla' implementation."""
    cfg_g = model_config(variant, img_size=img, target_img_size=target,
                         patch_size=(1, 4), window_size=(2, 8),
                         pixel_shuffle=True, circular_padding=True,
                         log_transform=True, patch_unmerging=True,
                         attn_impl=impl)
    cfg_x = dataclasses.replace(cfg_g, attn_impl="xla")
    mg, mx = build_model(cfg_g), build_model(cfg_x)
    params = init_params(jax.random.PRNGKey(0), cfg_g)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 1, *img)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, (2, 1, *target)).astype(np.float32))
    pg, lg, _ = apply_model(params, mg, x, t)
    px, lx, _ = apply_model(params, mx, x, t)
    np.testing.assert_allclose(np.asarray(pg), np.asarray(px), atol=5e-6)
    np.testing.assert_allclose(float(lg), float(lx), atol=1e-6)


def test_bf16_inference_close_to_fp32():
    """bf16 fused inference (tanh GELU, bf16 softmax) must stay within bf16
    tolerance of the fp32 reference path."""
    cfg = model_config("tulip_base", img_size=(16, 256),
                       target_img_size=(64, 256), patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True, attn_impl="pallas")
    model = build_model(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 1, 16, 256)).astype(np.float32))
    p32 = apply_model(params, model, x, None, mode="eval", mc_drop=True,
                      compute_dtype=jnp.float32)
    p16 = apply_model(params, model, x, None, mode="eval", mc_drop=True,
                      compute_dtype=jnp.bfloat16)
    err = np.abs(np.asarray(p16, np.float32) - np.asarray(p32))
    scale = np.abs(np.asarray(p32)).mean() + 1e-6
    assert err.mean() / scale < 0.05, (err.mean(), scale)


def test_msa_nat_flag_matches(monkeypatch):
    """TULIP_TPU_MSA_NAT=1 (natural-layout fused MSA kernel — no partition
    transposes, permuted bias/mask tables) must match the grouped-layout
    fused kernel on the bf16 inference path to bf16 reduction-order noise.
    Exercises shifted + unshifted blocks and the per-group mask addressing
    via the whole-model forward."""
    cfg = model_config("tulip_base", img_size=(16, 256),
                       target_img_size=(64, 256), patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True, attn_impl="pallas")
    model = build_model(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 1, 16, 256)).astype(np.float32))

    monkeypatch.setenv("TULIP_TPU_MSA_NAT", "0")
    p_grp = np.asarray(apply_model(params, model, x, None, mode="eval",
                                   mc_drop=True,
                                   compute_dtype=jnp.bfloat16), np.float32)
    monkeypatch.setenv("TULIP_TPU_MSA_NAT", "1")
    p_nat = np.asarray(apply_model(params, model, x, None, mode="eval",
                                   mc_drop=True,
                                   compute_dtype=jnp.bfloat16), np.float32)
    scale = np.abs(p_grp).max() + 1e-6
    assert np.abs(p_nat - p_grp).max() / scale < 0.01, (
        np.abs(p_nat - p_grp).max(), scale)


def test_group_sizing():
    """Group size adapts to the per-stage grid (<=8 windows, 128 tokens)."""
    from tulip_tpu.models.swin import make_block_static
    from tulip_tpu.config import model_config
    cfg = model_config("tulip_base", img_size=(16, 1024),
                       target_img_size=(64, 1024), patch_size=(1, 4),
                       window_size=(2, 8))
    for stage in cfg.encoder_stages:
        st = make_block_static(stage, 0, cfg.window_size)
        n_w = stage.grid[1] // stage.window[1]
        assert st.group <= 8 and n_w % st.group == 0
        assert st.group * stage.window[0] * stage.window[1] <= 128
