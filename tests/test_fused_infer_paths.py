"""Pinning of the round-3 inference fast path against its XLA twin:
natural-layout masked-head MSA (the default for small-nh stages since r3:
ops/pallas/window_msa._kernel_masked_nat) vs the grouped-layout path
(TULIP_TPU_MSA_GROUPED=1), at the fused-half-block level so the RB
row-strip batching, the per-group shift masks and the bias permutation
are all exercised.

Env flags are trace-time: the jit cache is cleared between variants
(see test_msa_masked.py note).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tulip_tpu.models import swin as S
from tulip_tpu.models.layers import (relative_position_index,
                                     shift_attention_mask)


def _block_params(rng, C, prefix="b"):
    f32 = np.float32
    return {
        f"{prefix}.norm1.weight": jnp.asarray(rng.normal(1, 0.1, (C,)).astype(f32)),
        f"{prefix}.norm1.bias": jnp.asarray(rng.normal(0, 0.1, (C,)).astype(f32)),
        f"{prefix}.attn.qkv.weight": jnp.asarray((rng.normal(size=(C, 3 * C)) * 0.05).astype(f32)),
        f"{prefix}.attn.qkv.bias": jnp.asarray((rng.normal(size=(3 * C,)) * 0.05).astype(f32)),
        f"{prefix}.attn.proj.weight": jnp.asarray((rng.normal(size=(C, C)) * 0.05).astype(f32)),
        f"{prefix}.attn.proj.bias": jnp.asarray((rng.normal(size=(C,)) * 0.05).astype(f32)),
        f"{prefix}.attn.relative_position_bias_table": jnp.asarray(
            (rng.normal(size=(45, C // 32)) * 0.1).astype(f32)),
    }


def _make_static(H, W, C, shifted):
    """Build BlockStatic the way the model does (via _grouped_statics)."""
    window = (2, 8)
    shift = (1, 4) if shifted else (0, 0)
    mask = shift_attention_mask((H, W), window, shift) if shifted else None
    group, win_token, group_mask = S._grouped_statics((H, W), window, shift,
                                                      mask)
    return S.BlockStatic(grid=(H, W), window=window, shift=shift,
                         num_heads=C // 32,
                         rel_index=relative_position_index(window),
                         mask=mask, drop_path=0.0, group=group,
                         win_token=win_token, group_mask=group_mask)


@pytest.mark.parametrize("B,H,W,C,shifted", [
    (2, 32, 512, 96, False),     # stage-0 geometry, unshifted
    (2, 32, 512, 96, True),      # stage-0, shifted (per-group masks + RB)
    (1, 16, 256, 192, True),     # stage-1, shifted
])
def test_msa_nat_matches_grouped(monkeypatch, B, H, W, C, shifted):
    rng = np.random.default_rng(0)
    p = _block_params(rng, C)
    st = _make_static(H, W, C, shifted)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def run():
        jax.clear_caches()
        return np.asarray(
            S.fused_half_block_pallas(p, "b", x, st, 1e-6), np.float32)

    monkeypatch.setenv("TULIP_TPU_MSA_GROUPED", "1")
    ref = run()
    monkeypatch.delenv("TULIP_TPU_MSA_GROUPED")
    out = run()    # default: nat-masked for nh <= 8
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / denom < 0.02


@pytest.mark.parametrize("B,H,W,C,frame,shifted", [
    (2, 32, 512, 96, (0, 0), True),    # frame change 0 -> shift (halo +1)
    (2, 32, 512, 96, (1, 4), False),   # frame change shift -> 0 (halo -1)
    (1, 16, 256, 192, (0, 0), True),   # stage-1 geometry
    (2, 32, 512, 96, (0, 0), False),   # trivial frame (no roll at all)
])
def test_half_block_frame_threaded_matches_rolls(B, H, W, C, frame, shifted):
    """Frame-threaded halo mode (in-kernel roll assembly, r4) must be
    bit-identical to the self-contained path: out_threaded ==
    roll_hw(out_plain, -sh, -sw) rolled back by the returned frame."""
    from tulip_tpu.parallel.halo import roll_hw
    rng = np.random.default_rng(1)
    p = _block_params(rng, C)
    st = _make_static(H, W, C, shifted)
    x_true = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
                         ).astype(jnp.bfloat16)
    storage = roll_hw(x_true, -frame[0], -frame[1])

    plain = S.fused_half_block_pallas(p, "b", x_true, st, 1e-6)
    out, of = S.fused_half_block_pallas(p, "b", storage, st, 1e-6,
                                        frame=frame)
    back = roll_hw(out, of[0], of[1])
    d = np.abs(np.asarray(back, np.float32) - np.asarray(plain, np.float32))
    assert d.max() == 0.0, d.max()


@pytest.mark.slow
def test_model_frame_threading_matches_rolls(monkeypatch):
    """Full-model: the frame-threaded stage loops (tulip._run_blocks) must
    be bit-identical to self-contained blocks (TULIP_TPU_NO_HALO=1)."""
    from tulip_tpu.config import model_config
    from tulip_tpu.models.tulip import apply_model, build_model, init_params

    cfg = model_config("tulip_base", img_size=(32, 256),
                       target_img_size=(128, 256), patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True, attn_impl="pallas")
    model = build_model(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 1, 32, 256)).astype(np.float32))

    def fwd():
        jax.clear_caches()
        pred = apply_model(params, model, x, None, mode="mc", mc_drop=True,
                           compute_dtype=jnp.bfloat16)
        return np.asarray(pred.astype(jnp.float32))

    monkeypatch.setenv("TULIP_TPU_NO_HALO", "1")
    a = fwd()
    monkeypatch.delenv("TULIP_TPU_NO_HALO")
    b = fwd()
    assert np.abs(a - b).max() == 0.0
