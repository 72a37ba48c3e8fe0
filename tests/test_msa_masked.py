"""Kernel-level pinning of the masked-head inference MSA core against the
head-peel core (ops/pallas/window_msa.py): per-head logits via
(q * mask_h) @ k^T over full channel width must be EXACT — cross-head
products are fp zeros, so accumulation order is unchanged.  Fast lane:
direct kernel calls in interpret mode, no model compiles."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tulip_tpu.ops.pallas import window_msa as W


def _rand_case(rng, B, nG, GL, C, nh, per_group):
    x = jnp.asarray(rng.normal(size=(B, nG, GL, C)).astype(np.float32))
    lnw = jnp.asarray(rng.normal(size=(1, C)).astype(np.float32))
    lnb = jnp.asarray(rng.normal(size=(1, C)).astype(np.float32))
    wqkv = jnp.asarray((rng.normal(size=(C, 3 * C)) * 0.05).astype(np.float32))
    bqkv = jnp.asarray((rng.normal(size=(1, 3 * C)) * 0.05).astype(np.float32))
    wproj = jnp.asarray((rng.normal(size=(C, C)) * 0.05).astype(np.float32))
    bproj = jnp.asarray((rng.normal(size=(1, C)) * 0.05).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nh, GL, GL)).astype(np.float32))
    gm = jnp.asarray(
        (rng.normal(size=((nG if per_group else 1), GL, GL)) * 0.1)
        .astype(np.float32))
    return x, lnw, lnb, wqkv, bqkv, wproj, bproj, bias, gm


# stage-0..3 head/channel shapes of tulip_base plus a per-group-mask case
@pytest.mark.parametrize("B,nG,GL,C,nh,per_group", [
    (2, 64, 16, 96, 3, False),
    (1, 32, 16, 192, 6, True),
    (2, 16, 16, 384, 12, False),
])
def test_masked_core_matches_peel(monkeypatch, B, nG, GL, C, nh, per_group):
    rng = np.random.default_rng(0)
    args = _rand_case(rng, B, nG, GL, C, nh, per_group)
    scale = 1.0 / np.sqrt(C // nh)

    monkeypatch.setenv("TULIP_TPU_MSA_MASKED", "0")
    ref = W.fused_window_msa(*args, nh=nh, scale_inv_sqrt_hd=scale)
    monkeypatch.setenv("TULIP_TPU_MSA_MASKED", "99")
    got = W.fused_window_msa(*args, nh=nh, scale_inv_sqrt_hd=scale)
    err = float(jnp.max(jnp.abs(ref - got)))
    assert err < 2e-5, err


def test_masked_core_bf16(monkeypatch):
    """bf16 activations (the production inference dtype) stay within bf16
    reduction-order noise of the peel core."""
    rng = np.random.default_rng(1)
    args = _rand_case(rng, 2, 32, 16, 96, 3, False)
    args = tuple(a.astype(jnp.bfloat16) if a.ndim == 4 else a for a in args)
    scale = 1.0 / np.sqrt(96 // 3)
    monkeypatch.setenv("TULIP_TPU_MSA_MASKED", "0")
    ref = np.asarray(W.fused_window_msa(*args, nh=3,
                                        scale_inv_sqrt_hd=scale), np.float32)
    monkeypatch.setenv("TULIP_TPU_MSA_MASKED", "99")
    got = np.asarray(W.fused_window_msa(*args, nh=3,
                                        scale_inv_sqrt_hd=scale), np.float32)
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / denom < 0.02


def test_masked_cutover_env():
    assert W._use_masked(3)
    assert W._use_masked(8)
    assert not W._use_masked(12)
