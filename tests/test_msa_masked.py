"""Kernel-level pinning of the masked-head inference MSA cores against the
head-peel core (ops/pallas/window_msa.py): per-head logits via
(q * mask_h) @ k^T over full channel width must be EXACT — cross-head
products are fp zeros, so accumulation order is unchanged.

NB: fused_window_msa is module-level-jitted and the variant flags are read
at TRACE time, so the jit cache MUST be cleared between variants — a plain
env flip silently returns the cached kernel (same shapes -> same cache key)
and the comparison becomes a self-comparison."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tulip_tpu.ops.pallas import window_msa as W

PEEL = {"TULIP_TPU_MSA_MASKED": "0"}
MASKED = {"TULIP_TPU_MSA_MASKED": "99"}


def _rand_case(rng, B, nG, GL, C, nh, per_group, dtype=np.float32):
    x = jnp.asarray(rng.normal(size=(B, nG, GL, C)).astype(dtype))
    lnw = jnp.asarray(rng.normal(size=(1, C)).astype(dtype))
    lnb = jnp.asarray(rng.normal(size=(1, C)).astype(dtype))
    wqkv = jnp.asarray((rng.normal(size=(C, 3 * C)) * 0.05).astype(dtype))
    bqkv = jnp.asarray((rng.normal(size=(1, 3 * C)) * 0.05).astype(dtype))
    wproj = jnp.asarray((rng.normal(size=(C, C)) * 0.05).astype(dtype))
    bproj = jnp.asarray((rng.normal(size=(1, C)) * 0.05).astype(dtype))
    bias = jnp.asarray(rng.normal(size=(nh, GL, GL)).astype(np.float32))
    gm = jnp.asarray(
        (rng.normal(size=((nG if per_group else 1), GL, GL)) * 0.1)
        .astype(np.float32))
    return x, lnw, lnb, wqkv, bqkv, wproj, bproj, bias, gm


def _run(monkeypatch, flags, args, nh, scale):
    for k, v in flags.items():
        monkeypatch.setenv(k, v)
    jax.clear_caches()   # flags are trace-time: bust the jit cache
    return np.asarray(
        W.fused_window_msa(*args, nh=nh, scale_inv_sqrt_hd=scale),
        np.float32)


# stage-0/1 head/channel shapes of tulip_base, a per-group-mask case, and a
# full grouped-GL=128 stage-0 case
@pytest.mark.parametrize("B,nG,GL,C,nh,per_group", [
    (2, 64, 16, 96, 3, False),
    (1, 32, 16, 192, 6, True),
    (2, 8, 128, 96, 3, False),
])
def test_masked_cores_match_peel(monkeypatch, B, nG, GL, C, nh, per_group):
    rng = np.random.default_rng(0)
    args = _rand_case(rng, B, nG, GL, C, nh, per_group)
    scale = 1.0 / np.sqrt(C // nh)
    peel = _run(monkeypatch, PEEL, args, nh, scale)
    masked = _run(monkeypatch, MASKED, args, nh, scale)
    assert np.abs(peel - masked).max() < 2e-5


def test_masked_core_bf16(monkeypatch):
    """bf16 activations (the production inference dtype) stay within bf16
    reduction-order noise of the peel core."""
    rng = np.random.default_rng(1)
    args = _rand_case(rng, 2, 32, 16, 96, 3, False)
    args = tuple(a.astype(jnp.bfloat16) if a.ndim == 4 else a for a in args)
    scale = 1.0 / np.sqrt(96 // 3)
    peel = _run(monkeypatch, PEEL, args, 3, scale)
    masked = _run(monkeypatch, MASKED, args, 3, scale)
    denom = np.abs(peel).max() + 1e-6
    assert np.abs(masked - peel).max() / denom < 0.02


def test_masked_cutover_env():
    assert W._use_masked(3)
    assert W._use_masked(8)
    assert not W._use_masked(12)
