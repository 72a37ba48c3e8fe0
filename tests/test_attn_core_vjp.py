"""Differentiable Pallas attention core (ops/pallas/attn_core.py): forward
and custom-VJP gradients must match the XLA grouped implementation.

Runs in interpret mode on the CPU test backend; the kernel math is backend-
independent (fp32 dots via preferred_element_type), so agreement here pins
the TPU behavior too (same pinning strategy as test_attn_impls.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tulip_tpu.config import model_config
from tulip_tpu.models import swin as S
from tulip_tpu.ops.pallas.attn_core import attn_core


def _xla_core(qkv, bias, gmask, nh, scale):
    """Reference math on the same (Bg, GL, 3C) layout."""
    Bg, GL, C3 = qkv.shape
    C = C3 // 3
    hd = C // nh
    qkv_ = qkv.reshape(Bg, GL, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv_[0], qkv_[1], qkv_[2]
    attn = jnp.einsum("bnld,bnmd->bnlm", q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None]
    if gmask.shape[0] == 1:
        attn = attn + gmask[0][None, None]
    else:
        nG = gmask.shape[0]
        attn = attn.reshape(Bg // nG, nG, nh, GL, GL) + gmask[None, :, None]
        attn = attn.reshape(Bg, nh, GL, GL)
    pr = jax.nn.softmax(attn, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bnlm,bnmd->bnld", pr, v)
    return out.transpose(0, 2, 1, 3).reshape(Bg, GL, C)


def _rand_inputs(seed, Bg, GL, C, nh, per_group_mask):
    rng = np.random.default_rng(seed)
    qkv = jnp.asarray(rng.standard_normal((Bg, GL, 3 * C)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((nh, GL, GL)).astype(np.float32))
    if per_group_mask:
        nG = Bg // 2
        m = np.where(rng.uniform(size=(nG, GL, GL)) < 0.1, -100.0, 0.0)
        gmask = jnp.asarray(m.astype(np.float32))
    else:
        gmask = jnp.zeros((1, GL, GL), jnp.float32)
    return qkv, bias, gmask


@pytest.mark.parametrize("per_group_mask", [False, True])
def test_core_forward_matches_xla(per_group_mask):
    nh, C, GL, Bg = 3, 96, 128, 8
    qkv, bias, gmask = _rand_inputs(0, Bg, GL, C, nh, per_group_mask)
    scale = (C // nh) ** -0.5
    out_p = attn_core(qkv, bias, gmask, nh, scale)
    out_x = _xla_core(qkv, bias, gmask, nh, scale)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("per_group_mask", [False, True])
@pytest.mark.parametrize("nh,C", [(3, 96), (4, 128)])
def test_core_grads_match_xla(per_group_mask, nh, C):
    GL, Bg = 128, 4
    qkv, bias, gmask = _rand_inputs(1, Bg, GL, C, nh, per_group_mask)
    scale = (C // nh) ** -0.5
    cot = jnp.asarray(np.random.default_rng(2).standard_normal(
        (Bg, GL, C)).astype(np.float32))

    def loss_p(qkv, bias):
        return jnp.sum(attn_core(qkv, bias, gmask, nh, scale) * cot)

    def loss_x(qkv, bias):
        return jnp.sum(_xla_core(qkv, bias, gmask, nh, scale) * cot)

    (gq_p, gb_p) = jax.grad(loss_p, argnums=(0, 1))(qkv, bias)
    (gq_x, gb_x) = jax.grad(loss_x, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(gq_p), np.asarray(gq_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_x),
                               rtol=1e-4, atol=1e-4)


def test_block_train_grads_pallas_vs_grouped():
    """Full swin-block training gradients (drop-path inactive rates, fp32):
    attn_impl='pallas' (attention-core VJP) vs 'grouped' (XLA autodiff)."""
    cfg = model_config("tulip_base", img_size=(8, 128),
                       target_img_size=(32, 128), patch_size=(1, 4),
                       window_size=(2, 8))
    stage = cfg.encoder_stages[0]
    params = {}
    rng = np.random.default_rng(3)
    C = stage.dim
    nh = stage.num_heads
    table_len = (2 * cfg.window_size[0] - 1) * (2 * cfg.window_size[1] - 1)
    prefix = "blk"
    params[f"{prefix}.norm1.weight"] = jnp.asarray(
        rng.uniform(0.5, 1.5, (C,)).astype(np.float32))
    params[f"{prefix}.norm1.bias"] = jnp.asarray(
        rng.standard_normal((C,)).astype(np.float32) * 0.1)
    params[f"{prefix}.norm2.weight"] = jnp.asarray(
        rng.uniform(0.5, 1.5, (C,)).astype(np.float32))
    params[f"{prefix}.norm2.bias"] = jnp.asarray(
        rng.standard_normal((C,)).astype(np.float32) * 0.1)
    params[f"{prefix}.attn.qkv.weight"] = jnp.asarray(
        rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.05)
    params[f"{prefix}.attn.qkv.bias"] = jnp.asarray(
        rng.standard_normal((3 * C,)).astype(np.float32) * 0.05)
    params[f"{prefix}.attn.proj.weight"] = jnp.asarray(
        rng.standard_normal((C, C)).astype(np.float32) * 0.05)
    params[f"{prefix}.attn.proj.bias"] = jnp.asarray(
        rng.standard_normal((C,)).astype(np.float32) * 0.05)
    params[f"{prefix}.attn.relative_position_bias_table"] = jnp.asarray(
        rng.standard_normal((table_len, nh)).astype(np.float32) * 0.1)
    params[f"{prefix}.mlp.fc1.weight"] = jnp.asarray(
        rng.standard_normal((C, 4 * C)).astype(np.float32) * 0.05)
    params[f"{prefix}.mlp.fc1.bias"] = jnp.zeros((4 * C,), jnp.float32)
    params[f"{prefix}.mlp.fc2.weight"] = jnp.asarray(
        rng.standard_normal((4 * C, C)).astype(np.float32) * 0.05)
    params[f"{prefix}.mlp.fc2.bias"] = jnp.zeros((C,), jnp.float32)

    x = jnp.asarray(rng.standard_normal(
        (2, *stage.grid, C)).astype(np.float32))

    for block_idx in (0, 1):   # unshifted and shifted (mask) variants
        st = S.make_block_static(stage, block_idx, cfg.window_size)

        def loss(p, impl):
            y = S.swin_block_v1(p, prefix, x, st, eps=1e-6,
                                attn_impl=impl)
            return jnp.sum(y ** 2)

        g_p = jax.grad(lambda p: loss(p, "pallas"))(params)
        g_x = jax.grad(lambda p: loss(p, "grouped"))(params)
        for key in params:
            np.testing.assert_allclose(
                np.asarray(g_p[key]), np.asarray(g_x[key]),
                rtol=2e-4, atol=2e-4, err_msg=f"block {block_idx}: {key}")


def test_fused_two_matmul_vjp_grads():
    """fused_two_matmul_vjp (Pallas fwd / recompute bwd) gradients must match
    autodiff of the plain XLA composition, fp32 exact (leaky + gelu paths,
    with and without fused LN)."""
    from tulip_tpu.ops.pallas.mlp import fused_two_matmul_vjp, _xla_two_matmul
    rng = np.random.default_rng(0)
    N, C, H = 256, 96, 384
    x = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))
    lnw = jnp.asarray(rng.uniform(0.5, 1.5, (1, C)).astype(np.float32))
    lnb = jnp.asarray(rng.standard_normal((1, C)).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.standard_normal((C, H)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.standard_normal((H, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal((1, C)).astype(np.float32) * 0.05)

    for act, fuse_ln, residual in (("gelu", True, False), ("leaky", False, False),
                                   ("gelu", True, True)):
        def loss_p(*a):
            return jnp.sum(fused_two_matmul_vjp(*a, 1e-6, act, fuse_ln,
                                                residual) ** 2)

        def loss_x(*a):
            return jnp.sum(_xla_two_matmul(*a, eps=1e-6, act=act,
                                           fuse_ln=fuse_ln,
                                           residual=residual) ** 2)

        args = (x, lnw, lnb, w1, b1, w2, b2)
        gp = jax.grad(loss_p, argnums=tuple(range(7)))(*args)
        gx = jax.grad(loss_x, argnums=tuple(range(7)))(*args)
        for i, (a, b) in enumerate(zip(gp, gx)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=f"{act}/{fuse_ln}/{residual} arg{i}")


def test_block_train_grads_bf16_fused_vs_xla():
    """bf16 training block: the fused-kernel branches (attention core VJP +
    fused MLP VJP) must stay within bf16 tolerance of the grouped XLA path."""
    cfg = model_config("tulip_base", img_size=(8, 128),
                       target_img_size=(32, 128), patch_size=(1, 4),
                       window_size=(2, 8))
    stage = cfg.encoder_stages[0]
    rng = np.random.default_rng(5)
    C, nh = stage.dim, stage.num_heads
    table_len = (2 * cfg.window_size[0] - 1) * (2 * cfg.window_size[1] - 1)
    prefix = "blk"
    params = {
        f"{prefix}.norm1.weight": jnp.asarray(rng.uniform(0.5, 1.5, (C,)).astype(np.float32)),
        f"{prefix}.norm1.bias": jnp.zeros((C,), jnp.float32),
        f"{prefix}.norm2.weight": jnp.asarray(rng.uniform(0.5, 1.5, (C,)).astype(np.float32)),
        f"{prefix}.norm2.bias": jnp.zeros((C,), jnp.float32),
        f"{prefix}.attn.qkv.weight": jnp.asarray(rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.05),
        f"{prefix}.attn.qkv.bias": jnp.zeros((3 * C,), jnp.float32),
        f"{prefix}.attn.proj.weight": jnp.asarray(rng.standard_normal((C, C)).astype(np.float32) * 0.05),
        f"{prefix}.attn.proj.bias": jnp.zeros((C,), jnp.float32),
        f"{prefix}.attn.relative_position_bias_table": jnp.asarray(rng.standard_normal((table_len, nh)).astype(np.float32) * 0.1),
        f"{prefix}.mlp.fc1.weight": jnp.asarray(rng.standard_normal((C, 4 * C)).astype(np.float32) * 0.05),
        f"{prefix}.mlp.fc1.bias": jnp.zeros((4 * C,), jnp.float32),
        f"{prefix}.mlp.fc2.weight": jnp.asarray(rng.standard_normal((4 * C, C)).astype(np.float32) * 0.05),
        f"{prefix}.mlp.fc2.bias": jnp.zeros((C,), jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((2, *stage.grid, C)).astype(np.float32))
    st = S.make_block_static(stage, 1, cfg.window_size)   # shifted

    def loss(p, impl):
        # droppath_active=True (training semantics) with rng=None: the
        # stochastic mask is inactive but the block takes the training
        # branches (fused inference kernels have no VJP and are gated off)
        y = S.swin_block_v1(p, prefix, x.astype(jnp.bfloat16), st, eps=1e-6,
                            attn_impl=impl, droppath_active=True)
        return jnp.mean(y.astype(jnp.float32) ** 2)

    g_p = jax.grad(lambda p: loss(p, "pallas"))(params)
    g_x = jax.grad(lambda p: loss(p, "grouped"))(params)
    for key in params:
        a, b = np.asarray(g_p[key]), np.asarray(g_x[key])
        scale = np.abs(b).max() + 1e-8
        assert np.abs(a - b).max() / scale < 0.05, (
            key, np.abs(a - b).max(), scale)
