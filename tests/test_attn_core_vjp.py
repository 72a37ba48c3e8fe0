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

# multi-minute CPU-backend compiles: full-model or full-step jits
pytestmark = pytest.mark.slow


def _xla_natural(qkv4, bias, gmask, nh, scale, perm, nH):
    """Reference math for the natural-layout core: extract (wh, Gww) tiles,
    permute tokens to grouped order, run per-head attention, un-permute."""
    R, wh, W, C3 = qkv4.shape
    C = C3 // 3
    hd = C // nh
    GL = len(perm)
    Gww = GL // wh
    nWg = W // Gww
    inv = np.argsort(perm)
    outs = np.zeros((R, wh, W, C), np.float32)
    qkv_np = np.asarray(qkv4, np.float32)
    bias_np = np.asarray(bias)
    gm_np = np.asarray(gmask, np.float32)
    for r in range(R):
        for wg in range(nWg):
            tile = qkv_np[r, :, wg * Gww:(wg + 1) * Gww, :].reshape(GL, 3 * C)
            tile = tile[inv]                         # grouped order
            q, k, v = tile[:, :C], tile[:, C:2 * C], tile[:, 2 * C:]
            gidx = (r % nH) * nWg + wg if gm_np.shape[0] != 1 else 0
            gm = gm_np[gidx]                         # already grouped order
            o = np.zeros((GL, C), np.float32)
            for h in range(nh):
                qh = q[:, h * hd:(h + 1) * hd]
                kh = k[:, h * hd:(h + 1) * hd]
                vh = v[:, h * hd:(h + 1) * hd]
                lg = qh @ kh.T * scale + bias_np[h] + gm
                lg = lg - lg.max(-1, keepdims=True)
                e = np.exp(lg)
                pr = e / e.sum(-1, keepdims=True)
                o[:, h * hd:(h + 1) * hd] = pr @ vh
            outs[r, :, wg * Gww:(wg + 1) * Gww, :] = o[perm].reshape(
                wh, Gww, C)
    return outs


def _nat_inputs(seed, R, nWg, wh, ww, G, C, nh, per_group_mask, nH):
    from tulip_tpu.ops.pallas.attn_core import natural_token_perm
    GL = wh * ww * G
    W = nWg * (G * ww)
    rng = np.random.default_rng(seed)
    qkv4 = jnp.asarray(rng.standard_normal((R, wh, W, 3 * C)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((nh, GL, GL)).astype(np.float32))
    perm = natural_token_perm(wh, ww, G)
    if per_group_mask:
        nG = nH * nWg
        m = np.where(rng.uniform(size=(nG, GL, GL)) < 0.1, -100.0, 0.0)
        gmask_grp = m.astype(np.float32)
    else:
        gmask_grp = np.zeros((1, GL, GL), np.float32)
    # natural-order mask for the kernel: M_nat[i, j] = M_grp[perm_i, perm_j]
    gmask_nat = gmask_grp[:, perm[:, None], perm[None, :]]
    return qkv4, bias, perm, gmask_grp, jnp.asarray(gmask_nat)


def _core_call(qkv4, bias, gmask_nat, nh, scale, perm, nH):
    GL = len(perm)
    bias_nat = np.asarray(bias)[:, perm[:, None], perm[None, :]]
    bias_cat = jnp.asarray(
        bias_nat.transpose(1, 0, 2).reshape(GL, nh * GL))
    return attn_core(qkv4, bias_cat, gmask_nat, nh, scale, nH)


@pytest.mark.parametrize("per_group_mask", [False, True])
def test_core_forward_matches_xla(per_group_mask):
    nh, C, wh, ww, G = 3, 96, 2, 8, 8
    R, nWg, nH = 4, 2, 2
    qkv4, bias, perm, gmask_grp, gmask_nat = _nat_inputs(
        0, R, nWg, wh, ww, G, C, nh, per_group_mask, nH)
    scale = (C // nh) ** -0.5
    out_p = _core_call(qkv4, bias, gmask_nat, nh, scale, perm, nH)
    out_x = _xla_natural(qkv4, bias, gmask_grp, nh, scale, perm, nH)
    np.testing.assert_allclose(np.asarray(out_p), out_x,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("per_group_mask", [False, True])
@pytest.mark.parametrize("nh,C", [(3, 96), (4, 128)])
def test_core_grads_match_xla(per_group_mask, nh, C):
    """Gradient check against numerical reference via jnp re-implementation
    (token-permuted per-head attention)."""
    wh, ww, G = 2, 8, 8
    R, nWg, nH = 2, 2, 2
    qkv4, bias, perm, gmask_grp, gmask_nat = _nat_inputs(
        1, R, nWg, wh, ww, G, C, nh, per_group_mask, nH)
    scale = (C // nh) ** -0.5
    GL = len(perm)
    cot = jnp.asarray(np.random.default_rng(2).standard_normal(
        qkv4.shape[:3] + (C,)).astype(np.float32))

    def loss_p(qkv4, bias):
        bias_nat = bias[:, jnp.asarray(perm[:, None]),
                        jnp.asarray(perm[None, :])]
        bias_cat = bias_nat.transpose(1, 0, 2).reshape(GL, nh * GL)
        return jnp.sum(attn_core(qkv4, bias_cat, gmask_nat, nh, scale, nH)
                       * cot)

    def loss_x(qkv4, bias):
        # jnp version of _xla_natural (differentiable)
        hd = C // nh
        Gww = G * ww
        W = qkv4.shape[2]
        nWg_ = W // Gww
        inv = np.argsort(perm)
        total = 0.0
        for r in range(qkv4.shape[0]):
            for wg in range(nWg_):
                tile = qkv4[r, :, wg * Gww:(wg + 1) * Gww, :].reshape(
                    GL, 3 * C)[jnp.asarray(inv)]
                q, k, v = tile[:, :C], tile[:, C:2*C], tile[:, 2*C:]
                gidx = (r % nH) * nWg_ + wg if gmask_grp.shape[0] != 1 else 0
                gm = jnp.asarray(gmask_grp[gidx])
                os = []
                for h in range(nh):
                    qh = q[:, h*hd:(h+1)*hd]
                    kh = k[:, h*hd:(h+1)*hd]
                    vh = v[:, h*hd:(h+1)*hd]
                    lg = qh @ kh.T * scale + bias[h] + gm
                    pr = jax.nn.softmax(lg, axis=-1)
                    os.append(pr @ vh)
                o = jnp.concatenate(os, axis=1)[jnp.asarray(perm)]
                total = total + jnp.sum(
                    o.reshape(wh, Gww, C)
                    * cot[r, :, wg * Gww:(wg + 1) * Gww, :])
        return total

    (gq_p, gb_p) = jax.grad(loss_p, argnums=(0, 1))(qkv4, bias)
    (gq_x, gb_x) = jax.grad(loss_x, argnums=(0, 1))(qkv4, bias)
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


def test_block_rng_stream_alignment_across_impls():
    """Every attn_impl must consume the SAME number of rng splits per block:
    the fused-MLP branch burns the split the XLA branch hands to mlp(), so
    stochastic-depth masks are identical across impls.  Regression test for
    a phantom "gradient bug" where pallas-vs-grouped training grads differed
    ~35% purely because downstream drop-path draws diverged."""
    cfg = model_config("tulip_base", img_size=(8, 128),
                       target_img_size=(32, 128), patch_size=(1, 4),
                       window_size=(2, 8))
    stage = cfg.encoder_stages[0]
    rng = np.random.default_rng(11)
    C, nh = stage.dim, stage.num_heads
    table_len = (2 * cfg.window_size[0] - 1) * (2 * cfg.window_size[1] - 1)
    prefix = "blk"
    params = {
        f"{prefix}.norm1.weight": jnp.ones((C,), jnp.float32),
        f"{prefix}.norm1.bias": jnp.zeros((C,), jnp.float32),
        f"{prefix}.norm2.weight": jnp.ones((C,), jnp.float32),
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
    x = jnp.asarray(rng.standard_normal((8, *stage.grid, C)).astype(np.float32))
    # a high drop-path rate so mask divergence is unmissable; two chained
    # blocks so a consumption mismatch in block 1 corrupts block 2's draw
    st0 = S.make_block_static(stage, 0, cfg.window_size)._replace(
        drop_path=0.5)
    st1 = S.make_block_static(stage, 1, cfg.window_size)._replace(
        drop_path=0.5)

    def run(impl):
        key = jax.random.PRNGKey(42)
        k0, k1 = jax.random.split(key)
        y = S.swin_block_v1(params, prefix, x.astype(jnp.bfloat16), st0,
                            eps=1e-6, rng=k0, dropout_active=True,
                            droppath_active=True, attn_impl=impl)
        y = S.swin_block_v1(params, prefix, y, st1, eps=1e-6, rng=k1,
                            dropout_active=True, droppath_active=True,
                            attn_impl=impl)
        return np.asarray(y, np.float32)

    ref = run("grouped")
    for impl in ("xla", "pallas"):
        out = run(impl)
        scale = np.abs(ref).max() + 1e-8
        assert np.abs(out - ref).max() / scale < 0.03, (
            impl, np.abs(out - ref).max(), scale)


def _block_params(rng, C, nh, table_len, prefix="blk"):
    return {
        f"{prefix}.norm1.weight": jnp.asarray(rng.uniform(0.5, 1.5, (C,)).astype(np.float32)),
        f"{prefix}.norm1.bias": jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1),
        f"{prefix}.norm2.weight": jnp.asarray(rng.uniform(0.5, 1.5, (C,)).astype(np.float32)),
        f"{prefix}.norm2.bias": jnp.zeros((C,), jnp.float32),
        f"{prefix}.attn.qkv.weight": jnp.asarray(rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.05),
        f"{prefix}.attn.qkv.bias": jnp.asarray(rng.standard_normal((3 * C,)).astype(np.float32) * 0.05),
        f"{prefix}.attn.proj.weight": jnp.asarray(rng.standard_normal((C, C)).astype(np.float32) * 0.05),
        f"{prefix}.attn.proj.bias": jnp.zeros((C,), jnp.float32),
        f"{prefix}.attn.relative_position_bias_table": jnp.asarray(rng.standard_normal((table_len, nh)).astype(np.float32) * 0.1),
        f"{prefix}.mlp.fc1.weight": jnp.asarray(rng.standard_normal((C, 4 * C)).astype(np.float32) * 0.05),
        f"{prefix}.mlp.fc1.bias": jnp.zeros((4 * C,), jnp.float32),
        f"{prefix}.mlp.fc2.weight": jnp.asarray(rng.standard_normal((4 * C, C)).astype(np.float32) * 0.05),
        f"{prefix}.mlp.fc2.bias": jnp.zeros((C,), jnp.float32),
    }


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
        # 0.08: bf16 accumulation noise on near-zero-mean bias grads
        assert np.abs(a - b).max() / scale < 0.08, (
            key, np.abs(a - b).max(), scale)
