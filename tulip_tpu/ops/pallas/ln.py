"""Pallas LayerNorm with a custom VJP — a layout anchor for the training
path.

Numerically this is exactly models/layers.layer_norm (fp32 mean/var/affine,
cast back to the input dtype; reference semantics torch LayerNorm eps=1e-6,
tulip/model/tulip.py:744).  The reason it exists is PERFORMANCE OF THE OPS
AROUND IT, not the LN itself: XLA:TPU's layout assignment prefers W-minor
``{2,3,1,0}`` layouts for the LN forward/backward reduction fusions (C=96 is
not a multiple of the 128-lane register, so a C-minor reduce wastes 25% of
the lanes), while every Pallas custom call in the block chain pins its
operands/results to row-major ``{3,2,1,0}``.  The result is a relayout copy
on both sides of every XLA LayerNorm in the train step — measured 6.5 ms of
pure copies per batch-16 step (trace_breakdown, v5e), on top of the LN
fusions themselves.  Running the LN as a row-major Pallas kernel removes
both: one fused mean/var/affine pass forward, one recompute pass backward,
with dgamma/dbeta accumulated in fp32 across grid steps.

Used for the block norm1 in the bf16 pallas training path
(models/swin.swin_block_v1); revert flag TULIP_TPU_LN_XLA=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile(N: int, C: int, n_f32_bufs: int, budget_bytes: int) -> int:
    """Largest power-of-two row tile dividing N whose fp32 working set
    (n_f32_bufs buffers of (T, C)) fits the budget."""
    per_row = C * 4 * n_f32_bufs
    T = max(8, budget_bytes // per_row)
    T = 1 << (T.bit_length() - 1)
    T = min(T, 8192, N)
    while N % T:
        T //= 2
    return max(T, 1)


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref, *, eps: float):
    x32 = x_ref[:].astype(jnp.float32)                      # (T, C)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * w_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _bwd_kernel(x_ref, w_ref, g_ref, dx_ref, dw_ref, db_ref, *, eps: float):
    x32 = x_ref[:].astype(jnp.float32)                      # (T, C)
    C = x32.shape[1]
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xh = (x32 - mean) * rstd                                # (T, C)

    g32 = g_ref[:].astype(jnp.float32)                      # (T, C)
    dw = jnp.sum(g32 * xh, axis=0, keepdims=True)           # (1, C)
    db = jnp.sum(g32, axis=0, keepdims=True)

    dxh = g32 * w_ref[0].astype(jnp.float32)
    m1 = jnp.sum(dxh, axis=-1, keepdims=True) * (1.0 / C)
    m2 = jnp.sum(dxh * xh, axis=-1, keepdims=True) * (1.0 / C)
    dx = rstd * (dxh - m1 - xh * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = dw
        db_ref[:] = db

    @pl.when(pl.program_id(0) > 0)
    def _():
        dw_ref[:] = dw_ref[:] + dw
        db_ref[:] = db_ref[:] + db


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_fwd_pallas(x2d, w, b, *, eps: float, interpret: bool = False):
    N, C = x2d.shape
    interpret = interpret or jax.default_backend() == "cpu"
    T = _tile(N, C, 2, 4 << 20)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(N // T,),
        in_specs=[
            pl.BlockSpec((T, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), x2d.dtype),
        interpret=interpret,
    )(x2d, w, b)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_bwd_pallas(x2d, w, g, *, eps: float, interpret: bool = False):
    N, C = x2d.shape
    interpret = interpret or jax.default_backend() == "cpu"
    # x32, xh, g32, dxh, dx working buffers; 4 MB budget — Mosaic's scoped
    # stack holds ~2x the analytic set (T=4096 at C=96 measured 16.9M > the
    # 16M limit), so T=2048 at C=96 lands ~8.5M
    T = _tile(N, C, 5, 4 << 20)
    dx, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(N // T,),
        in_specs=[
            pl.BlockSpec((T, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, C), x2d.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=interpret,
    )(x2d, w, g)
    return dx, dw, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_vjp(x2d, w, b, eps: float):
    """LayerNorm over the last dim of (N, C) tokens, Pallas fwd + bwd.

    w, b: (1, C).  Gradients are the exact LN gradient computed in fp32 —
    same math autodiff derives from models/layers.layer_norm, fused into one
    recompute pass (mean/var are NOT saved; x is re-read in the backward,
    trading 2 tiny vectors of HBM for one extra fused reduction in VMEM).
    """
    return _ln_fwd_pallas(x2d, w, b, eps=eps)


def _ln_vjp_fwd(x2d, w, b, eps):
    return _ln_fwd_pallas(x2d, w, b, eps=eps), (x2d, w)


def _ln_vjp_bwd(eps, res, g):
    x2d, w = res
    dx, dw, db = _ln_bwd_pallas(x2d, w, g.astype(x2d.dtype), eps=eps)
    return dx, dw.astype(w.dtype), db.astype(w.dtype)


layer_norm_vjp.defvjp(_ln_vjp_fwd, _ln_vjp_bwd)
