"""Pallas fused [LayerNorm ->] matmul -> activation -> matmul [-> residual]
kernel — the generic two-matmul block used twice in this model:

- Swin MLP half-block: out = x + fc2(gelu(fc1(LN(x))))
- PixelShuffleHead + decoder_pred: out16 = (leaky(x @ W1 + b1)) @ W2, where
  W2 is the sparse channel-gather form of the 1x1 prediction conv folded
  through the pixel shuffle (see models/tulip._ps_head_pred_fused) — this
  avoids materializing the (tokens, C*r^2) intermediate in HBM (~1.6 GB per
  batch-32 DurLAR step).

The XLA path materializes the LN output, the (N, H) hidden activations and
the second matmul's input in HBM; here everything after the x-tile load
stays in VMEM.  LayerNorm accumulates in fp32; matmuls accumulate fp32; the
GELU uses the tanh approximation in bf16 (see models/layers.gelu).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
            *, eps: float, act: str, fuse_ln: bool, residual: bool):
    x = x_ref[:]                                          # (T, C)
    if fuse_ln:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        y = (y * lnw_ref[0].astype(jnp.float32)
             + lnb_ref[0].astype(jnp.float32)).astype(x.dtype)
    else:
        y = x

    h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    h = (h + b1_ref[0].astype(jnp.float32)).astype(x.dtype)
    if act == "gelu":
        h = jax.nn.gelu(h, approximate=h.dtype == jnp.bfloat16)
    elif act == "leaky":
        # max/min form: Mosaic lacks bf16 compare+select on this target
        h = jnp.maximum(h, 0) + 0.01 * jnp.minimum(h, 0)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o = o + b2_ref[0].astype(jnp.float32)
    if residual:
        o = o + x.astype(jnp.float32)
    o_ref[:] = o.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "act", "fuse_ln",
                                             "residual", "interpret"))
def fused_two_matmul(x2d, lnw, lnb, w1, b1, w2, b2, *, eps: float = 1e-6,
                     act: str = "gelu", fuse_ln: bool = True,
                     residual: bool = True, interpret: bool = False):
    """x2d: (N, C) tokens -> (N, w2.shape[1])."""
    N, C = x2d.shape
    H = w1.shape[1]
    O = w2.shape[1]
    interpret = interpret or jax.default_backend() == "cpu"
    if lnw is None:
        lnw = jnp.zeros((1, C), x2d.dtype)
        lnb = jnp.zeros((1, C), x2d.dtype)
        fuse_ln = False

    # token tile: keep the (T, H) hidden tile around 1-2 MB; power of two so
    # dividing down always reaches a divisor of N (token counts are 2^k)
    budget = max(128, (1 << 21) // (H * 2))
    T = 1 << (budget.bit_length() - 1)
    T = min(T, 4096, N)
    while N % T:
        T //= 2
    T = max(T, 1)

    kernel = functools.partial(_kernel, eps=eps, act=act, fuse_ln=fuse_ln,
                               residual=residual)
    return pl.pallas_call(
        kernel,
        grid=(N // T,),
        in_specs=[
            pl.BlockSpec((T, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, O), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, O), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O), x2d.dtype),
        interpret=interpret,
    )(x2d, lnw, lnb, w1, b1, w2, b2)


def fused_ln_mlp(x2d, lnw, lnb, w1, b1, w2, b2, *, eps: float = 1e-6,
                 interpret: bool = False):
    """Swin MLP half-block: x + fc2(gelu(fc1(LN(x))))."""
    return fused_two_matmul(x2d, lnw, lnb, w1, b1, w2, b2, eps=eps,
                            act="gelu", fuse_ln=True, residual=True,
                            interpret=interpret)


# ---------------------------------------------------------------------------
# Differentiable wrapper (training path)
# ---------------------------------------------------------------------------

def _xla_two_matmul(x2d, lnw, lnb, w1, b1, w2, b2, *, eps, act, fuse_ln,
                    residual):
    """The kernel's math in plain XLA — used only inside the custom-VJP
    backward, where jax.vjp of this recomputes the activations instead of
    saving the (N, H) hidden tile to HBM in the forward."""
    x = x2d
    if fuse_ln:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        y = (y * lnw[0].astype(jnp.float32)
             + lnb[0].astype(jnp.float32)).astype(x.dtype)
    else:
        y = x
    h = (y @ w1 + b1[0]).astype(x.dtype)
    if act == "gelu":
        h = jax.nn.gelu(h, approximate=h.dtype == jnp.bfloat16)
    elif act == "leaky":
        h = jnp.maximum(h, 0) + 0.01 * jnp.minimum(h, 0)
    o = h @ w2 + b2[0]
    if residual:
        o = o + x
    return o.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_two_matmul_vjp(x2d, lnw, lnb, w1, b1, w2, b2, eps: float,
                         act: str, fuse_ln: bool, residual: bool):
    """fused_two_matmul with a defined VJP: Pallas forward (no HBM hidden
    activations), recompute-style XLA backward (one extra forward's matmul
    FLOPs instead of saving/loading the (N, H) intermediates)."""
    return fused_two_matmul(x2d, lnw, lnb, w1, b1, w2, b2, eps=eps, act=act,
                            fuse_ln=fuse_ln, residual=residual)


def _ftm_fwd(x2d, lnw, lnb, w1, b1, w2, b2, eps, act, fuse_ln, residual):
    out = fused_two_matmul(x2d, lnw, lnb, w1, b1, w2, b2, eps=eps, act=act,
                           fuse_ln=fuse_ln, residual=residual)
    return out, (x2d, lnw, lnb, w1, b1, w2, b2)


def _ftm_bwd(eps, act, fuse_ln, residual, res, g):
    x2d, lnw, lnb, w1, b1, w2, b2 = res
    fn = functools.partial(_xla_two_matmul, eps=eps, act=act,
                           fuse_ln=fuse_ln, residual=residual)
    _, vjp = jax.vjp(fn, x2d, lnw, lnb, w1, b1, w2, b2)
    return vjp(g.astype(x2d.dtype))


fused_two_matmul_vjp.defvjp(_ftm_fwd, _ftm_bwd)
