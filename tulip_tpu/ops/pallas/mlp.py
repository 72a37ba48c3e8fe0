"""Pallas fused LayerNorm + MLP + residual kernel.

One kernel for the second half of a Swin block: out = x + fc2(gelu(fc1(LN(x)))).
The XLA path materializes the LN output, the (N, 4C) hidden activations and
the fc2 output in HBM; here everything after the x-tile load stays in VMEM,
so HBM traffic is x-in + out + (resident) weights — a ~5x traffic cut for
the MLP half-block.

LayerNorm accumulates in fp32 (torch-AMP-matching numerics); matmuls run in
the input dtype with fp32 accumulation; GELU uses the tanh approximation in
bf16 (see models/layers.gelu).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
            *, eps: float, approx_gelu: bool):
    x = x_ref[:]                                          # (T, C)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = (y * lnw_ref[0].astype(jnp.float32)
         + lnb_ref[0].astype(jnp.float32)).astype(x.dtype)

    h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    h = (h + b1_ref[0].astype(jnp.float32)).astype(x.dtype)
    h = jax.nn.gelu(h, approximate=approx_gelu)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o = o + b2_ref[0].astype(jnp.float32)
    o_ref[:] = (o + x32).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_ln_mlp(x2d, lnw, lnb, w1, b1, w2, b2, *, eps: float = 1e-6,
                 interpret: bool = False):
    """x2d: (N, C) tokens.  Returns x + MLP(LN(x)), same shape/dtype."""
    N, C = x2d.shape
    H = w1.shape[1]
    interpret = interpret or jax.default_backend() == "cpu"
    approx_gelu = x2d.dtype == jnp.bfloat16

    # token tile: keep the (T, H) hidden tile around 1-2 MB; power of two so
    # dividing down always reaches a divisor of N (token counts are 2^k)
    budget = max(128, (1 << 21) // (H * 2))
    T = 1 << (budget.bit_length() - 1)
    T = min(T, 4096, N)
    while N % T:
        T //= 2
    T = max(T, 1)

    kernel = functools.partial(_kernel, eps=eps, approx_gelu=approx_gelu)
    return pl.pallas_call(
        kernel,
        grid=(N // T,),
        in_specs=[
            pl.BlockSpec((T, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=interpret,
    )(x2d, lnw, lnb, w1, b1, w2, b2)
