"""Pallas LayerNorm custom-VJP kernel (ops/pallas/ln.py) vs the XLA
layer_norm it replaces (models/layers.layer_norm) — forward and gradients.

The kernel is numerics-pinned: identical fp32 math, so differences are
reduction-order rounding only (bf16 output ulp; ~1e-7 relative in fp32).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tulip_tpu.models import layers as L
from tulip_tpu.ops.pallas.ln import layer_norm_vjp

# multi-minute CPU-backend compiles: full-model or full-step jits
pytestmark = pytest.mark.slow


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)


@pytest.mark.parametrize("C,dtype,tol_f,tol_g", [
    (96, jnp.bfloat16, 1e-2, 1e-2),
    (768, jnp.bfloat16, 2e-2, 1e-2),
    (96, jnp.float32, 1e-5, 1e-5),
])
def test_ln_vjp_matches_xla(C, dtype, tol_f, tol_g):
    N = 2048
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, C)), jnp.float32).astype(dtype)
    w = jnp.asarray(1 + 0.1 * rng.standard_normal(C), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)
    g = jnp.asarray(rng.standard_normal((N, C)), jnp.float32).astype(dtype)

    def ref(x, w, b):
        return L.layer_norm({"n.weight": w, "n.bias": b}, "n", x, 1e-6)

    def new(x, w, b):
        return layer_norm_vjp(x, w.reshape(1, -1), b.reshape(1, -1), 1e-6)

    y0, y1 = ref(x, w, b), new(x, w, b)
    assert _rel(y0, y1) < tol_f

    def loss(f):
        return lambda *a: jnp.sum(
            f(*a).astype(jnp.float32) * g.astype(jnp.float32))

    g0 = jax.grad(loss(ref), argnums=(0, 1, 2))(x, w, b)
    g1 = jax.grad(loss(new), argnums=(0, 1, 2))(x, w, b)
    for a, bb in zip(g0, g1):
        assert _rel(a, bb) < tol_g


def test_ln_vjp_odd_row_count():
    # N = 3 * 2^k (odd batch sizes): the tile walk must still divide N
    N, C = 3 * 512, 96
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((N, C)), jnp.float32)
    w = jnp.ones((C,), jnp.float32)
    b = jnp.zeros((C,), jnp.float32)
    y0 = L.layer_norm({"n.weight": w, "n.bias": b}, "n", x, 1e-6)
    y1 = layer_norm_vjp(x, w.reshape(1, -1), b.reshape(1, -1), 1e-6)
    assert _rel(y0, y1) < 1e-5


def test_fused_ln_linear_fwd_and_vjp():
    """Patch-merging reduction kernel (LN -> bias-free matmul): forward and
    all four gradients must match the XLA composition within bf16
    tolerance."""
    import jax
    import jax.numpy as jnp
    from tulip_tpu.ops.pallas.mlp import fused_ln_linear

    rng = np.random.default_rng(0)
    N, C, O = 512, 384, 192
    x = jnp.asarray(rng.normal(0, 1, (N, C)).astype(np.float32)).astype(jnp.bfloat16)
    lnw = jnp.asarray(rng.normal(1, 0.1, (1, C)).astype(np.float32)).astype(jnp.bfloat16)
    lnb = jnp.asarray(rng.normal(0, 0.1, (1, C)).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.05, (C, O)).astype(np.float32)).astype(jnp.bfloat16)

    def ref(x, lnw, lnb, w1):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, -1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), -1, keepdims=True)
        y = ((x32 - mean) * jax.lax.rsqrt(var + 1e-6)
             * lnw[0].astype(jnp.float32)
             + lnb[0].astype(jnp.float32)).astype(x.dtype)
        return jnp.dot(y, w1, preferred_element_type=jnp.float32).astype(x.dtype)

    g = jnp.asarray(rng.normal(0, 1, (N, O)).astype(np.float32)).astype(jnp.bfloat16)
    out1, vjp1 = jax.vjp(lambda *a: fused_ln_linear(*a, 1e-6), x, lnw, lnb, w1)
    out2, vjp2 = jax.vjp(ref, x, lnw, lnb, w1)
    assert float(jnp.max(jnp.abs(out1.astype(jnp.float32)
                                 - out2.astype(jnp.float32)))) < 5e-3
    for a, b, n in zip(vjp1(g), vjp2(g), ["dx", "dlnw", "dlnb", "dw1"]):
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        s = float(jnp.max(jnp.abs(b.astype(jnp.float32))))
        assert d <= 0.05 * max(s, 1e-3), (n, d, s)
