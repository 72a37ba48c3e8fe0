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
