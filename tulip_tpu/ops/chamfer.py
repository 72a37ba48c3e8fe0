"""XLA-native tiled nearest-neighbor min-squared-distance sweep.

Replaces the reference's CUDA ``chamfer_distance`` extension
(tulip/util/evaluation.py:4, README.md:24-26).  The |a-b|^2 expansion turns
the O(N*M) sweep into an (N,3)x(3,chunk) matmul per tile (MXU work); a
lax.scan carries the running min so peak memory is O(N * chunk).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("chunk",))
def min_sq_dists_xla(a: jnp.ndarray, b: jnp.ndarray, chunk: int = 4096):
    """min_j |a_i - b_j|^2 for each i.

    a: (N, 3); b: (M, 3) with M a multiple of ``chunk`` (pad with far-away
    sentinel points — the caller does this).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=-1)                  # (N,)
    bc = b.reshape(-1, chunk, b.shape[-1])        # (K, chunk, 3)

    def body(carry, b_chunk):
        b2 = jnp.sum(b_chunk * b_chunk, axis=-1)  # (chunk,)
        cross = jax.lax.dot_general(
            a, b_chunk.T, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)   # (N, chunk)
        d = a2[:, None] + b2[None, :] - 2.0 * cross
        return jnp.minimum(carry, jnp.min(d, axis=-1)), None

    init = jnp.full(a.shape[0], jnp.inf, jnp.float32)
    out, _ = jax.lax.scan(body, init, bc)
    return jnp.maximum(out, 0.0)                  # clamp fp cancellation
