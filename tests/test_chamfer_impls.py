"""Chamfer kernel implementations must agree (XLA scan vs Pallas tiled)."""

import numpy as np
import jax.numpy as jnp

from tulip_tpu.ops.chamfer import min_sq_dists_xla
from tulip_tpu.ops.pallas.chamfer import min_sq_dists_pallas


def test_pallas_chamfer_matches_xla():
    rng = np.random.default_rng(0)
    a = rng.uniform(-50, 50, (1000, 3)).astype(np.float32)
    b = rng.uniform(-50, 50, (1536, 3)).astype(np.float32)
    dx = np.asarray(min_sq_dists_xla(jnp.asarray(a), jnp.asarray(b), chunk=512))
    dp = np.asarray(min_sq_dists_pallas(jnp.asarray(a), jnp.asarray(b), chunk=512))
    assert dp.shape == (1000,)
    # Both impls use the |a-b|^2 = a^2 + b^2 - 2ab expansion; with coords in
    # [-50, 50] the cross term is O(7.5e3) whose fp32 ulp is ~1e-3, so after
    # cancellation the two impls legitimately differ by a few cross-term ulps
    # in *absolute* terms regardless of dot precision. Tolerance = ~4 ulps of
    # the cross-term magnitude, far inside the 1% chamfer-parity contract.
    np.testing.assert_allclose(dp, dx, rtol=1e-3, atol=4e-3)


def test_pallas_chamfer_vs_bruteforce():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((300, 3)).astype(np.float32) * 5
    b = rng.standard_normal((512, 3)).astype(np.float32) * 5
    brute = (((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)).min(1)
    dp = np.asarray(min_sq_dists_pallas(jnp.asarray(a), jnp.asarray(b), chunk=512))
    np.testing.assert_allclose(dp, brute, rtol=1e-4, atol=1e-4)
