"""Chamfer kernel implementations must agree (XLA scan vs Pallas tiled vs
hierarchical tile-skipping)."""

import numpy as np
import jax.numpy as jnp

from tulip_tpu.ops.chamfer import min_sq_dists_xla
from tulip_tpu.ops.pallas.chamfer import min_sq_dists_pallas
from tulip_tpu.ops.pallas.chamfer_h import min_sq_dists_pallas_h


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


def test_hierarchical_chamfer_matches_bruteforce():
    """pallas_h (Morton ordering + lower-bound tile skipping) must be EXACT:
    skipped tile pairs provably contain no nearest neighbor.  Exercise a
    scene-like clustered cloud (skips happen) including 1e8 pad sentinels in
    b (the eval path pads to a chunk multiple) and unsorted inputs."""
    rng = np.random.default_rng(2)
    # three separated clusters + a thin "ground plane" sheet, like LiDAR
    clusters = [rng.standard_normal((600, 3)) * 2 + c
                for c in ([30, 0, 0], [-25, 40, 5], [0, -35, -3])]
    sheet = np.stack([rng.uniform(-60, 60, 1000),
                      rng.uniform(-60, 60, 1000),
                      rng.uniform(-0.2, 0.2, 1000)], axis=1)
    pts = np.concatenate(clusters + [sheet]).astype(np.float32)
    rng.shuffle(pts)
    a = pts[:1400]
    b_real = pts[1400:2800]
    pad = np.full((3072 - len(b_real), 3), 1e8, np.float32)   # chunk mult.
    b = np.concatenate([b_real, pad])

    brute = (((a[:, None, :] - b_real[None, :, :]) ** 2).sum(-1)).min(1)
    dh = np.asarray(min_sq_dists_pallas_h(jnp.asarray(a), jnp.asarray(b),
                                          chunk=512))
    assert dh.shape == (1400,)
    np.testing.assert_allclose(dh, brute, rtol=1e-4, atol=2e-3)


def test_hierarchical_chamfer_uniform_and_degenerate():
    """Uniform clouds (few skips) and a degenerate all-identical cloud
    (zero span) must both stay exact."""
    rng = np.random.default_rng(3)
    a = rng.uniform(-50, 50, (1100, 3)).astype(np.float32)
    b = rng.uniform(-50, 50, (1024, 3)).astype(np.float32)
    brute = (((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)).min(1)
    dh = np.asarray(min_sq_dists_pallas_h(jnp.asarray(a), jnp.asarray(b),
                                          chunk=512))
    np.testing.assert_allclose(dh, brute, rtol=1e-3, atol=4e-3)

    c = np.ones((700, 3), np.float32) * 7.0
    dh0 = np.asarray(min_sq_dists_pallas_h(jnp.asarray(c), jnp.asarray(c[:512]),
                                           chunk=512))
    np.testing.assert_allclose(dh0, np.zeros(700), atol=1e-4)


def test_bidirectional_pair_kernel_exact():
    """min_sq_dists_pallas_h2 (both NN directions from one shared sweep)
    must match the brute-force answer in BOTH directions, including with
    scene-like clustered structure and sentinel padding on neither side."""
    from tulip_tpu.ops.pallas.chamfer_h import min_sq_dists_pallas_h2
    rng = np.random.default_rng(11)
    base = rng.uniform(3.0, 25.0, (2048, 1))
    dirs = rng.normal(size=(2048, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    a = (base * dirs).astype(np.float32)
    b = (a + rng.normal(0, 0.05, a.shape)).astype(np.float32)

    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    brute_a = d.min(1)
    brute_b = d.min(0)
    da, db = min_sq_dists_pallas_h2(jnp.asarray(a), jnp.asarray(b),
                                    chunk=512)
    np.testing.assert_allclose(np.asarray(da), brute_a, rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(db), brute_b, rtol=1e-4, atol=2e-3)

    # uneven sizes: a is not a tile multiple (internal sentinel padding)
    a2 = a[:1500]
    d = ((a2[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    da, db = min_sq_dists_pallas_h2(jnp.asarray(a2), jnp.asarray(b),
                                    chunk=512)
    np.testing.assert_allclose(np.asarray(da), d.min(1), rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(db), d.min(0), rtol=1e-4, atol=2e-3)
