"""Hierarchical exact nearest-neighbor sweep: Morton-ordered tiles with
conservative lower bounds let the kernel SKIP most far tile pairs.

The brute-force sweep (ops/pallas/chamfer.py) pays a full HIGHEST-precision
matmul for every (query-tile, target-chunk) pair — 636 ms per direction on
262k-point DurLAR clouds (replacing the reference's CUDA brute force,
tulip/util/evaluation.py:125-134).  But pred and gt clouds are the SAME
scene: after Morton-ordering, a query tile's nearest neighbors live in a
handful of target chunks.  This kernel visits target chunks per query tile
in ascending lower-bound order (bounds from per-tile centers/radii) and
predicates the matmul+min on

    LB(i, j)^2 < max_q  cur_min_dist_q        (q over the query tile)

— a tile pair whose center-distance bound cannot beat any query's current
minimum provably contains no nearest neighbor, so skipping it is EXACT.
The whole (augmented) target cloud stays VMEM-resident (8 x M fp32,
~8.4 MB at 262k points); chunks are addressed by dynamic lane slices from
the per-row visit order, so skipped steps cost only the scalar test.

Numerics: identical expansion-form math at HIGHEST matmul precision as the
brute-force kernel; the bound is slackened by 1e-3 m before squaring to
absorb fp32 rounding in the bound itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SMEM_BN = 8     # sublane rows per SMEM window of the lb/order tables


def _morton10(x, lo, span):
    """10-bit-per-axis 3-D Morton codes (uint32) for (N, 3) fp32 points."""
    q = jnp.clip(((x - lo) / span) * 1023.0, 0.0, 1023.0).astype(jnp.uint32)

    def part1by2(v):
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    return (part1by2(q[:, 0]) | (part1by2(q[:, 1]) << 1)
            | (part1by2(q[:, 2]) << 2))


def _tile_bounds(pts, tile):
    """(T, tile, 3) -> centers (T, 3), radii (T,)."""
    t = pts.reshape(-1, tile, 3)
    c = jnp.mean(t, axis=1)
    r = jnp.sqrt(jnp.max(jnp.sum((t - c[:, None, :]) ** 2, axis=-1), axis=1))
    return c, r


def _kernel_h(lb_ref, idx_ref, a_ref, bt_ref, o_ref, *, TM: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.full(o_ref.shape, 1e30, o_ref.dtype)

    # current worst true distance across the tile's queries: lane-partial
    # mins hold full |a-b|^2 (the augmentation folds a2 AND b2 into the dot)
    cur = jnp.max(jnp.min(o_ref[:], axis=-1))
    # lb/idx arrive as (8, 128) SMEM windows (Mosaic rejects (1, 1) blocks
    # over larger arrays); the in-window remainder is a dynamic scalar load
    lb = lb_ref[i % _SMEM_BN, j % _LANES]

    @pl.when((j == 0) | (lb < cur))
    def _():
        idx = idx_ref[i % _SMEM_BN, j % _LANES]
        a = a_ref[:]                                     # (TN, 8)
        # dynamic index on the LEADING (untiled) dim — dynamic lane-dim
        # slicing is the op Mosaic has historically mis-lowered
        bt = bt_ref[idx]                                 # (8, TM)
        d = jnp.dot(a, bt, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (TN, TM)
        partial = d[:, 0:_LANES]
        for t in range(1, TM // _LANES):
            partial = jnp.minimum(partial, d[:, t * _LANES:(t + 1) * _LANES])
        o_ref[:] = jnp.minimum(o_ref[:], partial)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def min_sq_dists_pallas_h(a: jnp.ndarray, b: jnp.ndarray, chunk: int = 1024,
                          interpret: bool = False) -> jnp.ndarray:
    """min_j |a_i - b_j|^2, exact, with hierarchical tile skipping.

    a: (N, 3); b: (M, 3), M a multiple of ``chunk`` (callers pad with 1e8
    sentinels — after Morton ordering those collapse into their own tail
    tiles and stop costing anything once each finds a sentinel partner)."""
    interpret = interpret or jax.default_backend() == "cpu"
    N = a.shape[0]
    M = b.shape[0]
    TN = 1024
    TM = chunk
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)

    # Morton-order both clouds over the joint bounding box of the REAL
    # points — the 1e8 padding sentinels would otherwise stretch the box so
    # every real point lands in one cell (zero coherence).  Sentinels clip
    # to the last cell and sort to the tail.  The argsort of a is inverted
    # to restore output order; b's order only affects chunk coherence.
    def _real_box(x):
        real = jnp.all(jnp.abs(x) < 1e7, axis=-1, keepdims=True)
        lo = jnp.min(jnp.where(real, x, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(real, x, -jnp.inf), axis=0)
        return lo, hi

    lo_a, hi_a = _real_box(a)
    lo_b, hi_b = _real_box(b)
    finite_lo = jnp.minimum(lo_a, lo_b)
    finite_hi = jnp.maximum(hi_a, hi_b)
    span = jnp.maximum(finite_hi - finite_lo, 1e-6)
    pa = jnp.argsort(_morton10(a, finite_lo, span))
    pb = jnp.argsort(_morton10(b, finite_lo, span))
    a_s = a[pa]
    b_s = b[pb]

    pad_n = (-N) % TN
    if pad_n:
        a_s = jnp.concatenate(
            [a_s, jnp.full((pad_n, 3), 1e8, jnp.float32)], axis=0)
    Np = a_s.shape[0]

    # tile meta + conservative lower bounds (slack absorbs fp32 rounding)
    ca, ra = _tile_bounds(a_s, TN)                   # (Ni, 3), (Ni,)
    cb, rb = _tile_bounds(b_s, TM)                   # (Nj, 3), (Nj,)
    dc = jnp.sqrt(jnp.sum((ca[:, None, :] - cb[None, :, :]) ** 2, axis=-1))
    lb_lin = jnp.maximum(dc - ra[:, None] - rb[None, :] - 1e-3, 0.0)
    lb = (lb_lin * lb_lin).astype(jnp.float32)       # (Ni, Nj)
    order = jnp.argsort(lb, axis=1).astype(jnp.int32)
    lb_sorted = jnp.take_along_axis(lb, order, axis=1)
    # pad the scalar tables up to whole (8, 128) SMEM windows; padding is
    # never read (grid stops at (Ni, Nj))
    pad_i = (-lb.shape[0]) % _SMEM_BN
    pad_j = (-lb.shape[1]) % _LANES
    lb_sorted = jnp.pad(lb_sorted, ((0, pad_i), (0, pad_j)))
    order = jnp.pad(order, ((0, pad_i), (0, pad_j)))

    # augmented layout: ONE matmul yields the full |a-b|^2
    #   a_aug = [x, y, z, 1, |a|^2, 0, 0, 0]
    #   bt    = [-2bx, -2by, -2bz, |b|^2, 1, 0, 0, 0]^T
    # (K padded 3->8 explicitly: Mosaic's physical padding of K<8 is
    # undefined data on real TPUs — see ops/pallas/chamfer.py)
    a2 = jnp.sum(a_s * a_s, axis=-1, keepdims=True)
    b2 = jnp.sum(b_s * b_s, axis=-1, keepdims=True)
    ones_a = jnp.ones((Np, 1), jnp.float32)
    ones_b = jnp.ones((M, 1), jnp.float32)
    zeros_a = jnp.zeros((Np, 3), jnp.float32)
    zeros_b = jnp.zeros((M, 3), jnp.float32)
    a_aug = jnp.concatenate([a_s, ones_a, a2, zeros_a], axis=1)   # (Np, 8)
    b_aug = jnp.concatenate([-2.0 * b_s, b2, ones_b, zeros_b],
                            axis=1)                               # (M, 8)
    Ni, Nj = Np // TN, M // TM
    # chunk-major (Nj, 8, TM): the kernel picks chunks by dynamic index on
    # the leading dim, so the whole target cloud stays VMEM-resident
    bt = b_aug.reshape(Nj, TM, 8).transpose(0, 2, 1)
    kernel = functools.partial(_kernel_h, TM=TM)
    out = pl.pallas_call(
        kernel,
        grid=(Ni, Nj),
        in_specs=[
            pl.BlockSpec((_SMEM_BN, _LANES),
                         lambda i, j: (i // _SMEM_BN, j // _LANES),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_SMEM_BN, _LANES),
                         lambda i, j: (i // _SMEM_BN, j // _LANES),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TN, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Nj, 8, TM), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, _LANES), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, _LANES), jnp.float32),
        interpret=interpret,
    )(lb_sorted, order, a_aug, bt)

    d_sorted = jnp.maximum(jnp.min(out, axis=-1), 0.0)[:Np]
    # scatter back to the caller's point order
    inv = jnp.zeros((N,), jnp.float32).at[pa].set(d_sorted[:N])
    return inv


def _tile_boxes(pts, tile):
    """(T*tile, 3) -> AABB centers (T, 3), half-extents (T, 3) — a strictly
    tighter lower bound than the sphere radii for elongated scan tiles."""
    t = pts.reshape(-1, tile, 3)
    lo = jnp.min(t, axis=1)
    hi = jnp.max(t, axis=1)
    return 0.5 * (lo + hi), 0.5 * (hi - lo)


def _kernel_h2(lb_ref, idx_ref, a_ref, bt_ref, oa_ref, ob_ref,
               *, TM: int, TN: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        ob_ref[:] = jnp.full(ob_ref.shape, 1e30, ob_ref.dtype)

    @pl.when(j == 0)
    def _():
        oa_ref[:] = jnp.full(oa_ref.shape, 1e30, oa_ref.dtype)

    cur_a = jnp.max(jnp.min(oa_ref[:], axis=-1))
    lb = lb_ref[i % _SMEM_BN, j % _LANES]
    idx = idx_ref[i % _SMEM_BN, j % _LANES]
    ob_row = ob_ref[pl.ds(idx, 1)]                       # (1, TM)
    cur_b = jnp.max(ob_row)

    # EXACT bidirectional skip: a pair may be skipped only when its lower
    # bound can beat neither direction's current worst minimum.
    @pl.when((lb < cur_a) | (lb < cur_b))
    def _():
        a = a_ref[:]                                     # (TN, 8)
        bt = bt_ref[idx]                                 # (8, TM)
        d = jnp.dot(a, bt, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (TN, TM)
        partial = d[:, 0:_LANES]
        for t in range(1, TM // _LANES):
            partial = jnp.minimum(partial, d[:, t * _LANES:(t + 1) * _LANES])
        oa_ref[:] = jnp.minimum(oa_ref[:], partial)
        colmin = jnp.min(d, axis=0, keepdims=True)       # (1, TM)
        ob_ref[pl.ds(idx, 1)] = jnp.minimum(ob_row, colmin)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def min_sq_dists_pallas_h2(a: jnp.ndarray, b: jnp.ndarray, chunk: int = 1024,
                           interpret: bool = False):
    """BOTH NN directions in one kernel pass: (min_j |a_i - b_j|^2,
    min_i |a_i - b_j|^2).

    The brute cost of a chamfer pair is two full sweeps; but the distance
    tile d(i, j) computed for the a-direction contains the b-direction's
    answer as its column mins, so a second reduce of the SAME matmul output
    replaces the entire second sweep.  The b-direction minima accumulate
    into a VMEM-resident (M,) table addressed by the visit order's dynamic
    chunk index; the skip test becomes the OR of both directions' bound
    tests (exact for each — see _kernel_h).  Morton tables, the augmented
    layouts, and the lb/order computation are shared, and bounds use AABB
    half-extents (tighter than the sphere radii for scan-surface tiles).
    """
    interpret = interpret or jax.default_backend() == "cpu"
    N = a.shape[0]
    M = b.shape[0]
    TN = 1024
    TM = chunk
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)

    def _real_box(x):
        real = jnp.all(jnp.abs(x) < 1e7, axis=-1, keepdims=True)
        lo = jnp.min(jnp.where(real, x, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(real, x, -jnp.inf), axis=0)
        return lo, hi

    lo_a, hi_a = _real_box(a)
    lo_b, hi_b = _real_box(b)
    finite_lo = jnp.minimum(lo_a, lo_b)
    finite_hi = jnp.maximum(hi_a, hi_b)
    span = jnp.maximum(finite_hi - finite_lo, 1e-6)
    pa = jnp.argsort(_morton10(a, finite_lo, span))
    pb = jnp.argsort(_morton10(b, finite_lo, span))
    a_s = a[pa]
    b_s = b[pb]

    pad_n = (-N) % TN
    if pad_n:
        a_s = jnp.concatenate(
            [a_s, jnp.full((pad_n, 3), 1e8, jnp.float32)], axis=0)
    Np = a_s.shape[0]
    assert M % TM == 0, (M, TM)

    ca, ha = _tile_boxes(a_s, TN)
    cb, hb = _tile_boxes(b_s, TM)
    gap = jnp.maximum(
        jnp.abs(ca[:, None, :] - cb[None, :, :]) - ha[:, None, :]
        - hb[None, :, :], 0.0)
    lb_lin = jnp.maximum(
        jnp.sqrt(jnp.sum(gap * gap, axis=-1)) - 1e-3, 0.0)
    lb = (lb_lin * lb_lin).astype(jnp.float32)           # (Ni, Nj)
    order = jnp.argsort(lb, axis=1).astype(jnp.int32)
    lb_sorted = jnp.take_along_axis(lb, order, axis=1)
    pad_i = (-lb.shape[0]) % _SMEM_BN
    pad_j = (-lb.shape[1]) % _LANES
    lb_sorted = jnp.pad(lb_sorted, ((0, pad_i), (0, pad_j)))
    order = jnp.pad(order, ((0, pad_i), (0, pad_j)))

    a2 = jnp.sum(a_s * a_s, axis=-1, keepdims=True)
    b2 = jnp.sum(b_s * b_s, axis=-1, keepdims=True)
    a_aug = jnp.concatenate(
        [a_s, jnp.ones((Np, 1), jnp.float32), a2,
         jnp.zeros((Np, 3), jnp.float32)], axis=1)       # (Np, 8)
    b_aug = jnp.concatenate(
        [-2.0 * b_s, b2, jnp.ones((M, 1), jnp.float32),
         jnp.zeros((M, 3), jnp.float32)], axis=1)        # (M, 8)
    Ni, Nj = Np // TN, M // TM
    bt = b_aug.reshape(Nj, TM, 8).transpose(0, 2, 1)
    kernel = functools.partial(_kernel_h2, TM=TM, TN=TN)
    oa, ob = pl.pallas_call(
        kernel,
        grid=(Ni, Nj),
        in_specs=[
            pl.BlockSpec((_SMEM_BN, _LANES),
                         lambda i, j: (i // _SMEM_BN, j // _LANES),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_SMEM_BN, _LANES),
                         lambda i, j: (i // _SMEM_BN, j // _LANES),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TN, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Nj, 8, TM), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TN, _LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Nj, TM), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((Nj, TM), jnp.float32),
        ],
        interpret=interpret,
    )(lb_sorted, order, a_aug, bt)

    da_sorted = jnp.maximum(jnp.min(oa, axis=-1), 0.0)
    da = jnp.zeros((N,), jnp.float32).at[pa].set(da_sorted[:N])
    db_sorted = jnp.maximum(ob.reshape(M), 0.0)
    db = jnp.zeros((M,), jnp.float32).at[pb].set(db_sorted)
    return da, db


def _register():
    from .. import register_chamfer_impl
    # measured/validated target-chunk config (bench_chamfer, r3): callers
    # (eval.metrics.chamfer_distance_async) honor this instead of assuming
    # the brute kernels' 4096
    min_sq_dists_pallas_h.preferred_chunk = 1024
    # pair-capable: callers with both directions of the same cloud pair use
    # the single-pass kernel (eval.metrics)
    min_sq_dists_pallas_h.pair = min_sq_dists_pallas_h2
    min_sq_dists_pallas_h2.preferred_chunk = 1024
    register_chamfer_impl("pallas_h", min_sq_dists_pallas_h)


_register()
