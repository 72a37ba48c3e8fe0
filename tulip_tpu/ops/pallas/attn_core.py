"""Differentiable Pallas attention core over natural-layout window groups.

Training-path complement to ops/pallas/window_msa.py: the custom-VJP
boundary is the attention core only (QK^T -> softmax -> PV); the dense
linear-size matmuls around it (LN, qkv projection, output projection) stay
in XLA, which runs them at roofline and autodiffs them for free.  All
O(GL^2) tensors (logits, probs, their gradients) live and die in VMEM in
both passes — the backward recomputes the probs FlashAttention-style
instead of saving them to HBM (XLA's autodiff of the grouped implementation
spills ~400 MB of fp32 probabilities per stage-0 block at batch 16).

Two layout/shape insights drive the design (both measured on v5e):

1. NO PARTITION TRANSPOSE.  A "grouped window" of G adjacent (wh, ww)
   windows is a contiguous (wh, G*ww) spatial tile of the token grid, and
   the classic window partition merely permutes tokens *within* that tile.
   Attention conjugated by a permutation is attention with permuted
   bias/mask tables — so the kernel reads (wh, G*ww, C) tiles of the
   natural (B*nH, wh, W, C) layout (pure reshapes from (B, H, W, C)) and
   the *static* bias/mask tables are pre-permuted instead (numpy, free).
   The physical partition transposes cost ~17 ms/step of the batch-16
   train step in XLA fusions, plus as much again in their backward copies.

2. EXPANDED HEADS, BIG MATMULS.  Windows are tiny (GL <= 128 tokens) and
   heads narrow (hd = 32), so per-(group, head) batched matmuls are
   latency-bound — thousands of (128x32)@(32x128) MXU calls measured ~100x
   their flop time; in-kernel head peeling via narrow-lane slices worse
   still.  Each group instead computes ALL heads in one pair of big
   matmuls via a head-block-diagonal expansion:

       kexp = tile(K, nh) * head_mask      # (nh*GL, C), zeros off-block
       logits_cat = Q @ kexp^T             # (GL, nh*GL): seg h = q_h k_h^T
       pr_cat = segmented softmax          # per GL-lane head segment
       out = pr_cat @ vexp                 # (GL, C)

   The expansion wastes a factor nh in flops (the masked zeros) but turns
   2*nh skinny matmuls into 2 full-K contractions — ~7x faster at stage 0.
   Heads are processed in chunks of <= 8 to bound the fp32 buffers.

Layouts:
  qkv:      (R, wh, W, 3C) fused [q|k|v], R = B*nH row-strips, W = nWg*Gww
            — a pure reshape of the rolled (B, H, W, 3C) qkv projection
  bias_cat: (GL, nh*GL) fp32, segment-concat, NATURAL token order
            (pre-permuted via natural_token_perm); differentiable — the
            cotangent chains through the permutation/table gather in XLA
  gmask:    (nG, GL, GL) or (1, GL, GL) additive mask in natural token
            order (constant; bf16 is exact for its 0/-100/-1e9 values)
  out:      (R, wh, W, C)

Two fuller fusions were tried and REVERTED (keep the measurements):
- per-GROUP fused half-block (LN+qkv+attn+proj per (GL, C) tile): fragments
  the model's largest GEMMs — train 155 -> 145, inference 664 -> 538;
- per-STEP fused half-block (GEMMs over all BWg groups per grid step,
  natural layout + expanded heads): inference 664 -> 611 — still behind
  window_msa.py's fused kernels, whose grouped-layout GEMMs + in-kernel
  peel win at inference despite the partition transposes.
The training sweet spot is this file's v4 composition: whole-tensor XLA
GEMMs around a natural-layout O(GL^2) core with a custom VJP.

NB: all timings above use host-read serialization — block_until_ready is
unreliable on the axon platform.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def natural_token_perm(wh: int, ww: int, G: int) -> np.ndarray:
    """perm[t_natural] = t_grouped for one (wh, G*ww) tile: natural token
    (r, w) is row-major over the tile; grouped order is window-major
    (w // ww, r, w % ww) (models/swin._grouped_statics)."""
    Gww = G * ww
    r, w = np.divmod(np.arange(wh * Gww), Gww)
    return (w // ww) * (wh * ww) + r * ww + (w % ww)


def _head_chunks(nh: int, max_chunk: int = 8):
    chunk = min(nh, max_chunk)
    while nh % chunk:
        chunk -= 1
    return [(h0, chunk) for h0 in range(0, nh, chunk)]


def _chunk_mask(nh: int, h0: int, chunk: int, GL: int, C: int):
    """Boolean (chunk*GL, C) head-block-diagonal mask via 2-D iota (computed
    in-kernel; a materialized input would cost nh*GL*C VMEM every step)."""
    hd = C // nh
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk * GL, C), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk * GL, C), 1)
    h = rows // GL + h0
    return (cols >= h * hd) & (cols < (h + 1) * hd)


def _expand(x, chunk: int, mask):
    """(GL, C) -> (chunk*GL, C) head-block-diagonal expansion."""
    t = jnp.concatenate([x] * chunk, axis=0)
    return jnp.where(mask, t, jnp.zeros((), t.dtype))


def _seg_softmax_fwd(logits, gmask_g, GL: int, chunk: int, sm_t):
    """Segmented softmax over each GL-lane head segment of (GL, chunk*GL)
    fp32 logits (+ per-group additive mask).

    VPU-pass economy: the mask add / row max / exp run FULL-WIDTH (one pass
    over (GL, cGL) instead of per-segment passes) — a row max taken across
    all segments is still a constant within each segment, so the softmax
    value is unchanged (exp has ~88 units of fp32 range; head segments of
    the same row differ by at most the bias/logit spread, and every row has
    its unmasked self-window entries, so no segment can underflow to an
    all-zero row).  Only the normalization sums stay per-segment."""
    gm = (jnp.concatenate([gmask_g] * chunk, axis=1) if chunk > 1
          else gmask_g)
    s = logits + gm
    # exact max-subtracted softmax.  The TRAINING kernel must not use the
    # r4 clamp trick (exp(min(s, 40)) with no max-subtraction): attention
    # logits can grow past 40 during training, where the clamp silently
    # deviates from true softmax AND breaks the VJP identity
    # dL = p*(d - sum(d*p)) used in _bwd_kernel (the clamp's zero-gradient
    # region is never accounted for) — corrupted gradients with no signal.
    # A FULL-WIDTH row max is a single per-row constant, so subtracting it
    # from every head segment leaves each segment's softmax exact (shift
    # invariance) while keeping the one-pass VPU economy described above.
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    segs = []
    for j in range(chunk):
        seg = e[:, j * GL:(j + 1) * GL]
        segs.append(seg * (1.0 / jnp.sum(seg, axis=-1, keepdims=True)))
    return jnp.concatenate(segs, axis=1).astype(sm_t)


def _fwd_kernel(qkv_ref, biasc_ref, gmask_ref, o_ref,
                *, nh: int, scale: float, mask_per_group: bool, BWg: int,
                wh: int, Gww: int, C: int):
    GL = wh * Gww
    chunks = _head_chunks(nh)
    masks = [_chunk_mask(nh, h0, c, GL, C) for h0, c in chunks]
    for g in range(BWg):
        cols = slice(g * Gww, (g + 1) * Gww)
        qkv = qkv_ref[0][:, cols, :].reshape(GL, 3 * C)
        # fold the softmax scale into q (one (GL, C) multiply) instead of
        # scaling the (GL, cGL) fp32 logits — same rounding behaviour as the
        # grouped XLA impl, which also scales q before the dot
        q = qkv[:, :C] * jnp.asarray(scale, qkv.dtype)
        k = qkv[:, C:2 * C]
        v = qkv[:, 2 * C:]
        gm = gmask_ref[g if mask_per_group else 0].astype(jnp.float32)
        out = None
        for ci, (h0, chunk) in enumerate(chunks):
            mask = masks[ci]
            kexp = _expand(k, chunk, mask)                 # (cGL, C)
            vexp = _expand(v, chunk, mask)
            logits = jax.lax.dot_general(
                q, kexp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (GL, cGL)
            logits = logits \
                + biasc_ref[:, h0 * GL:(h0 + chunk) * GL].astype(jnp.float32)
            pr = _seg_softmax_fwd(logits, gm, GL, chunk, q.dtype)
            o = jax.lax.dot_general(
                pr, vexp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (GL, C) head-cols
            out = o if out is None else out + o
        o_ref[0, :, cols, :] = out.astype(qkv.dtype).reshape(wh, Gww, C)


def _bwd_kernel(qkv_ref, biasc_ref, gmask_ref, dao_ref,
                dqkv_ref, dbias_ref,
                *, nh: int, scale: float, mask_per_group: bool, BWg: int,
                wh: int, Gww: int, C: int):
    GL = wh * Gww
    chunks = _head_chunks(nh)
    masks = [_chunk_mask(nh, h0, c, GL, C) for h0, c in chunks]
    for g in range(BWg):
        cols = slice(g * Gww, (g + 1) * Gww)
        qkv = qkv_ref[0][:, cols, :].reshape(GL, 3 * C)
        # scale folded into q (see _fwd_kernel); dq is unscaled until the
        # single (GL, C) multiply after the chunk loop
        q = qkv[:, :C] * jnp.asarray(scale, qkv.dtype)
        k = qkv[:, C:2 * C]
        v = qkv[:, 2 * C:]
        dao = dao_ref[0][:, cols, :].reshape(GL, C)
        gm = gmask_ref[g if mask_per_group else 0].astype(jnp.float32)
        dq_acc = dk_acc = dv_acc = None
        dbias_parts = []
        for ci, (h0, chunk) in enumerate(chunks):
            mask = masks[ci]
            kexp = _expand(k, chunk, mask)
            vexp = _expand(v, chunk, mask)
            logits = jax.lax.dot_general(
                q, kexp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            logits = logits \
                + biasc_ref[:, h0 * GL:(h0 + chunk) * GL].astype(jnp.float32)
            # fp32 probs (softmax-backward stability)
            pr32 = _seg_softmax_fwd(logits, gm, GL, chunk, jnp.float32)
            pr = pr32.astype(qkv.dtype)

            # dpr = dao @ vexp^T ; dvexp = pr^T @ dao
            dpr = jax.lax.dot_general(
                dao, vexp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (GL, cGL)
            dvexp = jax.lax.dot_general(
                pr, dao, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (cGL, C)

            # segmented softmax backward: ds = p*(d - rowsum(d*p)); the
            # product runs full-width, only the row sums are per-segment
            t = pr32 * dpr                                 # (GL, cGL) fp32
            ds_segs = []
            for j in range(chunk):
                seg = slice(j * GL, (j + 1) * GL)
                rs = jnp.sum(t[:, seg], axis=-1, keepdims=True)
                ds_segs.append(t[:, seg] - pr32[:, seg] * rs)
            ds = jnp.concatenate(ds_segs, axis=1)          # (GL, cGL) fp32
            dbias_parts.append(ds)
            # bf16 cast before the dq/dk dots: measured bit-identical on v5e
            # to feeding fp32 ds (Mosaic rounds fp32 dot operands to bf16 at
            # default precision anyway) and halves the operand VMEM
            ds16 = ds.astype(qkv.dtype)

            # dq = ds @ kexp (scale applied after the chunk loop);
            # dkexp = ds^T @ (scale*q)
            dq_c = jax.lax.dot_general(
                ds16, kexp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (GL, C)
            dkexp = jax.lax.dot_general(
                ds16, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (cGL, C)

            # collapse expansions: sum masked row-blocks back to (GL, C)
            zero = jnp.zeros((), jnp.float32)
            dk_c = dv_c = None
            for j in range(chunk):
                rows = slice(j * GL, (j + 1) * GL)
                mrow = masks[ci][rows]
                kb = jnp.where(mrow, dkexp[rows], zero)
                vb = jnp.where(mrow, dvexp[rows], zero)
                dk_c = kb if dk_c is None else dk_c + kb
                dv_c = vb if dv_c is None else dv_c + vb

            dq_acc = dq_c if dq_acc is None else dq_acc + dq_c
            dk_acc = dk_c if dk_acc is None else dk_acc + dk_c
            dv_acc = dv_c if dv_acc is None else dv_acc + dv_c

        dq_acc = dq_acc * jnp.asarray(scale, jnp.float32)
        dqkv = jnp.concatenate([dq_acc, dk_acc, dv_acc], axis=1)
        dqkv_ref[0, :, cols, :] = dqkv.astype(dqkv_ref.dtype).reshape(
            wh, Gww, 3 * C)

        dbias = jnp.concatenate(dbias_parts, axis=1)       # (GL, nh*GL)

        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
                 & (g == 0))
        def _():
            dbias_ref[:] = dbias

        @pl.when((pl.program_id(0) > 0) | (pl.program_id(1) > 0) | (g > 0))
        def _():
            dbias_ref[:] = dbias_ref[:] + dbias


def _groups_per_step(nWg: int, GL: int, C: int, nh: int, bwd: bool) -> int:
    chunk = _head_chunks(nh)[0][1]
    # seg-buffer counts include the full-width gm tile / exp / product
    # buffers of the restructured softmax (see _seg_softmax_fwd)
    per_group = (chunk * GL * GL * 4 * (5 if not bwd else 8)  # seg buffers
                 + 2 * chunk * GL * C * 2                     # kexp/vexp
                 + (4 if not bwd else 8) * GL * C * 4)        # io + grads
    import os
    # 24 MB default (scoped-vmem limit raised to match): +1.6% train step
    # over the old 11 MB, +2.5% composed with the MLP-bwd bump (r5 A/B,
    # batch 8 flagship).  Raising the 32-group cap measured a LOSS (-1.7%).
    budget = int(float(os.environ.get("TULIP_TPU_ATTN_BUDGET_MB", "24"))
                 * 1024 * 1024)
    cap = int(os.environ.get("TULIP_TPU_ATTN_MAXG", "32"))
    BWg = max(1, min(nWg, budget // per_group, cap))
    while nWg % BWg:
        BWg -= 1
    return BWg


def _call(kernel_body, qkv, bias_cat, gmask, dao, nh, scale, nH, bwd,
          interpret):
    R, wh, W, C3 = qkv.shape
    C = C3 // 3
    GL = bias_cat.shape[0]                 # bias is (GL, nh*GL) column-concat
    Gww = GL // wh
    nWg = W // Gww
    mask_per_group = gmask.shape[0] != 1
    BWg = _groups_per_step(nWg, GL, C, nh, bwd)
    nWB = nWg // BWg

    qkv_spec = pl.BlockSpec((1, wh, BWg * Gww, 3 * C),
                            lambda i, j: (i, 0, j, 0),
                            memory_space=pltpu.VMEM)
    io_spec = pl.BlockSpec((1, wh, BWg * Gww, C), lambda i, j: (i, 0, j, 0),
                           memory_space=pltpu.VMEM)
    bias_shape = (GL, nh * GL)
    biasc_spec = pl.BlockSpec(bias_shape, lambda i, j: (0, 0),
                              memory_space=pltpu.VMEM)
    if mask_per_group:
        # gmask rows are (h_row, wg) row-major over (nH, nWg); grid row
        # i = b * nH + h_row
        gmask_spec = pl.BlockSpec(
            (BWg, GL, GL),
            lambda i, j: ((i % nH) * nWB + j, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        gmask_spec = pl.BlockSpec((1, GL, GL), lambda i, j: (0, 0, 0),
                                  memory_space=pltpu.VMEM)

    kernel = functools.partial(kernel_body, nh=nh, scale=scale,
                               mask_per_group=mask_per_group, BWg=BWg,
                               wh=wh, Gww=Gww, C=C)
    grid = (R, nWB)
    import os
    budget_mb = float(os.environ.get("TULIP_TPU_ATTN_BUDGET_MB", "11"))
    cparams = None
    if budget_mb > 12:
        from jax.experimental.pallas import tpu as pltpu2
        cparams = pltpu2.CompilerParams(vmem_limit_bytes=min(
            int(2 * budget_mb * 1024 * 1024) + 8 * 1024 * 1024,
            100 * 1024 * 1024))
    if not bwd:
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[qkv_spec, biasc_spec, gmask_spec],
            out_specs=io_spec,
            out_shape=jax.ShapeDtypeStruct((R, wh, W, C), qkv.dtype),
            interpret=interpret,
            compiler_params=cparams,
        )(qkv, bias_cat, gmask)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec, biasc_spec, gmask_spec, io_spec],
        out_specs=[qkv_spec, biasc_spec],
        out_shape=[
            jax.ShapeDtypeStruct((R, wh, W, 3 * C), qkv.dtype),
            jax.ShapeDtypeStruct(bias_shape, jnp.float32),
        ],
        interpret=interpret,
        compiler_params=cparams,
    )(qkv, bias_cat, gmask, dao)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def attn_core(qkv: jnp.ndarray, bias_cat: jnp.ndarray, gmask: jnp.ndarray,
              nh: int, scale: float, nH: int) -> jnp.ndarray:
    """Natural-layout grouped window attention with Pallas fwd AND bwd.

    qkv (R, wh, W, 3C) fused [q|k|v] -> ao (R, wh, W, C); each (wh, Gww)
    tile attends internally (Gww = GL // wh from bias_cat).  bias_cat and
    gmask are in NATURAL token order (natural_token_perm); bias_cat is
    differentiable, gmask constant.  nH = window rows per image (locates a
    row-strip's masks within gmask)."""
    interpret = jax.default_backend() == "cpu"
    return _call(_fwd_kernel, qkv, bias_cat, gmask, None, nh, scale, nH,
                 False, interpret)


def _xla_core(qkv, bias_cat, gmask, nh, scale, nH):
    """Pure-XLA twin of the natural-layout core (same math, same layouts,
    matches the kernel exactly in fp32) — reference implementation for
    tests and numerics attribution."""
    R, wh, W, C3 = qkv.shape
    C = C3 // 3
    GL = bias_cat.shape[0]
    Gww = GL // wh
    nWg = W // Gww
    hd = C // nh
    # (R, wh, W, 3C) -> (R, nWg, GL, 3C) natural tile token order (row-major
    # over the (wh, Gww) tile)
    t = qkv.reshape(R, wh, nWg, Gww, C3).transpose(0, 2, 1, 3, 4)
    t = t.reshape(R, nWg, GL, C3)
    q, k, v = t[..., :C], t[..., C:2 * C], t[..., 2 * C:]
    q = (q * jnp.asarray(scale, q.dtype)).reshape(R, nWg, GL, nh, hd)
    k = k.reshape(R, nWg, GL, nh, hd)
    v = v.reshape(R, nWg, GL, nh, hd)
    logits = jnp.einsum("rgind,rgjnd->rgnij", q, k,
                        preferred_element_type=jnp.float32)
    bias = bias_cat.reshape(GL, nh, GL).transpose(1, 0, 2)   # (nh, GL, GL)
    logits = logits + bias[None, None]
    if gmask.shape[0] == 1:
        logits = logits + gmask[0][None, None, None].astype(jnp.float32)
    else:
        # group index for (r, wg) = (r % nH) * nWg + wg
        r_idx = (jnp.arange(R) % nH)[:, None] * nWg + jnp.arange(nWg)[None]
        logits = logits + gmask[r_idx][:, :, None].astype(jnp.float32)
    pr = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    o = jnp.einsum("rgnij,rgjnd->rgind", pr, v,
                   preferred_element_type=jnp.float32).astype(qkv.dtype)
    o = o.reshape(R, nWg, GL, C).reshape(R, nWg, wh, Gww, C)
    return o.transpose(0, 2, 1, 3, 4).reshape(R, wh, W, C)


def _vjp_fwd(qkv, bias_cat, gmask, nh, scale, nH):
    interpret = jax.default_backend() == "cpu"
    ao = _call(_fwd_kernel, qkv, bias_cat, gmask, None, nh, scale, nH,
               False, interpret)
    return ao, (qkv, bias_cat, gmask)


def _vjp_bwd(nh, scale, nH, res, dao):
    qkv, bias_cat, gmask = res
    interpret = jax.default_backend() == "cpu"
    dqkv, dbias = _call(_bwd_kernel, qkv, bias_cat, gmask,
                        dao.astype(qkv.dtype), nh, scale, nH, True,
                        interpret)
    return dqkv, dbias.astype(bias_cat.dtype), jnp.zeros_like(gmask)


attn_core.defvjp(_vjp_fwd, _vjp_bwd)
