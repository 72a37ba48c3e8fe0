"""Pallas fused shifted-window MSA kernel.

Replaces the hottest op of the model (BASELINE.json north star; ~40% of
forward time in the XLA grouped implementation, measured on v5e).  The XLA
path materializes qkv, fp32 logits and probabilities in HBM every block;
this kernel computes qkv -> per-window attention -> softmax -> PV -> proj
entirely in VMEM, so HBM traffic per block drops to x-in + out + weights.

Works on the grouped window layout of models/swin.py (G windows fused to
GL = G * L <= 128 tokens, block-diagonal additive mask — see
_grouped_statics): the per-group attention matmuls are 128x128-shaped for
the MXU, and the group mask/relative-position bias arrive as precomputed
fp32 arrays.

Grid: (B, nG / BG) where BG groups are processed per step; weights and the
bias table use constant index maps so Pallas keeps them resident in VMEM
across steps.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
            bproj_ref, bias_ref, gmask_ref, o_ref, *, nh: int, scale: float,
            mask_per_group: bool, fuse_ln: bool, residual: bool,
            eps: float):
    BG, GL, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    hd = C // nh

    x = x_ref[0].reshape(BG * GL, C)                          # bf16
    if fuse_ln:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        xn = (x32 - mean) * jax.lax.rsqrt(var + eps)
        xn = (xn * lnw_ref[0].astype(jnp.float32)
              + lnb_ref[0].astype(jnp.float32)).astype(x.dtype)
    else:
        xn = x
    qkv = jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)

    # Head peeling via 2-D lane slices (Mosaic cannot split the lane dim in
    # a reshape), then stacked into (BG*nh, GL, hd) so QK^T / PV run as two
    # batched dots and the softmax is one vectorized region — the per-(g, h)
    # op-chain version serialized ~2x slower on the MXU.
    qs, ks, vs = [], [], []
    for g in range(BG):
        rows = slice(g * GL, (g + 1) * GL)
        for h in range(nh):
            qs.append(qkv[rows, h * hd:(h + 1) * hd])
            ks.append(qkv[rows, C + h * hd:C + (h + 1) * hd])
            vs.append(qkv[rows, 2 * C + h * hd:2 * C + (h + 1) * hd])
    q = jnp.stack(qs)                                         # (BG*nh, GL, hd)
    k = jnp.stack(ks)
    v = jnp.stack(vs)

    # softmax dtype follows the compute dtype: fp32 inputs (checkpoint-parity
    # eval) keep fp32 logits; bf16 inference halves the dominant VMEM buffer
    # (allowing 2x groups per step) and doubles VPU throughput
    sm_t = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    attn = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)   # Mosaic matmul acc is 32-bit
    attn = attn.astype(sm_t)                                  # (BG*nh, GL, GL)
    attn = attn * jnp.asarray(scale, sm_t) \
        + jnp.tile(bias_ref[:], (BG, 1, 1)).astype(sm_t)
    if mask_per_group:
        attn = attn + jnp.repeat(gmask_ref[:], nh, axis=0).astype(sm_t)
    else:
        attn = attn + gmask_ref[0][None].astype(sm_t)
    pr = _softmax(attn, sm_t, x.dtype)

    pv = jax.lax.dot_general(
        pr, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                   # (BG*nh, GL, hd)
    outs = [jnp.concatenate([pv[g * nh + h] for h in range(nh)], axis=-1)
            for g in range(BG)]
    out = jnp.concatenate(outs, axis=0).astype(x.dtype)       # (BG*GL, C)

    out = jnp.dot(out, wproj_ref[:], preferred_element_type=jnp.float32)
    out = out + bproj_ref[0].astype(jnp.float32)
    if residual:
        out = out + x.astype(jnp.float32)
    o_ref[0] = out.astype(x.dtype).reshape(BG, GL, C)


def _kernel_masked(x_ref, lnw_ref, lnb_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                   wv_ref, bv_ref, wproj_ref, bproj_ref, bias_ref, gmask_ref,
                   o_ref, *, nh: int, scale: float, mask_per_group: bool,
                   fuse_ln: bool, residual: bool, eps: float):
    """Masked-head core: no lane-dim head slicing, no stacks/concats, no
    tile/repeat of bias or mask.

    Per-head logits are computed as (q ⊙ m_h) @ kᵀ over the FULL channel
    width — q's columns outside head h are zeroed, so cross-head products
    vanish exactly (adding fp zeros is exact; numerics identical to the
    peel core).  PV is accumulated as Σ_h pr_h @ (v ⊙ m_h): head h's
    output lands in its own column block, zeros elsewhere.  This trades
    nh× the (tiny) attention-matmul FLOPs for the removal of every
    unaligned VREG relayout the peel core pays: ~3·BG·nh lane slices,
    2 stacks, BG concats, and ~BG·nh·GL·GL fp32 of bias/mask tiling per
    grid step (the dominant VPU cost at stage 0 per the r3 trace:
    1.44 ms/call vs a 0.13 ms HBM roofline).  Only used where nh is
    small (see _MASKED_NH_MAX); deep stages keep the peel core, whose
    per-head FLOPs advantage matters when nh·C is large."""
    BG, GL, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    hd = C // nh

    x = x_ref[0].reshape(BG * GL, C)                          # bf16
    if fuse_ln:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        xn = (x32 - mean) * jax.lax.rsqrt(var + eps)
        xn = (xn * lnw_ref[0].astype(jnp.float32)
              + lnb_ref[0].astype(jnp.float32)).astype(x.dtype)
    else:
        xn = x

    def proj(w_ref, b_ref):
        y = jnp.dot(xn, w_ref[:], preferred_element_type=jnp.float32)
        y = (y + b_ref[0].astype(jnp.float32)).astype(x.dtype)
        return y.reshape(BG, GL, C)

    q = proj(wq_ref, bq_ref)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)

    sm_t = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    head_of_col = jax.lax.broadcasted_iota(jnp.int32, (BG, GL, C), 2) // hd

    acc = jnp.zeros((BG, GL, C), jnp.float32)
    for h in range(nh):
        qm = jnp.where(head_of_col == h, q, jnp.zeros((), q.dtype))
        attn = jax.lax.dot_general(
            qm, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)               # (BG, GL, GL)
        attn = attn.astype(sm_t) * jnp.asarray(scale, sm_t) \
            + bias_ref[h].astype(sm_t)                        # bcast over BG
        if mask_per_group:
            attn = attn + gmask_ref[:].astype(sm_t)
        else:
            attn = attn + gmask_ref[0][None].astype(sm_t)
        pr = _softmax(attn, sm_t, x.dtype)
        vm = jnp.where(head_of_col == h, v, jnp.zeros((), v.dtype))
        acc = acc + jax.lax.dot_general(
            pr, vm, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)               # (BG, GL, C)

    out = acc.astype(x.dtype).reshape(BG * GL, C)
    out = jnp.dot(out, wproj_ref[:], preferred_element_type=jnp.float32)
    out = out + bproj_ref[0].astype(jnp.float32)
    if residual:
        out = out + x.astype(jnp.float32)
    o_ref[0] = out.astype(x.dtype).reshape(BG, GL, C)


def _compiler_params():
    """Mosaic compile params for the MSA kernels: raise the scoped-vmem
    limit in step with the working-set budget (the default ~16 MB limit
    rejects budgets above ~13 MB; v5e VMEM is 128 MB)."""
    budget = _vmem_budget()
    if budget <= 12 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=min(
        2 * budget + 8 * 1024 * 1024, 100 * 1024 * 1024))


def _vmem_budget() -> int:
    """Per-grid-step VMEM working-set budget for the MSA kernels (bytes).
    Bigger budget -> fewer, larger grid steps (less per-step fixed cost) at
    the price of VMEM pressure.  TULIP_TPU_MSA_BUDGET_MB overrides; the
    24 MB default (with the scoped-vmem limit raised to match) measured
    +0.6% over the old 10 MB on the batch-32 flagship (r5 A/B), composing
    to +1.2% with the 6 MB MLP tile."""
    return int(float(os.environ.get("TULIP_TPU_MSA_BUDGET_MB", "24"))
               * 1024 * 1024)


def _softmax(attn, sm_t, out_dtype):
    """In-kernel softmax over the last axis.

    bf16 compute: clamped-softmax — exp without the max-subtraction
    (softmax is shift-invariant, so skipping the shift is EXACT in real
    arithmetic; bf16 exp is finite for x <= ~88 and the clamp at 40 bounds
    it, with sums of <=128 terms <= 3e19 << bf16 max).  Saves 2 of the ~6
    VPU passes over the logits — measured +2.2% end-to-end (r4).  The -1e9
    mask entries exp to an exact 0.  Only pathological logits > 40 (never
    reached by LN-bounded trained weights; parity suites sit around |x|<20)
    would degrade, gracefully, toward uniform-over-clamped.

    fp32 compute (checkpoint-parity eval): exact max-subtracted softmax.

    TULIP_TPU_SM_PROBE (measurement-only, WRONG numerics): 'skip' returns
    the raw logits (bounds the whole softmax's cost), 'cheap' replaces exp
    with a 1-op square (isolates the transcendental's cost from the pass
    structure).
    """
    probe = os.environ.get("TULIP_TPU_SM_PROBE", "")
    if probe == "skip":
        return attn.astype(out_dtype)
    if sm_t == jnp.float32:
        attn = attn - jnp.max(attn, axis=-1, keepdims=True)
        e = jnp.exp(attn)
        return (e / jnp.sum(e, axis=-1, keepdims=True)).astype(out_dtype)
    attn = jnp.minimum(attn, jnp.asarray(40.0, sm_t))
    e = attn * attn if probe == "cheap" else jnp.exp(attn)
    if probe == "nonorm":   # keep min+exp+cast, skip sum+normalize
        return e.astype(out_dtype)
    # reciprocal-broadcast then multiply: the division runs over the full
    # (.., GL, GL) logits; the reciprocal only over the (.., GL, 1) sums
    r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
    return (e * r).astype(out_dtype)


def _ln_rows(x, w_ref, b_ref, eps):
    """fp32 LayerNorm over (T, C) rows, scaled/shifted, cast back to x.dtype."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    xn = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (xn * w_ref[0].astype(jnp.float32)
            + b_ref[0].astype(jnp.float32)).astype(x.dtype)


def _packed_chunks(nh: int, max_chunk: int = 4):
    """Head chunking for the packed (expanded-head) core: chunks of <= 4
    heads bound the (GL, chunk*GL) fp32 logits tile to <= 256 KB."""
    chunk = min(nh, max_chunk)
    while nh % chunk:
        chunk -= 1
    return [(h0, chunk) for h0 in range(0, nh, chunk)]


def use_packed_msa() -> bool:
    """Expanded-head packed logits in the masked-nat inference core.
    Measured r5 (batch 32, flagship): plain packed 773.6 vs per-head 777.6
    (wash); packed + matmul-softmax 745.0 (loses — the (., ch)-lane sums
    matmul and fp32 expansion matmul cost more than the VPU reduces they
    replace).  Default stays the per-head loop; TULIP_TPU_MSA_PACKED=1
    selects the packed core for re-measurement."""
    return os.environ.get("TULIP_TPU_MSA_PACKED", "0") == "1"


def _masked_nat_attn(x, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                     wproj_ref, bproj_ref, bias_ref, gmask_ref, lnw_ref,
                     lnb_ref, *, nh, scale, mask_per_group, fuse_ln, residual,
                     eps, RB, BWg, wh, Gww, add_gmask=True, packed=False):
    """Shared attention body of the masked-nat kernels: natural (T, C) rows
    in -> fp32 natural (T, C) rows out (proj output, + residual when
    ``residual``).  ``add_gmask=False`` skips the in-kernel mask add (the
    caller pre-folded the shared mask into the bias table — one VPU pass
    per head per group saved on every unshifted block).

    ``packed``: expanded-head core (attn_core.py insight #2 brought to the
    fused inference kernel).  Per head chunk, K/V are tiled along sublanes
    and masked head-block-diagonal, so ONE pair of wide batched matmuls
    computes every head's logits/PV:

        kexp = tile(K, ch) ⊙ m          # (NB, ch*GL, C), zeros off-block
        logits = Q @ kexpᵀ              # (NB, GL, ch*GL): seg h = q_h k_hᵀ
        pr = segmented softmax          # one full-width exp pass
        out = pr @ vexp                 # (NB, GL, C) — no per-head acc

    Q needs no masking (kexp's zeros kill cross-head terms exactly), the
    bias add/exp run once full-width instead of per head, and the matmul
    count per group drops from 2*nh to 2*ceil(nh/ch).  FLOPs are the same
    nh-redundant count as the per-head loop; what changes is op-dispatch
    and VPU-pass count.  ``bias_ref`` is (GL, nh*GL) column-concat in this
    mode (vs (nh, GL, GL))."""
    C = x.shape[1]
    GL = wh * Gww
    hd = C // nh
    NB = RB * BWg                                             # groups per step

    xn = _ln_rows(x, lnw_ref, lnb_ref, eps) if fuse_ln else x

    def proj(w_ref, b_ref):
        y = jnp.dot(xn, w_ref[:], preferred_element_type=jnp.float32)
        y = (y + b_ref[0].astype(jnp.float32)).astype(x.dtype)
        # rows are (s, r, g, w)-ordered; regroup to ((s, g), (r, w)) =
        # (NB, GL, C).  Outer-dim transpose + sublane-aligned merges: free
        # in Mosaic.
        return (y.reshape(RB, wh, BWg, Gww, C).transpose(0, 2, 1, 3, 4)
                .reshape(NB, GL, C))

    q = proj(wq_ref, bq_ref)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)

    sm_t = jnp.float32 if x.dtype == jnp.float32 else x.dtype

    if packed:
        acc = None
        for h0, ch in _packed_chunks(nh):
            cGL = ch * GL
            rh = jax.lax.broadcasted_iota(jnp.int32, (cGL, C), 0) // GL + h0
            chm = jax.lax.broadcasted_iota(jnp.int32, (cGL, C), 1) // hd
            m = rh == chm
            kexp = jnp.where(m, jnp.concatenate([k] * ch, axis=1),
                             jnp.zeros((), k.dtype))          # (NB, cGL, C)
            vexp = jnp.where(m, jnp.concatenate([v] * ch, axis=1),
                             jnp.zeros((), v.dtype))
            logits = jax.lax.dot_general(
                q, kexp, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)           # (NB, GL, cGL)
            s = logits.astype(sm_t)
            if scale != 1.0:  # callers fold scale into wq/bq
                s = s * jnp.asarray(scale, sm_t)
            s = s + bias_ref[:, h0 * GL:(h0 + ch) * GL].astype(sm_t)[None]
            if add_gmask:
                gm = (gmask_ref[:] if mask_per_group
                      else gmask_ref[0][None]).astype(sm_t)
                if ch > 1:
                    gm = jnp.concatenate([gm] * ch, axis=-1)
                s = s + gm
            if sm_t == jnp.float32:
                # exact per-segment softmax (checkpoint-parity eval)
                segs = []
                for j in range(ch):
                    seg = s[..., j * GL:(j + 1) * GL]
                    seg = seg - jnp.max(seg, axis=-1, keepdims=True)
                    e = jnp.exp(seg)
                    segs.append(e / jnp.sum(e, axis=-1, keepdims=True))
                pr = jnp.concatenate(segs, axis=-1).astype(x.dtype)
                o = jax.lax.dot_general(
                    pr, vexp, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)       # (NB, GL, C)
            else:
                # Matmul-softmax (bf16): the VPU lane-reduce + full-width
                # normalize multiply were ~2.6 ms/step of the batch-32
                # flagship forward (TULIP_TPU_SM_PROBE=skip measurement,
                # r5); the exp itself measured free.  So: exp the clamped
                # logits once, take the per-segment sums on the MXU with a
                # head-block-diagonal ones matrix, run PV UNNORMALIZED, and
                # fold the normalization into a per-(row, head-block) scale
                # of the (GL, C) output — softmax row-scaling commutes
                # through the PV contraction, and the multiply area drops
                # from GL x ch*GL logits to GL x C output.
                e = jnp.exp(jnp.minimum(s, jnp.asarray(40.0, sm_t)))
                rows2 = jax.lax.broadcasted_iota(jnp.int32, (cGL, ch), 0)
                cols2 = jax.lax.broadcasted_iota(jnp.int32, (cGL, ch), 1)
                ones_blk = (rows2 // GL == cols2).astype(e.dtype)
                ssum = jnp.dot(e.reshape(NB * GL, cGL), ones_blk,
                               preferred_element_type=jnp.float32)
                recip = 1.0 / ssum                            # (NB*GL, ch)
                rows3 = jax.lax.broadcasted_iota(jnp.int32, (ch, C), 0)
                cols3 = jax.lax.broadcasted_iota(jnp.int32, (ch, C), 1)
                expand = (cols3 // hd == rows3 + h0).astype(jnp.float32)
                rexp = jnp.dot(recip, expand,
                               preferred_element_type=jnp.float32)
                o = jax.lax.dot_general(
                    e.astype(x.dtype), vexp, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)       # (NB, GL, C)
                o = o * rexp.reshape(NB, GL, C)
            acc = o if acc is None else acc + o
    elif sm_t == jnp.float32 or os.environ.get("TULIP_TPU_SM_OUTSCALE") != "1":
        head_of_col = jax.lax.broadcasted_iota(jnp.int32, (NB, GL, C), 2) // hd
        acc = jnp.zeros((NB, GL, C), jnp.float32)
        for h in range(nh):
            qm = jnp.where(head_of_col == h, q, jnp.zeros((), q.dtype))
            attn = jax.lax.dot_general(
                qm, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)           # (NB, GL, GL)
            attn = attn.astype(sm_t)
            if scale != 1.0:  # callers fold scale into wq/bq (as the torch
                attn = attn * jnp.asarray(scale, sm_t)   # reference scales q)
            attn = attn + bias_ref[h].astype(sm_t)           # bcast over NB
            if add_gmask:
                if mask_per_group:
                    attn = attn + gmask_ref[:].astype(sm_t)
                else:
                    attn = attn + gmask_ref[0][None].astype(sm_t)
            pr = _softmax(attn, sm_t, x.dtype)
            vm = jnp.where(head_of_col == h, v, jnp.zeros((), v.dtype))
            acc = acc + jax.lax.dot_general(
                pr, vm, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)           # (NB, GL, C)
    elif os.environ.get("TULIP_TPU_SM_MXU") != "1":
        # OUTPUT-SCALED softmax (TULIP_TPU_SM_OUTSCALE=1, experimental —
        # the first on-chip measurement attempt stalled >30 min in remote
        # compile and was killed before producing a number; NOT the
        # default until that is understood).  Row-scaling commutes
        # through the PV contraction, and head h's (e_h @ vm_h) product is
        # zero outside head h's column block — so the reciprocal can
        # multiply the (GL, C) PV OUTPUT with a native (GL, 1) broadcast
        # instead of normalizing the (GL, GL) probabilities.  Removes the
        # full-width normalize multiply and the pr cast per head; only the
        # lane-reduce sum remains of the classic softmax's VPU cost.
        # (Probe context, r5: no-normalize ceiling 838.9 vs 793.0 img/s;
        # the MXU-sum and packed matmul-softmax replacements both LOST —
        # this variant keeps the sum on the VPU and attacks the multiply.
        # TULIP_TPU_SM_OUTSCALE=0 reverts to the probability-normalized
        # path, TULIP_TPU_SM_MXU=1 selects the MXU-summed variant.)
        head_of_col = jax.lax.broadcasted_iota(jnp.int32, (NB, GL, C), 2) // hd
        acc = jnp.zeros((NB, GL, C), jnp.float32)
        for h in range(nh):
            qm = jnp.where(head_of_col == h, q, jnp.zeros((), q.dtype))
            attn = jax.lax.dot_general(
                qm, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)           # (NB, GL, GL)
            attn = attn.astype(sm_t)
            if scale != 1.0:
                attn = attn * jnp.asarray(scale, sm_t)
            attn = attn + bias_ref[h].astype(sm_t)           # bcast over NB
            if add_gmask:
                if mask_per_group:
                    attn = attn + gmask_ref[:].astype(sm_t)
                else:
                    attn = attn + gmask_ref[0][None].astype(sm_t)
            e = jnp.exp(jnp.minimum(attn, jnp.asarray(40.0, sm_t)))
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)      # (NB, GL, 1)
            vm = jnp.where(head_of_col == h, v, jnp.zeros((), v.dtype))
            o = jax.lax.dot_general(
                e, vm, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)           # (NB, GL, C)
            acc = acc + o * r.astype(jnp.float32)
    else:
        # bf16 fast path: MXU-summed softmax.  The VPU lane-reduce +
        # normalize multiply measured 2.2 ms/step of the batch-32 flagship
        # forward (TULIP_TPU_SM_PROBE=nonorm, r5) while the exp itself is
        # free.  So: exp the clamped logits, feed them UNNORMALIZED into
        # the PV matmul, and take each head's row sums on the MXU with an
        # all-ones (GL, hd) matrix — every output lane of that dot IS the
        # row sum, i.e. the sum arrives pre-broadcast across the head's hd
        # lanes with no VPU reduce and no lane slicing.  One fp32
        # reciprocal over (GL, C) + one multiply normalizes the whole
        # accumulator (softmax row-scaling commutes through PV).
        head_of_col = jax.lax.broadcasted_iota(jnp.int32, (NB, GL, C), 2) // hd
        ones_sum = jnp.ones((GL, hd), x.dtype)
        acc = jnp.zeros((NB, GL, C), jnp.float32)
        sums = []
        for h in range(nh):
            qm = jnp.where(head_of_col == h, q, jnp.zeros((), q.dtype))
            attn = jax.lax.dot_general(
                qm, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)           # (NB, GL, GL)
            attn = attn.astype(sm_t)
            if scale != 1.0:
                attn = attn * jnp.asarray(scale, sm_t)
            attn = attn + bias_ref[h].astype(sm_t)           # bcast over NB
            if add_gmask:
                if mask_per_group:
                    attn = attn + gmask_ref[:].astype(sm_t)
                else:
                    attn = attn + gmask_ref[0][None].astype(sm_t)
            e = jnp.exp(jnp.minimum(attn, jnp.asarray(40.0, sm_t)))
            sums.append(jnp.dot(e.reshape(NB * GL, GL), ones_sum,
                                preferred_element_type=jnp.float32))
            vm = jnp.where(head_of_col == h, v, jnp.zeros((), v.dtype))
            acc = acc + jax.lax.dot_general(
                e, vm, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)           # (NB, GL, C)
        rf = 1.0 / jnp.concatenate(sums, axis=-1)             # (NB*GL, C)
        acc = acc * rf.reshape(NB, GL, C)

    out = (acc.astype(x.dtype).reshape(RB, BWg, wh, Gww, C)
           .transpose(0, 2, 1, 3, 4)
           .reshape(RB * wh * BWg * Gww, C))                  # natural rows
    out = jnp.dot(out, wproj_ref[:], preferred_element_type=jnp.float32)
    out = out + bproj_ref[0].astype(jnp.float32)
    if residual:
        out = out + x.astype(jnp.float32)
    return out                                                # fp32 (T, C)


def _kernel_masked_nat(x_ref, *rest, nh: int, scale: float,
                       mask_per_group: bool, fuse_ln: bool, residual: bool,
                       eps: float, RB: int, BWg: int, wh: int, Gww: int,
                       add_gmask: bool = True, dh: int = 0, dw: int = 0,
                       packed: bool = False):
    """Natural-layout masked-head core: the masked-head math of
    _kernel_masked on contiguous (RB, wh, BWg*Gww, C) row-strip tiles — the
    partition "transpose" happens on VMEM-resident q/k/v as an outer-dim
    transpose (a static register renaming in Mosaic, zero data movement),
    so the XLA-side window-partition copies of the grouped path
    (~730 MB/step at batch 16, ~11% of device time per the r3 trace)
    disappear entirely.  bias/mask arrive permuted to natural token order
    (attn_core.natural_token_perm); LN/qkv/proj GEMMs run on the natural
    flat (T, C) rows, which is layout-invariant.  RB row-strips per grid
    step keep the per-step group count (RB*BWg) at the grouped kernel's
    level so grid overhead matches (one strip = at most nWg groups, e.g. 8
    at stage 0 vs the grouped kernel's 32 per step).

    (dh, dw): in-kernel shifted-window frame change — the tile is assembled
    as roll_hw(storage, -dh, -dw) from the block plus an |dh|-row halo strip
    (second operand, present iff dh != 0), so the XLA-side roll copies of
    the shifted blocks (HBM read+write of the whole activation, 2x per
    shifted block) never happen.  eff[r] = storage[r + dh] — the halo is
    the next strip's first dh rows (dh > 0) or the previous strip's last
    -dh rows (dh < 0); the W-rotation is a static sublane concat on the
    VMEM-resident tile.  Output is written in the kernel's own (rolled)
    frame; the caller tracks frames across blocks (models/swin.py)."""
    if dh != 0:
        halo_ref, *rest = rest
    (lnw_ref, lnb_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
     wproj_ref, bproj_ref, bias_ref, gmask_ref, o_ref) = rest
    W = x_ref.shape[2]
    C = x_ref.shape[3]
    xt = x_ref[:]                                             # (RB, wh, W, C)
    if dh != 0:
        flat = xt.reshape(RB * wh, W, C)
        hal = halo_ref[0]                                     # (|dh|, W, C)
        if dh > 0:
            flat = jnp.concatenate([flat[dh:], hal], axis=0)
        else:
            flat = jnp.concatenate([hal, flat[:RB * wh + dh]], axis=0)
        xt = flat.reshape(RB, wh, W, C)
    if dw != 0:
        # eff[:, :, w] = storage[:, :, (w + dw) % W]
        xt = jnp.concatenate([xt[:, :, dw:], xt[:, :, :dw]], axis=2)
    x = xt.reshape(RB * wh * BWg * Gww, C)                    # natural rows
    out = _masked_nat_attn(
        x, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wproj_ref,
        bproj_ref, bias_ref, gmask_ref, lnw_ref, lnb_ref, nh=nh, scale=scale,
        mask_per_group=mask_per_group, fuse_ln=fuse_ln, residual=residual,
        eps=eps, RB=RB, BWg=BWg, wh=wh, Gww=Gww, add_gmask=add_gmask,
        packed=packed)
    o_ref[:] = out.astype(x.dtype).reshape(RB, wh, BWg * Gww, C)


def _kernel_nat(x_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                bproj_ref, bias_ref, gmask_ref, o_ref, *, nh: int,
                scale: float, mask_per_group: bool, fuse_ln: bool,
                residual: bool, eps: float, BWg: int, wh: int, Gww: int):
    """Natural-layout twin of _kernel: reads contiguous (wh, BWg*Gww, C)
    tiles of the (R, wh, W, C) row-strip layout (pure reshapes of the
    (B, H, W, C) activations — NO window-partition transpose in XLA), with
    bias/mask tables pre-permuted to natural token order (attn_core.py
    insight #1).  The compute core is identical to _kernel: whole-tile
    LN/qkv/proj GEMMs, per-(group, head) lane-slice peel, two batched dots,
    one vectorized softmax region."""
    GL = wh * Gww
    C = x_ref.shape[3]
    hd = C // nh

    x = x_ref[0].reshape(wh * BWg * Gww, C)                   # natural rows
    if fuse_ln:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        xn = (x32 - mean) * jax.lax.rsqrt(var + eps)
        xn = (xn * lnw_ref[0].astype(jnp.float32)
              + lnb_ref[0].astype(jnp.float32)).astype(x.dtype)
    else:
        xn = x
    qkv = jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)
    qkv3 = qkv.reshape(wh, BWg * Gww, 3 * C)

    # per-group (wh, Gww) -> (GL,) natural-token tiles, then the same
    # head-peel + batched-dot core as the grouped kernel
    qs, ks, vs = [], [], []
    for g in range(BWg):
        tile = qkv3[:, g * Gww:(g + 1) * Gww, :].reshape(GL, 3 * C)
        for h in range(nh):
            qs.append(tile[:, h * hd:(h + 1) * hd])
            ks.append(tile[:, C + h * hd:C + (h + 1) * hd])
            vs.append(tile[:, 2 * C + h * hd:2 * C + (h + 1) * hd])
    q = jnp.stack(qs)                                         # (BWg*nh, GL, hd)
    k = jnp.stack(ks)
    v = jnp.stack(vs)

    sm_t = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    attn = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    attn = attn.astype(sm_t)                                  # (BWg*nh, GL, GL)
    attn = attn * jnp.asarray(scale, sm_t) \
        + jnp.tile(bias_ref[:], (BWg, 1, 1)).astype(sm_t)
    if mask_per_group:
        attn = attn + jnp.repeat(gmask_ref[:], nh, axis=0).astype(sm_t)
    else:
        attn = attn + gmask_ref[0][None].astype(sm_t)
    pr = _softmax(attn, sm_t, x.dtype)

    pv = jax.lax.dot_general(
        pr, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                   # (BWg*nh, GL, hd)
    outs = [jnp.concatenate([pv[g * nh + h] for h in range(nh)], axis=-1)
            .reshape(wh, Gww, C) for g in range(BWg)]
    out = jnp.concatenate(outs, axis=1).astype(x.dtype)       # (wh, BWg*Gww, C)
    out = out.reshape(wh * BWg * Gww, C)

    out = jnp.dot(out, wproj_ref[:], preferred_element_type=jnp.float32)
    out = out + bproj_ref[0].astype(jnp.float32)
    if residual:
        out = out + x.astype(jnp.float32)
    o_ref[0] = out.astype(x.dtype).reshape(wh, BWg * Gww, C)


def _masked_nat_tiling(R, wh, W, C, GL, nh, nWg, nH, sm_bytes,
                       mask_per_group, halo, packed=False):
    """Grid sizing for the masked-nat kernels: (RB, BWg, nWB).

    ``halo`` (in-kernel frame change, dh != 0) additionally requires
    RB | nH so the halo strip's image-boundary wrap is block-computable."""
    ch = _packed_chunks(nh)[0][1] if packed else 1
    per_group = (3 * GL * C * (4 + 2)            # q/k/v fp32 accum + bf16
                 + GL * C * 4                    # PV accumulator
                 + ch * GL * GL * (4 + 4 + sm_bytes)  # logits, exp, probs
                 + 2 * ch * GL * C * 2           # (packed: kexp/vexp tiles)
                 + 2 * GL * C * 2                # io tiles
                 + GL * C * 4)                   # slack (masked copies)
    budget = _vmem_budget()
    # Groups per grid step: budget-driven, NOT pinned to the grouped
    # kernel's 32 — at stage-0 geometry a 32-group cap means a 512-step
    # grid whose fixed per-step cost dominates (the kernel measured ~9x
    # over both rooflines on-chip, r3).  Prefer whole-row strips
    # (nWB == 1) so the shifted case's contiguous-mask-block constraint
    # below still allows RB > 1.  128 vs 32 measured a wash on-chip
    # (710.1 vs 710.2 img/s, r4) — pinned at 128, A/B flag deleted.
    max_nb = 128
    BWg = max(1, min(nWg, budget // per_group, max_nb))
    while nWg % BWg:
        BWg -= 1
    nWB = nWg // BWg

    # Row-strips per grid step.  With a per-group mask the RB strips' mask
    # rows must be one contiguous block: requires whole-W strips
    # (nWB == 1) and RB | nH so a block never spans two batch images.
    RB = max(1, min(max(1, max_nb // BWg),
                    budget // (per_group * BWg), R))
    if mask_per_group and nWB != 1:
        RB = 1
    lim = nH if (mask_per_group or halo) else R
    while lim % RB or R % RB:
        RB -= 1
    return RB, BWg, nWB


def masked_nat_halo_ok(x4_shape, GL, nh, nH, dtype, mask_per_group,
                       dh: int) -> bool:
    """True iff _masked_nat_call can fold a (dh, *) frame change in-kernel:
    masked core applies, whole-W strips (nWB == 1), and the halo strip's
    row blocking is expressible (|dh| divides wh)."""
    R, wh, W, C = x4_shape
    Gww = GL // wh
    nWg = W // Gww
    if not _use_masked(nh):
        return False
    if dh != 0 and (abs(dh) >= wh or wh % abs(dh)):
        return False
    sm_bytes = 4 if dtype == jnp.float32 else 2
    _, _, nWB = _masked_nat_tiling(R, wh, W, C, GL, nh, nWg, nH, sm_bytes,
                                   mask_per_group, dh != 0,
                                   packed=use_packed_msa())
    return nWB == 1


def _masked_nat_call(x4, lnw, lnb, wqkv, bqkv, wproj, bproj, bias_nat,
                     gmask_nat, *, nh, scale, nH, eps, residual, interpret,
                     dh=0, dw=0):
    """pallas_call plumbing for _kernel_masked_nat (natural row-strip io)."""
    R, wh, W, C = x4.shape
    GL = bias_nat.shape[1]
    Gww = GL // wh
    nWg = W // Gww
    mask_per_group = gmask_nat.shape[0] != 1
    add_gmask = mask_per_group
    if not mask_per_group:
        # one shared (block-diagonal) mask: fold it into the bias table in
        # XLA (hoisted, one-time) and skip the in-kernel add — one VPU pass
        # per head per group saved on every unshifted block
        bias_nat = bias_nat + gmask_nat[0][None].astype(bias_nat.dtype)
    packed = use_packed_msa()
    if packed:
        # expanded-head core: bias as (GL, nh*GL) column-concat (hoisted)
        bias_nat = jnp.concatenate(
            [bias_nat[h] for h in range(bias_nat.shape[0])], axis=-1)
    wq, wk, wv = wqkv[:, :C], wqkv[:, C:2 * C], wqkv[:, 2 * C:]
    bq, bk, bv = bqkv[:, :C], bqkv[:, C:2 * C], bqkv[:, 2 * C:]
    # fold the attention scale into the q projection (the torch reference
    # scales q before the dot, tulip.py:301 — same order here) and skip
    # the in-kernel logits-scaling pass
    wq = (wq.astype(jnp.float32) * scale).astype(wq.dtype)
    bq = (bq.astype(jnp.float32) * scale).astype(bq.dtype)
    scale = 1.0

    sm_bytes = 4 if x4.dtype == jnp.float32 else 2
    RB, BWg, nWB = _masked_nat_tiling(R, wh, W, C, GL, nh, nWg, nH, sm_bytes,
                                      mask_per_group, dh != 0, packed=packed)
    if dh != 0 or dw != 0:
        # in-kernel frame change: gate with masked_nat_halo_ok before calling
        assert nWB == 1 and (dh == 0 or (abs(dh) < wh and wh % abs(dh) == 0
                                         and nH % RB == 0)), \
            (dh, dw, wh, RB, nH, nWB)

    grid = (R // RB, nWB)
    fuse_ln = lnw is not None
    if not fuse_ln:
        lnw = jnp.zeros((1, C), x4.dtype)
        lnb = jnp.zeros((1, C), x4.dtype)
    kernel = functools.partial(
        _kernel_masked_nat, nh=nh, scale=scale,
        mask_per_group=mask_per_group, fuse_ln=fuse_ln,
        residual=fuse_ln if residual is None else residual, eps=eps,
        RB=RB, BWg=BWg, wh=wh, Gww=Gww, add_gmask=add_gmask, dh=dh, dw=dw,
        packed=packed)
    if mask_per_group and nWB == 1:
        # gmask rows are (h_row, wg) row-major over (nH, nWg); grid row i
        # covers strips [i*RB, (i+1)*RB) = h_rows [(i*RB) % nH, ...+RB)
        # within one image, i.e. mask block (i % (nH // RB)) of size RB*nWg
        # (j is always 0 and BWg == nWg here).
        nHB = nH // RB
        gmask_spec = pl.BlockSpec((RB * BWg, GL, GL),
                                  lambda i, j: (i % nHB, 0, 0),
                                  memory_space=pltpu.VMEM)
    elif mask_per_group:
        # nWB > 1 forces RB == 1 above: strip i is (image, h_row = i % nH);
        # W-block j needs mask rows [(i % nH) * nWg + j*BWg, ...+BWg), i.e.
        # BWg-sized block ((i % nH) * nWB + j).
        gmask_spec = pl.BlockSpec((BWg, GL, GL),
                                  lambda i, j: ((i % nH) * nWB + j, 0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        gmask_spec = pl.BlockSpec((1, GL, GL), lambda i, j: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, C), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((C, C), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    io_spec = pl.BlockSpec((RB, wh, BWg * Gww, C), lambda i, j: (i, 0, j, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = (pl.BlockSpec((GL, nh * GL), lambda i, j: (0, 0),
                              memory_space=pltpu.VMEM) if packed
                 else pl.BlockSpec((nh, GL, GL), lambda i, j: (0, 0, 0),
                                   memory_space=pltpu.VMEM))
    in_specs = [
        io_spec, vec_spec, vec_spec,
        mat_spec, vec_spec,           # wq, bq
        mat_spec, vec_spec,           # wk, bk
        mat_spec, vec_spec,           # wv, bv
        mat_spec, vec_spec,           # wproj, bproj
        bias_spec,
        gmask_spec,
    ]
    operands = [x4, lnw, lnb, wq, bq, wk, bk, wv, bv, wproj, bproj,
                bias_nat, gmask_nat]
    if dh != 0:
        # halo strip: the |dh| rows the frame change pulls in from the strip
        # adjacent to this block, with the image-boundary wrap folded into
        # the block index (RB | nH asserted above).  x4 is passed a second
        # time under a (1, |dh|, W, C) spec — only |dh|/(RB*wh) extra reads.
        # (NB: fresh name — the gmask lambda above closes over nHB late.)
        spi = nH  # strips per image (first-dim blocks are single strips)
        if dh > 0:
            # next strip's first dh rows: second-dim block 0 of (wh//dh)
            halo_spec = pl.BlockSpec(
                (1, dh, W, C),
                lambda i, j: ((i * RB // spi) * spi + (i * RB + RB) % spi,
                              0, j, 0),
                memory_space=pltpu.VMEM)
        else:
            # previous strip's last -dh rows: second-dim block wh//|dh| - 1
            halo_spec = pl.BlockSpec(
                (1, -dh, W, C),
                lambda i, j: ((i * RB // spi) * spi + (i * RB - 1) % spi,
                              wh // (-dh) - 1, j, 0),
                memory_space=pltpu.VMEM)
        in_specs.insert(1, halo_spec)
        operands.insert(1, x4)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct(x4.shape, x4.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(*operands)


@functools.partial(jax.jit, static_argnames=("nh", "scale_inv_sqrt_hd", "nH",
                                             "interpret", "eps", "residual",
                                             "dh", "dw"))
def fused_window_msa_nat(x4, lnw, lnb, wqkv, bqkv, wproj, bproj, bias_nat,
                         gmask_nat, *, nh: int, scale_inv_sqrt_hd: float,
                         nH: int, interpret: bool = False, eps: float = 0.0,
                         residual: bool = None, dh: int = 0, dw: int = 0):
    """Natural-layout fused window MSA: x4 (R, wh, W, C) row-strips (R =
    B*nH), bias_nat (nh, GL, GL) and gmask_nat (nG or 1, GL, GL) in NATURAL
    token order (permute with attn_core.natural_token_perm).  Output in the
    same layout — callers need only reshapes, no partition transposes.

    (dh, dw) != (0, 0): the kernel additionally assembles its input as
    roll_hw(x4, -dh, -dw) in-kernel (halo reads + sublane rotation), so a
    shifted-window frame change costs no XLA roll copy; output stays in the
    kernel's (rolled) frame.  Gate with masked_nat_halo_ok — only the
    masked-head core supports it.

    Core selection mirrors fused_window_msa: masked-head for small nh
    (_use_masked), lane-slice peel beyond."""
    R, wh, W, C = x4.shape
    GL = bias_nat.shape[1]
    Gww = GL // wh
    nWg = W // Gww
    mask_per_group = gmask_nat.shape[0] != 1
    interpret = interpret or jax.default_backend() == "cpu"

    if _use_masked(nh):
        return _masked_nat_call(
            x4, lnw, lnb, wqkv, bqkv, wproj, bproj, bias_nat, gmask_nat,
            nh=nh, scale=scale_inv_sqrt_hd, nH=nH, eps=eps,
            residual=residual, interpret=interpret, dh=dh, dw=dw)
    assert dh == 0 and dw == 0, \
        "in-kernel frame change requires the masked-head core"

    sm_bytes = 4 if x4.dtype == jnp.float32 else 2
    hd_ = C // nh
    per_group = (GL * 3 * C * 4
                 + nh * GL * GL * (4 + sm_bytes + 2)
                 + 3 * nh * GL * hd_ * 4
                 + GL * C * 8)
    budget = _vmem_budget()
    BWg = max(1, min(nWg, budget // per_group, 32))
    while nWg % BWg:
        BWg -= 1
    nWB = nWg // BWg

    grid = (R, nWB)
    fuse_ln = lnw is not None
    if not fuse_ln:
        lnw = jnp.zeros((1, C), x4.dtype)
        lnb = jnp.zeros((1, C), x4.dtype)
    kernel = functools.partial(
        _kernel_nat, nh=nh, scale=scale_inv_sqrt_hd,
        mask_per_group=mask_per_group, fuse_ln=fuse_ln,
        residual=fuse_ln if residual is None else residual, eps=eps,
        BWg=BWg, wh=wh, Gww=Gww)
    if mask_per_group:
        # gmask rows are (h_row, wg) row-major over (nH, nWg); grid row
        # i = b * nH + h_row (same addressing as attn_core._call)
        gmask_spec = pl.BlockSpec((BWg, GL, GL),
                                  lambda i, j: ((i % nH) * nWB + j, 0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        gmask_spec = pl.BlockSpec((1, GL, GL), lambda i, j: (0, 0, 0),
                                  memory_space=pltpu.VMEM)

    io_spec = pl.BlockSpec((1, wh, BWg * Gww, C), lambda i, j: (i, 0, j, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            io_spec,
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, GL, GL), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            gmask_spec,
        ],
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct(x4.shape, x4.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(x4, lnw, lnb, wqkv, bqkv, wproj, bproj, bias_nat, gmask_nat)


def _use_masked(nh: int) -> bool:
    """Masked-head core cutover: heads cost nh× the attention-matmul FLOPs
    but zero VREG relayouts.  Profitable while nh is small (stages 0-1 carry
    ~all the runtime); override with TULIP_TPU_MSA_MASKED=0 (off) or =N
    (use for nh <= N)."""
    import os
    raw = os.environ.get("TULIP_TPU_MSA_MASKED", "")
    if raw == "":
        return nh <= 8
    return nh <= int(raw)


def _masked_call(xg, lnw, lnb, wqkv, bqkv, wproj, bproj, bias_big, gmask, *,
                 nh, scale, eps, residual, interpret):
    B, nG, GL, C = xg.shape
    mask_per_group = gmask.shape[0] != 1
    # weight/bias head splits happen here in XLA (hoisted, one-time) so the
    # kernel never lane-slices activations or weights
    wq, wk, wv = wqkv[:, :C], wqkv[:, C:2 * C], wqkv[:, 2 * C:]
    bq, bk, bv = bqkv[:, :C], bqkv[:, C:2 * C], bqkv[:, 2 * C:]

    sm_bytes = 4 if xg.dtype == jnp.float32 else 2
    # one head's logits at a time (the peel core holds all nh at once)
    per_group = (3 * GL * C * (4 + 2)
                 + GL * C * 4                    # PV accumulator
                 + GL * GL * (4 + 4 + sm_bytes)  # logits, exp, probs
                 + 2 * GL * C * 2                # io tiles
                 + GL * C * 4)                   # slack (masked copies)
    budget = _vmem_budget()
    BG = max(1, min(nG, budget // per_group, 32))
    while nG % BG:
        BG -= 1

    grid = (B, nG // BG)
    fuse_ln = lnw is not None
    if not fuse_ln:
        lnw = jnp.zeros((1, C), xg.dtype)
        lnb = jnp.zeros((1, C), xg.dtype)
    kernel = functools.partial(
        _kernel_masked, nh=nh, scale=scale,
        mask_per_group=mask_per_group, fuse_ln=fuse_ln,
        residual=fuse_ln if residual is None else residual, eps=eps)
    if mask_per_group:
        gmask_spec = pl.BlockSpec((BG, GL, GL), lambda i, j: (j, 0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        gmask_spec = pl.BlockSpec((1, GL, GL), lambda i, j: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, C), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((C, C), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    io_spec = pl.BlockSpec((1, BG, GL, C), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_in = bias_big
    bias_spec = pl.BlockSpec((nh, GL, GL), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            io_spec, vec_spec, vec_spec,
            mat_spec, vec_spec,           # wq, bq
            mat_spec, vec_spec,           # wk, bk
            mat_spec, vec_spec,           # wv, bv
            mat_spec, vec_spec,           # wproj, bproj
            bias_spec,
            gmask_spec,
        ],
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct(xg.shape, xg.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(xg, lnw, lnb, wq, bq, wk, bk, wv, bv, wproj, bproj, bias_in, gmask)


@functools.partial(jax.jit, static_argnames=("nh", "scale_inv_sqrt_hd",
                                             "interpret", "eps", "residual"))
def fused_window_msa(xg, lnw, lnb, wqkv, bqkv, wproj, bproj, bias_big,
                     gmask, *, nh: int, scale_inv_sqrt_hd: float,
                     interpret: bool = False, eps: float = 0.0,
                     residual: bool = None):
    """xg: (B, nG, GL, C) grouped-window tokens (bf16 or fp32).
    bias_big: (nh, GL, GL) fp32 relative-position bias (block-diag expanded).
    gmask: (nG, GL, GL) or (1, GL, GL) fp32 additive mask (cross-window -1e9
    and, for shifted blocks, the boundary shift mask).

    When ``lnw`` is not None the kernel also fuses the pre-attention
    LayerNorm and (by default) the residual add (out = x + proj(attn(LN(x))))
    — the whole first half of a Swin block in one VMEM-resident pass.
    ``residual`` overrides the in-kernel residual add independently of the
    LN fusion: the training path (swin.py:window_attention_fused_train)
    fuses the LN but keeps the residual outside so stochastic depth
    composes."""
    B, nG, GL, C = xg.shape
    mask_per_group = gmask.shape[0] != 1
    interpret = interpret or jax.default_backend() == "cpu"

    if _use_masked(nh):
        return _masked_call(xg, lnw, lnb, wqkv, bqkv, wproj, bproj, bias_big,
                            gmask, nh=nh, scale=scale_inv_sqrt_hd, eps=eps,
                            residual=residual, interpret=interpret)

    # groups per grid step: big enough that grid-step overhead amortizes,
    # bounded by an explicit per-step VMEM estimate (fp32 qkv intermediate,
    # fp32 logits + exp + bf16 probs, stacked per-head q/k/v, io tiles)
    nh_ = nh
    hd_ = C // nh_
    sm_bytes = 4 if xg.dtype == jnp.float32 else 2
    per_group = (GL * 3 * C * 4                 # qkv fp32 accumulate
                 + nh_ * GL * GL * (4 + sm_bytes + 2)  # logits, exp, probs
                 + 3 * nh_ * GL * hd_ * 4       # stacked q/k/v (+copies)
                 + GL * C * 8)                  # x/out tiles + slack
    budget = _vmem_budget()
    BG = max(1, min(nG, budget // per_group, 32))
    while nG % BG:
        BG -= 1

    grid = (B, nG // BG)
    fuse_ln = lnw is not None
    if not fuse_ln:
        lnw = jnp.zeros((1, C), xg.dtype)
        lnb = jnp.zeros((1, C), xg.dtype)
    kernel = functools.partial(
        _kernel, nh=nh, scale=scale_inv_sqrt_hd,
        mask_per_group=mask_per_group, fuse_ln=fuse_ln,
        residual=fuse_ln if residual is None else residual, eps=eps)
    if mask_per_group:
        gmask_spec = pl.BlockSpec((BG, GL, GL), lambda i, j: (j, 0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        gmask_spec = pl.BlockSpec((1, GL, GL), lambda i, j: (0, 0, 0),
                                  memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BG, GL, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, GL, GL), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            gmask_spec,
        ],
        out_specs=pl.BlockSpec((1, BG, GL, C), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xg.shape, xg.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(xg, lnw, lnb, wqkv, bqkv, wproj, bproj, bias_big, gmask)
