"""Sequence parallelism: W-axis sharding of the token grid via shard_map.

The reference has no model parallelism at all (SURVEY.md section 2.3); this
is the TPU-native scale-out axis anticipated in SURVEY.md section 5.7: the
cylindrical range image is sharded along W over a ``seq`` mesh axis, every
shard runs the identical Swin U-Net program on its width slice, and the only
cross-shard communication is a ppermute halo exchange of a few boundary
columns (parallel/halo.py) — for the circular patch-embed padding and the
shifted-window rolls.  Combined with the ``data`` axis this gives a dp x sp
mesh whose collectives all ride ICI ring neighbors.

Static masks under SPMD: shard_map traces ONE program for all shards, but
the reference's shifted-window boundary mask (tulip/model/tulip.py:254-280)
masks only the *globally last* window column along W.  Each shifted block
therefore carries two precomputed mask variants — "body" (H-boundary terms
only) and "last" (H + W boundary) — and the traced program selects by
``lax.axis_index`` at runtime.  All other statics (window geometry, groups,
relative-position indices) are identical across shards.

Numerics match the unsharded model exactly (same ops, same order) — pinned
by tests/test_sp.py on an 8-virtual-device CPU mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:                                    # jax >= 0.8: check_rep -> check_vma
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:                     # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..models.swin import BlockStatic, _grouped_statics, make_block_static
from ..models.tulip import TulipModel, forward_features, forward_loss
from . import halo


class SpBlock(NamedTuple):
    st: BlockStatic                      # local-grid statics, "last" masks
    mask_body: Optional[np.ndarray]      # per-window body mask or None
    gmask_body: Optional[np.ndarray]     # grouped body mask or None


class SpStatics(NamedTuple):
    enc: Tuple[Tuple[SpBlock, ...], ...]
    dec: Tuple[Tuple[SpBlock, ...], ...]
    n_seq: int


def _sp_block(stage_local, j, config_window) -> SpBlock:
    st = make_block_static(stage_local, j, config_window)
    if st.mask is None:
        return SpBlock(st, None, None)
    # Body variant: every window column looks W-interior.  Window columns
    # 0..nW-2 of the local mask are identical (only the last ww columns get
    # W-boundary region ids), so column 0 replicated over W is the body mask.
    wh, ww = stage_local.window
    nH = stage_local.grid[0] // wh
    nW = stage_local.grid[1] // ww
    assert nW >= 2, (
        f"sequence-parallel shard too narrow: {stage_local.grid} with window "
        f"{stage_local.window} leaves {nW} window column(s); need >= 2")
    Lw = st.mask.shape[-1]
    m = st.mask.reshape(nH, nW, Lw, Lw)
    mask_body = np.ascontiguousarray(
        np.broadcast_to(m[:, :1], m.shape)).reshape(nH * nW, Lw, Lw)
    _, _, gmask_body = _grouped_statics(
        stage_local.grid, stage_local.window, st.shift, mask_body)
    return SpBlock(st, mask_body, gmask_body)


def build_sp_statics(model: TulipModel, n_seq: int) -> SpStatics:
    """Precompute local-grid block statics for an ``n_seq``-way W sharding."""
    cfg = model.cfg

    def shard_stage(stage):
        H, W = stage.grid
        assert W % n_seq == 0, f"token grid W={W} not divisible by sp={n_seq}"
        local = dataclasses.replace(stage, grid=(H, W // n_seq))
        cw = local.window if cfg.swin_v2 else cfg.window_size
        return tuple(_sp_block(local, j, cw) for j in range(local.depth))

    return SpStatics(
        enc=tuple(shard_stage(s) for s in cfg.encoder_stages),
        dec=tuple(shard_stage(s) for s in cfg.decoder_stages),
        n_seq=n_seq)


def _select_model(model: TulipModel, sp: SpStatics, seq_axis: str) -> TulipModel:
    """Inside the shard_map trace: pick body/last masks by shard position."""
    is_last = jax.lax.axis_index(seq_axis) == sp.n_seq - 1

    def sel(blk: SpBlock) -> BlockStatic:
        if blk.mask_body is None:
            return blk.st
        mask = jnp.where(is_last, jnp.asarray(blk.st.mask),
                         jnp.asarray(blk.mask_body))
        gmask = jnp.where(is_last, jnp.asarray(blk.st.group_mask),
                          jnp.asarray(blk.gmask_body))
        return blk.st._replace(mask=mask, group_mask=gmask)

    enc = tuple(tuple(sel(b) for b in stage) for stage in sp.enc)
    dec = tuple(tuple(sel(b) for b in stage) for stage in sp.dec)
    return TulipModel(cfg=model.cfg, enc_blocks=enc, dec_blocks=dec)


def max_sp_degree(model: TulipModel) -> int:
    """Largest supported --sp_degree for this model geometry: every stage's
    local W shard must keep >= 2 window columns (the body/last mask scheme
    and the single-ring halo exchange assume a W-interior region per shard),
    and the token-grid W must divide evenly."""
    best = 1
    cfg = model.cfg
    for stage in tuple(cfg.encoder_stages) + tuple(cfg.decoder_stages):
        H, W = stage.grid
        ww = stage.window[1]
        cap = max(1, W // (2 * ww))
        while cap > 1 and W % cap:
            cap -= 1
        best = cap if best == 1 else min(best, cap)
    return best


def make_sp_forward(model: TulipModel, mesh: Mesh, *, data_axis: str = "data",
                    seq_axis: str = "seq", compute_dtype=jnp.bfloat16,
                    mode: str = "train"):
    """Build the W-sharded forward:  (params, x_nchw) -> pred_nchw.

    params replicated; x/pred sharded P(data, None, None, seq) in NCHW.
    Call inside jit (composes with autodiff: ppermute transposes to ppermute,
    replicated-param cotangents are psummed by shard_map's transpose).

    ``mode`` matches models.tulip.apply_model: 'train' (dropout + drop-path),
    'mc' (dropout only — MC-dropout eval), 'eval' (deterministic).
    """
    sp = build_sp_statics(model, mesh.shape[seq_axis])
    dropout_active = mode in ("train", "mc")
    droppath_active = mode == "train"

    def fwd_local(params, x, rng, *, use_rng: bool):
        with halo.sequence_axis(seq_axis):
            model_l = _select_model(model, sp, seq_axis)
            if use_rng:
                # independent draws across data shards, consistent across seq
                # (drop-path must drop the same samples in every W shard)
                rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
                if not droppath_active:
                    # MC mode has no drop-path, so dropout draws can (and
                    # should) be independent across W shards too
                    rng = jax.random.fold_in(
                        rng, jax.lax.axis_index(seq_axis))
            else:
                rng = None
            return forward_features(params, model_l, x, rng=rng,
                                    dropout_active=use_rng and dropout_active,
                                    droppath_active=use_rng and droppath_active)

    def run(params, x_nchw, rng=None):
        use_rng = rng is not None
        if not use_rng:
            rng = jax.random.PRNGKey(0)   # dummy; unused in the trace
        x = jnp.transpose(x_nchw, (0, 2, 3, 1)).astype(compute_dtype)
        precision = "highest" if compute_dtype == jnp.float32 else "default"
        sharded = shard_map(
            partial(fwd_local, use_rng=use_rng),
            mesh=mesh,
            in_specs=(P(), P(data_axis, None, seq_axis, None), P()),
            out_specs=P(data_axis, None, seq_axis, None),
            check_rep=False)
        with jax.default_matmul_precision(precision):
            pred = sharded(params, x, rng)
        return jnp.transpose(pred, (0, 3, 1, 2))

    return run


def make_sp_train_step(model: TulipModel, tx, mesh: Mesh, *,
                       accum_iter: int = 1, data_axis: str = "data",
                       seq_axis: str = "seq", compute_dtype=jnp.bfloat16,
                       donate: bool = True):
    """dp x sp train step: step(state, low, high, lr, rng) ->
    (state, (total_loss, pixel_loss)).  Same contract as
    train/step.make_train_step; low/high arrive NCHW sharded
    P(data, None, None, seq)."""
    import optax
    from ..train.step import TrainState, _set_lr

    fwd = make_sp_forward(model, mesh, data_axis=data_axis,
                          seq_axis=seq_axis, compute_dtype=compute_dtype)

    def loss_fn(params, low, high, rng):
        pred = fwd(params, low, rng)
        total, pixel = forward_loss(pred, high.astype(compute_dtype),
                                    model.cfg.log_transform)
        return total, pixel

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state, low, high, lr, rng):
        (total, pixel), grads = grad_fn(state.params, low, high, rng)
        opt_state = _set_lr(state.opt_state, lr, accum_iter)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), (total, pixel)

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)
