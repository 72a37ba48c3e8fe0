"""Evaluation engines: plain eval and Monte-Carlo-dropout eval.

Parity targets: evaluate (tulip/engine_upsampling.py:126-356) and MCdrop
(engine:361-608).  The device work — forward, de-log, range gating, loss
map, and the chamfer sweep — is jitted; the dynamic-extent voxel metrics and
the sensor-model reprojection run vectorized on host (cheap next to the
forward).  Metric-order parity quirks preserved:

- MAE is computed on the gated/de-logged prediction BEFORE low-res row
  re-injection (engine:192-193 vs :215).
- range gates: carla/kitti 2/80..1, durlar 0.3/120..1 in evaluate
  (engine:183-188); MCdrop's kitti gate is 0..1 (engine:442).
- MCdrop std uses Bessel's correction (torch.std default, engine:423) and
  zeroes pixels where std > threshold * mean (engine:424-426).
- metrics only accumulate when a log_writer is present (engine:174, 428).
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import tqdm

from ..models.tulip import TulipModel, apply_model
from ..utils.writer import colorize_range_image, write_ply
from .geometry import img_to_pcd_carla, img_to_pcd_durlar, img_to_pcd_kitti
from .metrics import (calculate_metrics, chamfer_distance,
                      chamfer_distance_async, device_voxel_counts,
                      voxel_metrics_sparse, voxelize_point_cloud,
                      warm_chamfer)


def _use_device_metrics() -> bool:
    """On-device per-sample metric path (projection + chamfer + voxel
    counts in ONE jitted dispatch; host does bookkeeping only).
    TULIP_TPU_HOST_METRICS=1 reverts to the host numpy path."""
    return os.environ.get("TULIP_TPU_HOST_METRICS", "0") != "1"


def _warm_metrics(args, log_writer, metrics_fn=None):
    """Pre-compile the per-sample metric executable at the production shape
    (avoids a remote compile landing concurrently with an in-flight
    forward, the r4 device-hang trigger)."""
    if log_writer is None or jax.default_backend() == "cpu":
        return
    h, w = tuple(args.img_size_high_res)
    if metrics_fn is not None:
        hl, wl = tuple(args.img_size_low_res)
        out = metrics_fn(jnp.full((1, 1, h, w), 0.1, jnp.float32),
                         jnp.full((1, 1, h, w), 0.1, jnp.float32),
                         jnp.full((1, 1, hl, wl), 0.1, jnp.float32))
        np.asarray(out["stats"])  # block: compile + one execution, serially
        return
    warm_chamfer(h * w)

_GATES = {  # evaluate-path gates (engine:183-188)
    "carla": (2 / 80, 1.0),
    "durlar": (0.3 / 120, 1.0),
    "kitti": (2 / 80, 1.0),
}
_GATES_MC = {  # MCdrop-path gates (engine:437-442)
    "carla": (2 / 80, 1.0),
    "durlar": (0.3 / 120, 1.0),
    "kitti": (0.0, 1.0),
}


_FWD_CACHE: dict = {}  # jitted forwards keyed by (model id, flags)


def _make_eval_forward(model: TulipModel, dataset: str, log_transform: bool,
                       gates, compute_dtype, sp_forward=None):
    """Jitted: forward + de-log + gate + loss map (device side of
    engine:168-193).  Cached so repeated evaluate()/MCdrop() calls on the
    same model reuse the compiled program.  ``sp_forward`` optionally
    replaces the plain forward with a W-sharded one
    (parallel.sp.make_sp_forward, mode='eval')."""
    key = ("eval", id(model), dataset, log_transform, id(gates),
           str(compute_dtype), id(sp_forward))
    if key in _FWD_CACHE:
        return _FWD_CACHE[key]
    lo, hi = gates.get(dataset, (None, None))

    @jax.jit
    def fwd(params, low, high):
        if sp_forward is not None:
            pred = sp_forward(params, low)
        else:
            pred, _, _ = apply_model(params, model, low, high, mode="eval",
                                     compute_dtype=compute_dtype)
        pred = pred.astype(jnp.float32)
        high32 = high.astype(jnp.float32)
        low32 = low.astype(jnp.float32)
        if log_transform:
            pred = jnp.expm1(pred)
            high32 = jnp.expm1(high32)
            low32 = jnp.expm1(low32)
        if lo is not None:
            pred = jnp.where((pred >= lo) & (pred <= hi), pred, 0.0)
        loss_map = jnp.abs(pred - high32)
        return pred, high32, low32, loss_map, jnp.mean(loss_map)

    _FWD_CACHE[key] = fwd
    return fwd


def _make_mc_forward(model: TulipModel, compute_dtype, sp_forward=None):
    """Jitted MC forward: one batch of dropout-active forwards
    (engine:409-421; model called with mc_drop=True, tulip.py:733-734).
    ``sp_forward`` optionally replaces the plain forward with a W-sharded
    one (parallel.sp.make_sp_forward, mode='mc')."""
    key = ("mc", id(model), str(compute_dtype), id(sp_forward))
    if key in _FWD_CACHE:
        return _FWD_CACHE[key]

    @jax.jit
    def fwd(params, low_tiled, rng):
        if sp_forward is not None:
            return sp_forward(params, low_tiled, rng).astype(jnp.float32)
        return apply_model(params, model, low_tiled, None, mode="mc",
                           rng=rng, mc_drop=True,
                           compute_dtype=compute_dtype).astype(jnp.float32)

    _FWD_CACHE[key] = fwd
    return fwd


def _project(dataset: str, img: np.ndarray, mc: bool = False) -> np.ndarray:
    if dataset == "carla":
        return img_to_pcd_carla(img, maximum_range=80)
    if dataset == "kitti":
        return img_to_pcd_kitti(img, maximum_range=80)
    if dataset == "durlar":
        # MCdrop calls img_to_pcd_durlar without maximum_range (default 120)
        # (engine:509-510) — same value; preserved for clarity.
        return img_to_pcd_durlar(img, maximum_range=120)
    raise NotImplementedError(f"Cannot find the dataset: {dataset}")


def _sample_3d_metrics(dataset, pred_img, images_high_res, images_low_res,
                       h_high_res, downsampling_factor, args, mc: bool,
                       defer: bool = False):
    """Host-side per-sample 3D metric path (engine:205-276).  Returns
    (loss_low_res_part, chamfer, iou, precision, recall, f1, pcd_pred, pcd_gt)
    and mutates pred_img with the low-res row re-injection.

    ``defer=True``: everything host-side runs now and the device NN sweep is
    dispatched, but the blocking chamfer READ is packaged into the returned
    zero-arg closure — the eval loops call it one sample later, after the
    NEXT sample's sweep is dispatched, so the ~0.5 s device sweep fully
    overlaps the next sample's host projection/voxel work."""
    if dataset == "carla" and tuple(args.img_size_low_res)[1] != tuple(args.img_size_high_res)[1]:
        loss_low_res_part = 0.0
    else:
        low_res_index = range(0, h_high_res, downsampling_factor)
        pred_low_res_part = pred_img[low_res_index, :]
        loss_low_res_part = float(np.abs(pred_low_res_part - images_low_res).mean())
        pred_img[low_res_index, :] = images_low_res

    if dataset == "durlar" and (not mc) and args.keep_close_scan:
        pred_img[pred_img > 0.25] = 0
        images_high_res[images_high_res > 0.25] = 0
    if dataset == "kitti" and mc and args.keep_close_scan:
        pred_img[pred_img > 0.25] = 0
        images_high_res[images_high_res > 0.25] = 0

    pcd_pred = _project(dataset, pred_img, mc)
    pcd_gt = _project(dataset, images_high_res, mc)

    # dispatch the device NN sweep, voxelize on host while it runs, then
    # read.  pad_to=H*W pins the jit shape: noise filtering varies the
    # cloud sizes per sample, and without the fixed pad every sample would
    # trigger a fresh (remote) compile mid-loop — the r4 stall root cause.
    hh, ww = tuple(args.img_size_high_res)
    chamfer_handle = chamfer_distance_async(pcd_gt, pcd_pred,
                                            pad_to=hh * ww)

    pcd_all = np.vstack((pcd_pred, pcd_gt))
    min_coord = np.min(pcd_all, axis=0)
    max_coord = np.max(pcd_all, axis=0)
    # sparse-key voxel metrics: bit-identical to the reference's dense
    # voxelize+compare (evaluation.py:148-175) without zeroing GB-scale
    # grids per sample (tests/test_metrics.py pins sparse == dense)
    iou, precision, recall = voxel_metrics_sparse(
        pcd_pred, pcd_gt, args.grid_size, min_coord, max_coord)
    f1 = 2 * (precision * recall) / (precision + recall)

    def finish():
        chamfer_dist = chamfer_handle()
        return (loss_low_res_part, chamfer_dist, iou, precision, recall, f1,
                pcd_pred, pcd_gt)

    return finish if defer else finish()


def _make_device_metrics(dataset: str, args, mc: bool):
    """One jitted per-sample metric executable (device side of
    engine:205-276): low-res row re-injection + low-res-part MAE +
    keep_close gating + sensor-model projection (geometry.*_jnp) + both
    chamfer NN sweeps + unique-voxel occupancy counts
    (metrics.device_voxel_counts).  The eval loops read back five scalars
    per sample; images/clouds are fetched only on TB-logging steps.

    Replaces the host path that dominated the r4 eval loop (~600 ms/sample
    of numpy projection + np.unique voxel keys on a 1-core host).  Index
    math runs fp32 on device (vs host float64): metric deltas are ~1e-6
    rel (chamfer) and ~1e-5 rel (voxel boundary flips), inside the 1e-2
    parity contract — scripts/parity_record.py re-validates engine-vs-torch
    with this path on."""
    from ..ops import get_chamfer_impl
    from .geometry import (img_to_pcd_carla_jnp, img_to_pcd_durlar_jnp,
                           img_to_pcd_kitti_jnp)
    impl = get_chamfer_impl()
    hh, ww = tuple(args.img_size_high_res)
    hl, wl = tuple(args.img_size_low_res)
    key = ("devmet", id(impl), dataset, mc, float(args.grid_size),
           bool(args.keep_close_scan), (hh, ww), (hl, wl))
    if key in _FWD_CACHE:
        return _FWD_CACHE[key]

    P = hh * ww
    pref = getattr(impl, "preferred_chunk", 4096)
    chunk = pref if P >= pref else 512
    factor = hh // hl
    grid_size = float(args.grid_size)
    keep_close = bool(args.keep_close_scan) and (
        (dataset == "durlar" and not mc) or (dataset == "kitti" and mc))
    skip_inject = dataset == "carla" and wl != ww

    def project(img):
        if dataset == "carla":
            return img_to_pcd_carla_jnp(img, maximum_range=80)
        if dataset == "kitti":
            return img_to_pcd_kitti_jnp(img, maximum_range=80)
        return img_to_pcd_durlar_jnp(img, maximum_range=120)

    @jax.jit
    def metrics_fn(pred, high32, low32):
        p = pred.reshape(hh, ww)
        h = high32.reshape(hh, ww)
        if skip_inject:
            loss_low = jnp.float32(0.0)
            p2 = p
        else:
            l = low32.reshape(hl, ww)
            loss_low = jnp.mean(jnp.abs(p[::factor, :] - l))
            p2 = p.at[::factor, :].set(l)
        h2 = h
        if keep_close:
            p2 = jnp.where(p2 > 0.25, 0.0, p2)
            h2 = jnp.where(h2 > 0.25, 0.0, h2)
        pcd_pred = project(p2)
        pcd_gt = project(h2)
        pair_impl = getattr(impl, "pair", None)
        if pair_impl is not None and P % chunk == 0:
            d1, d2 = pair_impl(pcd_gt, pcd_pred, chunk=chunk)
        else:
            d1 = impl(pcd_gt, pcd_pred, chunk=chunk)   # gt -> pred
            d2 = impl(pcd_pred, pcd_gt, chunk=chunk)   # pred -> gt
        chamfer = jnp.mean(d1) + jnp.mean(d2)
        n_pred, n_gt, tp = device_voxel_counts(pcd_pred, pcd_gt, grid_size)
        # ONE packed stats vector: every float()/int() read is its own
        # host<->device round trip (~5 ms through the axon tunnel), and the
        # loop otherwise reads six scalars per sample.  stats[5] re-derives
        # the forward's mae (same jnp.mean(|pred - high|) expression over
        # the same post-gate arrays) so no separate read is needed.
        stats = jnp.stack([loss_low, chamfer,
                           n_pred.astype(jnp.float32),
                           n_gt.astype(jnp.float32),
                           tp.astype(jnp.float32),
                           jnp.mean(jnp.abs(p - h))])
        return dict(stats=stats, pred_inj=p2, high_gated=h2)

    _FWD_CACHE[key] = metrics_fn
    return metrics_fn


def _voxel_ratios(n_pred: int, n_gt: int, tp: int):
    """IoU / precision / recall / f1 from occupancy counts, with the dense
    reference path's nan-on-empty semantics."""
    union = n_pred + n_gt - tp
    nan = float("nan")
    iou = tp / union if union else nan
    precision = tp / n_pred if n_pred else nan
    recall = tp / n_gt if n_gt else nan
    pr = precision + recall
    f1 = 2 * (precision * recall) / pr if pr else nan
    return iou, precision, recall, f1


def _log_sample(log_writer, local_step, global_step, images_high_res, pred_img,
                loss_map, mae, loss_low_res_part, chamfer_dist, iou, precision,
                recall, pcd_pred, pcd_gt, args, pcd_dirname):
    """TB image grid + scalars + optional .ply export (engine:285-329)."""
    lm = np.asarray(loss_map).squeeze()
    lm = (lm - lm.min()) / (lm.max() - lm.min() + 1e-8)
    grid = np.concatenate([
        colorize_range_image(images_high_res),
        colorize_range_image(np.asarray(pred_img)),
        colorize_range_image(lm, "jet"),
    ], axis=1)
    log_writer.add_image('gt - pred', grid, local_step)
    log_writer.add_scalar('Test/mae_all', mae, local_step)
    log_writer.add_scalar('Test/mae_low_res', loss_low_res_part, local_step)
    log_writer.add_scalar('Test/chamfer_dist', chamfer_dist, local_step)
    log_writer.add_scalar('Test/iou', iou, local_step)
    log_writer.add_scalar('Test/precision', precision, local_step)
    log_writer.add_scalar('Test/recall', recall, local_step)

    if args.save_pcd and local_step % 4 == 0:
        pcd_outputpath = os.path.join(args.output_dir, pcd_dirname)
        os.makedirs(pcd_outputpath, exist_ok=True)
        pred_color = np.zeros_like(pcd_pred)
        pred_color[:, 0] = 255
        gt_color = np.zeros_like(pcd_gt)
        gt_color[:, 2] = 255
        write_ply(os.path.join(pcd_outputpath, f"pred_{global_step}.ply"),
                  pcd_pred, pred_color)
        write_ply(os.path.join(pcd_outputpath, f"gt_{global_step}.ply"),
                  pcd_gt, gt_color)


def _finalize(evaluation_metrics, totals, global_step, log_writer, args,
              results_name):
    evaluation_file_path = os.path.join(args.output_dir, results_name)
    with open(evaluation_file_path, 'w') as f:
        json.dump(evaluation_metrics, f)
    print(f'Dictionary saved to {evaluation_file_path}')

    if log_writer is not None and global_step > 0:
        log_writer.add_scalar('Metrics/test_average_iou',
                              totals['iou'] / global_step, 0)
        log_writer.add_scalar('Metrics/test_average_cd',
                              totals['cd'] / global_step, 0)
        log_writer.add_scalar('Metrics/test_average_loss',
                              totals['loss'] / global_step, 0)
        log_writer.add_scalar('Metrics/test_average_f1',
                              totals['f1'] / global_step, 0)
        log_writer.add_scalar('Metrics/test_average_precision',
                              totals['precision'] / global_step, 0)
        log_writer.add_scalar('Metrics/test_average_recall',
                              totals['recall'] / global_step, 0)
    return evaluation_metrics


def evaluate(data_loader, params, model: TulipModel, log_writer, args=None,
             compute_dtype=jnp.float32, sp_forward=None):
    """Plain evaluation (reference: engine_upsampling.py:126-356)."""
    h_low_res = tuple(args.img_size_low_res)[0]
    h_high_res = tuple(args.img_size_high_res)[0]
    downsampling_factor = h_high_res // h_low_res
    dataset = args.dataset_select

    fwd = _make_eval_forward(model, dataset, args.log_transform, _GATES,
                             compute_dtype, sp_forward=sp_forward)
    metrics_fn = (_make_device_metrics(dataset, args, mc=False)
                  if (_use_device_metrics() and log_writer is not None)
                  else None)

    global_step = 0
    local_step = 0
    totals = dict(loss=0.0, iou=0.0, cd=0.0, f1=0.0, precision=0.0, recall=0.0)
    evaluation_metrics = {k: [] for k in
                          ('mae', 'chamfer_dist', 'iou', 'precision',
                           'recall', 'f1')}

    def accumulate(step, mae, loss_low_res_part, chamfer_dist, iou,
                   precision, recall, f1, log_arrays):
        nonlocal local_step
        evaluation_metrics['mae'].append(mae)
        evaluation_metrics['chamfer_dist'].append(float(chamfer_dist))
        evaluation_metrics['iou'].append(iou)
        evaluation_metrics['precision'].append(precision)
        evaluation_metrics['recall'].append(recall)
        evaluation_metrics['f1'].append(f1)

        if step % 100 == 0 or step == 1:
            images_high_res, pred_img, loss_map, pcd_pred, pcd_gt = \
                log_arrays()
            _log_sample(log_writer, local_step, step,
                        images_high_res, pred_img, loss_map, mae,
                        loss_low_res_part, chamfer_dist, iou, precision,
                        recall, pcd_pred, pcd_gt, args, 'pcd')
            local_step += 1

        totals['iou'] += iou
        totals['cd'] += float(chamfer_dist)
        totals['loss'] += mae
        totals['f1'] += f1
        totals['precision'] += precision
        totals['recall'] += recall

    def process_device(step, outs):
        # the forward's mae scalar is ignored: stats[5] re-derives it on
        # device so the loop reads one array, not two
        pred, high32, low32, loss_map, _mae = outs
        dm = metrics_fn(pred, high32, low32)   # async dispatch

        def complete():
            sv = np.asarray(dm['stats'])       # one device read for all 6
            loss_low, chamfer = float(sv[0]), float(sv[1])
            n_pred, n_gt, tp = int(sv[2]), int(sv[3]), int(sv[4])
            iou, precision, recall, f1 = _voxel_ratios(n_pred, n_gt, tp)

            def log_arrays():
                images_high_res = np.asarray(dm['high_gated'])
                pred_img = np.asarray(dm['pred_inj'])
                return (images_high_res, pred_img, loss_map,
                        _project(dataset, pred_img),
                        _project(dataset, images_high_res))

            accumulate(step, float(sv[5]), loss_low, chamfer, iou,
                       precision, recall, f1, log_arrays)

        return complete

    def process(step, outs):
        if metrics_fn is not None:
            return process_device(step, outs)
        pred, high32, low32, loss_map, mae = outs
        mae = float(mae)
        images_high_res = np.asarray(high32).squeeze()
        images_low_res = np.asarray(low32).squeeze()
        pred_img = np.array(pred).squeeze()

        finish3d = _sample_3d_metrics(
            dataset, pred_img, images_high_res, images_low_res,
            h_high_res, downsampling_factor, args, mc=False, defer=True)

        def complete():
            (loss_low_res_part, chamfer_dist, iou, precision, recall, f1,
             pcd_pred, pcd_gt) = finish3d()
            accumulate(step, mae, loss_low_res_part, chamfer_dist, iou,
                       precision, recall, f1,
                       lambda: (images_high_res, pred_img, loss_map,
                                pcd_pred, pcd_gt))

        return complete

    _warm_metrics(args, log_writer, metrics_fn)
    # two-deep pipeline: sample k+1's forward is dispatched before sample
    # k's host-side metrics run, and sample k's chamfer READ happens one
    # iteration later still (after k+1's sweep is dispatched) — so both the
    # forward and the NN sweep overlap the next sample's host work (jax
    # dispatch is async; only np.asarray/float reads block)
    pending = None
    pending_fin = None
    for batch in tqdm.tqdm(data_loader):
        low = jnp.asarray(batch[0]['sample'])
        high = jnp.asarray(batch[1]['sample'])
        global_step += 1

        outs = fwd(params, low, high)

        if log_writer is None:
            continue  # parity: metrics only on the logging rank (engine:174)
        if pending is not None:
            fin = process(*pending)
            if pending_fin is not None:
                pending_fin()
            pending_fin = fin
        pending = (global_step, outs)
    if pending is not None:
        fin = process(*pending)
        if pending_fin is not None:
            pending_fin()
        fin()

    return _finalize(evaluation_metrics, totals, global_step, log_writer,
                     args, 'results.txt')


def MCdrop(data_loader, params, model: TulipModel, log_writer, args=None,
           compute_dtype=jnp.float32, sp_forward=None):
    """Monte-Carlo-dropout evaluation (reference: engine:361-608).

    Runs num_mcdropout_iterations dropout-active forwards in tiles of 8,
    averages, and zeroes pixels whose std exceeds threshold * mean.  NOTE
    (parity): shipped configs have all dropout rates 0, so the 50 passes are
    identical, std == 0, and no pixel is removed — reproduced exactly
    (SURVEY.md 7.3.8); we do not 'fix' this.
    """
    iteration = args.num_mcdropout_iterations
    iteration_batch = 8
    noise_threshold = args.noise_threshold
    assert iteration > iteration_batch

    # All shipped configs have dropout rates 0, so the `iteration` MC passes
    # are bit-identical (drop-path is inactive in 'mc' mode — the only
    # stochastic sources are drop_rate/attn_drop_rate).  In that case ONE
    # forward broadcast to `iteration` rows feeds the same mean/std/removal
    # computation the full loop would see — identical metrics, ~iteration x
    # less device work.  TULIP_TPU_MC_FULL=1 forces the full loop (parity
    # testing).  Reference degeneracy notes: SURVEY.md 7.3.8,
    # engine_upsampling.py:409-426.
    deterministic_mc = (model.cfg.drop_rate == 0.0
                        and model.cfg.attn_drop_rate == 0.0
                        and os.environ.get("TULIP_TPU_MC_FULL") != "1")

    h_low_res = tuple(args.img_size_low_res)[0]
    h_high_res = tuple(args.img_size_high_res)[0]
    downsampling_factor = h_high_res // h_low_res
    dataset = args.dataset_select

    mc_fwd = _make_mc_forward(model, compute_dtype, sp_forward=sp_forward)

    lo, hi = _GATES_MC.get(dataset, (None, None))

    post_key = ("post", dataset, args.log_transform, noise_threshold)
    if post_key in _FWD_CACHE:
        postprocess = _FWD_CACHE[post_key]
    else:
        @jax.jit
        def postprocess(preds, low, high):
            # preds: (iteration, C, H, W) stacked MC samples
            pred_mean = jnp.mean(preds, axis=0, keepdims=True)
            # torch.std default: Bessel-corrected (engine:423)
            pred_std = jnp.std(preds, axis=0, keepdims=True, ddof=1)
            noise_removal = pred_std > noise_threshold * pred_mean
            pred = jnp.where(noise_removal, 0.0, pred_mean)
            high32 = high.astype(jnp.float32)
            low32 = low.astype(jnp.float32)
            if args.log_transform:
                pred = jnp.expm1(pred)
                high32 = jnp.expm1(high32)
                low32 = jnp.expm1(low32)
            if lo is not None:
                pred = jnp.where((pred >= lo) & (pred <= hi), pred, 0.0)
            loss_map = jnp.abs(pred - high32)
            return pred, high32, low32, loss_map, jnp.mean(loss_map)
        _FWD_CACHE[post_key] = postprocess

    metrics_fn = (_make_device_metrics(dataset, args, mc=True)
                  if (_use_device_metrics() and log_writer is not None)
                  else None)

    global_step = 0
    local_step = 0
    totals = dict(loss=0.0, iou=0.0, cd=0.0, f1=0.0, precision=0.0, recall=0.0)
    evaluation_metrics = {k: [] for k in
                          ('mae', 'chamfer_dist', 'iou', 'precision',
                           'recall', 'f1')}
    base_rng = jax.random.PRNGKey(args.seed)

    def accumulate(step, mae, loss_low_res_part, chamfer_dist, iou,
                   precision, recall, f1, log_arrays):
        nonlocal local_step
        evaluation_metrics['mae'].append(mae)
        evaluation_metrics['chamfer_dist'].append(float(chamfer_dist))
        evaluation_metrics['iou'].append(iou)
        evaluation_metrics['precision'].append(precision)
        evaluation_metrics['recall'].append(recall)
        evaluation_metrics['f1'].append(f1)

        if step % 100 == 0 or step == 1:
            images_high_res, pred_img, loss_map, pcd_pred, pcd_gt = \
                log_arrays()
            _log_sample(log_writer, local_step, step, images_high_res,
                        pred_img, loss_map, mae, loss_low_res_part,
                        chamfer_dist, iou, precision, recall, pcd_pred,
                        pcd_gt, args, 'pcd_mc_drop')
            local_step += 1

        totals['iou'] += iou
        totals['cd'] += float(chamfer_dist)
        totals['loss'] += mae
        totals['f1'] += f1
        totals['precision'] += precision
        totals['recall'] += recall

    def process(step, outs):
        pred, high32, low32, loss_map, mae = outs
        if metrics_fn is not None:
            dm = metrics_fn(pred, high32, low32)   # async dispatch

            def complete():
                sv = np.asarray(dm['stats'])   # one device read for all 6
                loss_low, chamfer = float(sv[0]), float(sv[1])
                n_pred, n_gt, tp = int(sv[2]), int(sv[3]), int(sv[4])
                iou, precision, recall, f1 = _voxel_ratios(n_pred, n_gt, tp)

                def log_arrays():
                    images_high_res = np.asarray(dm['high_gated'])
                    pred_img = np.asarray(dm['pred_inj'])
                    return (images_high_res, pred_img, loss_map,
                            _project(dataset, pred_img, mc=True),
                            _project(dataset, images_high_res, mc=True))

                accumulate(step, float(sv[5]), loss_low, chamfer, iou,
                           precision, recall, f1, log_arrays)

            return complete

        mae = float(mae)
        images_high_res = np.asarray(high32).squeeze()
        images_low_res = np.asarray(low32).squeeze()
        pred_img = np.array(pred).squeeze()

        finish3d = _sample_3d_metrics(
            dataset, pred_img, images_high_res, images_low_res,
            h_high_res, downsampling_factor, args, mc=True, defer=True)

        def complete():
            (loss_low_res_part, chamfer_dist, iou, precision, recall, f1,
             pcd_pred, pcd_gt) = finish3d()
            accumulate(step, mae, loss_low_res_part, chamfer_dist, iou,
                       precision, recall, f1,
                       lambda: (images_high_res, pred_img, loss_map,
                                pcd_pred, pcd_gt))

        return complete

    _warm_metrics(args, log_writer, metrics_fn)
    # two-deep pipeline (same rationale as evaluate())
    pending = None
    pending_fin = None
    for batch in tqdm.tqdm(data_loader):
        low = jnp.asarray(batch[0]['sample'])    # (1, C, H, W)
        high = jnp.asarray(batch[1]['sample'])
        global_step += 1

        if deterministic_mc:
            # one pass, broadcast to the full iteration count (exact: all
            # passes are identical at dropout rate 0)
            rng = jax.random.fold_in(jax.random.fold_in(base_rng, global_step), 0)
            single = mc_fwd(params, low, rng)
            preds = jnp.broadcast_to(single[0], (iteration, *single.shape[1:]))
        else:
            # fixed-size chunks (one compiled shape); surplus MC draws in the
            # last chunk are sliced off, preserving the reference's exact
            # iteration count (engine:411-421)
            chunks = []
            n_chunks = int(np.ceil(iteration / iteration_batch))
            tiled = jnp.tile(low, (iteration_batch, 1, 1, 1))
            for i in range(n_chunks):
                rng = jax.random.fold_in(jax.random.fold_in(base_rng, global_step), i)
                chunks.append(mc_fwd(params, tiled, rng))
            preds = jnp.concatenate(chunks, axis=0)[:iteration]

        outs = postprocess(preds, low, high)

        if log_writer is None:
            continue
        if pending is not None:
            fin = process(*pending)
            if pending_fin is not None:
                pending_fin()
            pending_fin = fin
        pending = (global_step, outs)
    if pending is not None:
        fin = process(*pending)
        if pending_fin is not None:
            pending_fin()
        fin()

    return _finalize(evaluation_metrics, totals, global_step, log_writer,
                     args, 'results_mcdrop.txt')
