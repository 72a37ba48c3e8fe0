"""Training loop: per-iteration LR, jitted bf16 step, metric logging.

Parity target: train_one_epoch (tulip/engine_upsampling.py:46-124) — same
loop structure (per-iteration cosine LR, NaN abort, MetricLogger cadence,
TensorBoard scalars on the epoch_1000x axis) with the device work folded into
one jitted step.  Host<->device traffic per iteration: one async batch
transfer in, two scalars out.
"""

from __future__ import annotations

import math
import sys

import jax
import numpy as np

from ..parallel import dist
from ..utils import MetricLogger, SmoothedValue
from ..utils.lr_sched import lr_at_epoch


def train_one_epoch(train_step, state, data_loader, epoch: int, *,
                    mesh=None, log_writer=None, args=None, base_rng=None):
    """Run one epoch.  Returns (state, stats_dict).

    train_step: jitted fn from make_train_step.
    state: TrainState.
    data_loader: yields (low_dict, high_dict) numpy batches.
    """
    metric_logger = MetricLogger(delimiter="  ")
    metric_logger.add_meter('lr', SmoothedValue(window_size=1, fmt='{value:.6f}'))
    header = 'Epoch: [{}]'.format(epoch)
    print_freq = 20
    accum_iter = args.accum_iter

    if log_writer is not None:
        print('log_dir: {}'.format(log_writer.logdir))

    if base_rng is None:
        base_rng = jax.random.PRNGKey(args.seed)
    epoch_rng = jax.random.fold_in(base_rng, epoch)

    num_steps = len(data_loader)
    lr = 0.0
    from ..parallel.mesh import shard_batch

    # Per-step PRNG keys, one device round-trip per EPOCH: fold_in per
    # iteration would cost a separate dispatch each step (~5 ms through the
    # axon tunnel); precompute the whole epoch's keys in one vmapped call
    # and hand the step numpy keys (8-byte host arrays).
    step_keys = np.asarray(jax.vmap(
        lambda i: jax.random.fold_in(epoch_rng, i))(np.arange(num_steps)))

    # Losses are read back one step late: jax dispatch is async, so reading
    # the PREVIOUS step's scalars overlaps host work with device compute
    # instead of stalling the pipeline every iteration (the reference
    # synchronizes every step, engine:100; we keep its observable logging
    # behaviour with one step of latency).
    pending = None  # (iter_step, lr, total_loss_dev, pixel_loss_dev)

    def drain(p):
        it, it_lr, tl, pl = p
        total_loss_value = float(tl)
        pixel_loss_value = float(pl)
        if not math.isfinite(total_loss_value):
            print("Total Loss is {}, stopping training".format(total_loss_value))
            print("Pixel Loss is {}, stopping training".format(pixel_loss_value))
            sys.exit(1)
        metric_logger.update(loss=total_loss_value)
        metric_logger.update(lr=it_lr)
        total_loss_value_reduce = dist.all_reduce_mean(total_loss_value)
        pixel_loss_value_reduce = dist.all_reduce_mean(pixel_loss_value)
        if log_writer is not None and (it + 1) % accum_iter == 0:
            # epoch_1000x x-axis calibrates curves across batch sizes
            # (reference: engine:110-118)
            epoch_1000x = int((it / num_steps + epoch) * 1000)
            if args.log_transform or getattr(args, "depth_scale_loss", False):
                log_writer.add_scalar('train_loss_total',
                                      total_loss_value_reduce, epoch_1000x)
            log_writer.add_scalar('train_loss_pixel',
                                  pixel_loss_value_reduce, epoch_1000x)
            log_writer.add_scalar('lr', lr, epoch_1000x)

    for data_iter_step, (low, high) in enumerate(
            metric_logger.log_every(data_loader, print_freq, header)):
        # per-iteration LR (reference: engine:69-70, lr_sched.py:9-21)
        if data_iter_step % accum_iter == 0:
            lr = lr_at_epoch(data_iter_step / num_steps + epoch,
                             args.lr, args.min_lr, args.warmup_epochs,
                             args.epochs)

        batch = {"low": np.ascontiguousarray(low["sample"], np.float32),
                 "high": np.ascontiguousarray(high["sample"], np.float32)}
        if mesh is not None:
            batch = shard_batch(mesh, batch)

        step_rng = step_keys[data_iter_step]
        state, (total_loss, pixel_loss) = train_step(
            state, batch["low"], batch["high"],
            np.float32(lr), step_rng)

        if pending is not None:
            drain(pending)
        pending = (data_iter_step, lr, total_loss, pixel_loss)

    if pending is not None:
        drain(pending)

    metric_logger.synchronize_between_processes()
    print("Averaged stats:", metric_logger)
    return state, {k: meter.global_avg for k, meter in metric_logger.meters.items()}
