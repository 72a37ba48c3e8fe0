"""Public CLI entry point — flag- and workflow-compatible with the reference
(tulip/main_lidar_upsampling.py:34-329) so the shipped bash_scripts run
unchanged (torchrun-launched included), but executing on the TPU-native
tulip_tpu stack: single-controller JAX, device-mesh data parallelism, bf16
jitted train step, on-device eval metrics.
"""

import datetime
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp

    from tulip_tpu.config import model_config_from_args
    from tulip_tpu.data import generate_dataset
    from tulip_tpu.data.pipeline import DataLoader, ShardedSampler
    from tulip_tpu.eval.engine import MCdrop, evaluate
    from tulip_tpu.models.tulip import build_model, init_params
    from tulip_tpu.parallel import dist, make_mesh
    from tulip_tpu.parallel.mesh import init_distributed_mode
    from tulip_tpu.train.engine import train_one_epoch
    from tulip_tpu.train.step import (init_train_state, make_optimizer,
                                      make_train_step, TrainState)
    from tulip_tpu.utils import checkpoint as ckpt_util
    from tulip_tpu.utils.writer import TBWriter, finish_wandb, init_wandb

    init_distributed_mode(args)

    from tulip_tpu.ops import set_default_chamfer_impl
    set_default_chamfer_impl(args.chamfer_impl)

    print('job dir: {}'.format(os.path.dirname(os.path.realpath(__file__))))
    print("{}".format(args).replace(', ', ',\n'))

    # reproducibility (reference: main:154-157); JAX PRNG is explicit, numpy
    # drives the host-side data pipeline
    seed = args.seed + dist.get_rank()
    np.random.seed(seed)

    dataset_train = generate_dataset(is_train=True, args=args)
    dataset_val = generate_dataset(is_train=False, args=args)
    print(f"There are totally {len(dataset_train)} training data "
          f"and {len(dataset_val)} validation data")

    n_devices = jax.device_count()
    launcher_world = getattr(args, 'launcher_world_size', 1)
    # Effective batch parity: torchrun scripts mean batch_size per worker x
    # nproc (reference: main:265).  Single-controller JAX feeds the global
    # batch; shard it over however many chips exist.  Under multi-host
    # (TULIP_TPU_MULTIHOST=1) device_count() is already the global chip
    # count and the launcher world counts hosts, not chips.
    n_proc = jax.process_count()
    proc_rank = jax.process_index()
    if getattr(args, 'distributed', False):
        dp_factor = n_devices
    else:
        dp_factor = launcher_world if launcher_world > 1 else n_devices
    global_batch = args.batch_size * dp_factor
    assert global_batch % n_proc == 0, (global_batch, n_proc)
    local_batch = global_batch // n_proc  # this host's share per step

    global_rank = dist.get_rank()
    wandb_mod = init_wandb(args) if global_rank == 0 else None
    if global_rank == 0 and args.log_dir is not None:
        os.makedirs(args.log_dir, exist_ok=True)
        log_writer = TBWriter(log_dir=args.log_dir)
    else:
        log_writer = None

    # Per-host input sharding (reference: DistributedSampler for train AND
    # val, main:172-178): each process loads only its 1/n_proc stride of
    # the epoch permutation; shard_batch assembles the global array.  With
    # n_proc == 1 this degenerates to a plain shuffler over the full set.
    sampler_train = ShardedSampler(len(dataset_train), num_replicas=n_proc,
                                   rank=proc_rank, shuffle=True,
                                   seed=args.seed, drop_last=True)
    data_loader_train = DataLoader(
        dataset_train, batch_size=local_batch, sampler=sampler_train,
        drop_last=True, num_workers=args.num_workers)
    data_loader_val = DataLoader(
        dataset_val, batch_size=1,
        sampler=ShardedSampler(len(dataset_val), num_replicas=n_proc,
                               rank=proc_rank, shuffle=False),
        drop_last=False, num_workers=args.num_workers)

    cfg = model_config_from_args(args)
    model = build_model(cfg)
    params = init_params(jax.random.PRNGKey(args.seed), cfg)
    n_params = sum(int(np.prod(v.shape)) for v in params.values())
    print(f"Model = {args.model_select} ({n_params / 1e6:.1f}M params)")

    eval_dtype = jnp.float32 if args.eval_precision == 'fp32' else jnp.bfloat16

    # --sp_degree: W-axis sequence parallelism.  Clamp to the model
    # geometry's ceiling (every stage needs >= 2 window columns per shard)
    # instead of failing deep inside shard_map tracing.
    sp = getattr(args, 'sp_degree', 1) or 1
    if sp > 1:
        from tulip_tpu.parallel.sp import max_sp_degree
        cap = max_sp_degree(model)
        if sp > cap:
            print(f"[tulip_tpu] --sp_degree {sp} exceeds this model "
                  f"geometry's ceiling (every stage needs >= 2 window "
                  f"columns per W shard); clamping to {cap}")
            sp = cap

    if args.eval and os.path.exists(args.output_dir):
        print("Loading Checkpoint and directly start the evaluation")
        if args.output_dir.endswith("pth"):
            args.resume = args.output_dir
            args.output_dir = os.path.dirname(args.output_dir)
        else:
            ckpt_util.get_latest_checkpoint(args)
        params, _, _ = ckpt_util.load_model(args, params, None)

        print("Start Evaluation")
        sp_fwd_eval = sp_fwd_mc = None
        if sp > 1:
            # eval is batch-1: the whole mesh goes to the seq axis
            from tulip_tpu.parallel.sp import make_sp_forward
            assert n_devices % sp == 0, (
                f"--sp_degree {sp} does not divide {n_devices} devices")
            mesh = make_mesh((1, sp), axis_names=("data", "seq"))
            if args.mc_drop:
                sp_fwd_mc = make_sp_forward(model, mesh, mode="mc",
                                            compute_dtype=eval_dtype)
            else:
                sp_fwd_eval = make_sp_forward(model, mesh, mode="eval",
                                              compute_dtype=eval_dtype)
        if args.mc_drop:
            print("Evaluation with Monte Carlo Dropout")
            MCdrop(data_loader_val, params, model, log_writer, args=args,
                   compute_dtype=eval_dtype, sp_forward=sp_fwd_mc)
        else:
            evaluate(data_loader_val, params, model, log_writer, args=args,
                     compute_dtype=eval_dtype, sp_forward=sp_fwd_eval)
        print("Evaluation finished")
        sys.exit(0)
    else:
        print("Start Training")

    eff_batch_size = global_batch * args.accum_iter
    if args.lr is None:  # only base_lr specified (reference: main:267-268)
        args.lr = args.blr * eff_batch_size / 256
    print("base lr: %.2e" % (args.lr * 256 / eff_batch_size))
    print("actual lr: %.2e" % args.lr)
    print("accumulate grad iterations: %d" % args.accum_iter)
    print("effective batch size: %d" % eff_batch_size)

    tx = make_optimizer(args.weight_decay, args.accum_iter)
    state = init_train_state(params, tx)
    compute_dtype = jnp.bfloat16 if args.precision == 'bf16' else jnp.float32
    if sp > 1:
        # dp x sp mesh: batch over 'data', range-image W over 'seq' with
        # ppermute halo exchange (tulip_tpu/parallel/sp.py)
        from tulip_tpu.parallel.sp import make_sp_train_step
        assert n_devices % sp == 0, (
            f"--sp_degree {sp} does not divide {n_devices} devices")
        mesh = make_mesh((n_devices // sp, sp), axis_names=("data", "seq"))
        train_step = make_sp_train_step(model, tx, mesh,
                                        accum_iter=args.accum_iter,
                                        compute_dtype=compute_dtype)
    else:
        mesh = make_mesh(args.mesh_shape)
        train_step = make_train_step(model, tx, accum_iter=args.accum_iter,
                                     compute_dtype=compute_dtype)

    params2, opt2, start_epoch = ckpt_util.load_model(args, state.params,
                                                      state.opt_state)
    state = TrainState(params=params2, opt_state=opt2, step=state.step)
    args.start_epoch = start_epoch

    print(f"Start training for {args.epochs} epochs")
    start_time = time.time()
    base_rng = jax.random.PRNGKey(args.seed)

    # Preemption handling (new vs reference, SURVEY.md 5.3): on SIGTERM —
    # the TPU-VM preemption signal — finish the current epoch, checkpoint,
    # and exit cleanly so --resume / get_latest_checkpoint restarts it.
    import signal
    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        print(f"[tulip_tpu] received signal {signum}; will checkpoint and "
              "exit at the end of this epoch")
        preempted["flag"] = True

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # not the main thread

    for epoch in range(args.start_epoch, args.epochs):
        sampler_train.set_epoch(epoch)
        state, train_stats = train_one_epoch(
            train_step, state, data_loader_train, epoch, mesh=mesh,
            log_writer=log_writer, args=args, base_rng=base_rng)
        if args.output_dir and (epoch % args.save_frequency == 0
                                or epoch + 1 == args.epochs):
            if dist.is_main_process():
                ckpt_util.save_model(args, epoch, state.params, state.opt_state)

        log_stats = {**{f'train_{k}': v for k, v in train_stats.items()},
                     'epoch': epoch}
        if args.output_dir and dist.is_main_process():
            if log_writer is not None:
                log_writer.flush()
            with open(os.path.join(args.output_dir, "log.txt"), mode="a",
                      encoding="utf-8") as f:
                f.write(json.dumps(log_stats) + "\n")

        if preempted["flag"]:
            if args.output_dir and dist.is_main_process():
                ckpt_util.save_model(args, epoch, state.params, state.opt_state)
                print(f"[tulip_tpu] preemption checkpoint written at epoch {epoch}")
            break

    total_time = time.time() - start_time
    total_time_str = str(datetime.timedelta(seconds=int(total_time)))
    print('Training time {}'.format(total_time_str))
    print('Training finished')

    if global_rank == 0:
        finish_wandb(wandb_mod)


if __name__ == '__main__':
    from tulip_tpu.config import get_args_parser
    parser = get_args_parser()
    args = parser.parse_args()
    if args.output_dir and not args.eval:
        Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    main(args)
