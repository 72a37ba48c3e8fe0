"""Device-mesh setup and sharding helpers.

TPU-native replacement for the reference's DDP/NCCL stack
(tulip/util/misc.py:253-285, main_lidar_upsampling.py:276-278): one global
``jax.sharding.Mesh`` with a ``data`` axis (optionally a ``seq`` axis for
width/sequence sharding of the token grid — the natural scale-out axis for
windowed attention over cylindrical range images, see SURVEY.md section 5.7).

Parameters are replicated, the batch is sharded over ``data``; XLA inserts
psum for the gradient reduction inside the jitted train step, riding ICI
within a slice and DCN across slices.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .import dist


def discover_launcher_env(args=None):
    """Rank/world/coordinator discovery, same precedence as the reference's
    ``init_distributed_mode`` (tulip/util/misc.py:253-274):

    1. ``--dist_on_itp``: OpenMPI env (OMPI_COMM_WORLD_RANK/SIZE +
       MASTER_ADDR/MASTER_PORT); re-exports RANK/WORLD_SIZE/LOCAL_RANK like
       the reference does.
    2. torchrun env: RANK/WORLD_SIZE (+ MASTER_ADDR/MASTER_PORT).
    3. SLURM: SLURM_PROCID/SLURM_NTASKS.

    Returns (rank, world, coordinator_or_None).
    """
    env = os.environ
    if args is not None and getattr(args, "dist_on_itp", False) \
            and "OMPI_COMM_WORLD_RANK" in env:
        rank = int(env["OMPI_COMM_WORLD_RANK"])
        world = int(env["OMPI_COMM_WORLD_SIZE"])
        env["RANK"] = str(rank)
        env["WORLD_SIZE"] = str(world)
        env["LOCAL_RANK"] = env.get("OMPI_COMM_WORLD_LOCAL_RANK", "0")
        coord = None
        if "MASTER_ADDR" in env:
            coord = env["MASTER_ADDR"] + ":" + env.get("MASTER_PORT", "29500")
        return rank, world, coord
    if "RANK" in env and "WORLD_SIZE" in env:
        rank, world = int(env["RANK"]), int(env["WORLD_SIZE"])
        coord = None
        if "MASTER_ADDR" in env:
            coord = env["MASTER_ADDR"] + ":" + env.get("MASTER_PORT", "29500")
        return rank, world, coord
    if "SLURM_PROCID" in env:
        rank = int(env["SLURM_PROCID"])
        world = int(env.get("SLURM_NTASKS", "1"))
        coord = None
        if "MASTER_ADDR" in env:
            coord = env["MASTER_ADDR"] + ":" + env.get("MASTER_PORT", "29500")
        return rank, world, coord
    return 0, 1, None


def init_distributed_mode(args) -> None:
    """torchrun/OMPI/SLURM-compatible startup (reference: misc.py:253-285).

    The shipped bash_scripts launch via ``torchrun --nproc_per_node=N``.
    Under single-controller JAX one process drives all chips, so when
    torchrun spawns N>1 processes on one host, rank 0 claims all local
    devices and ranks>0 exit cleanly — the scripts run unchanged and the
    effective global batch (batch_size x nproc) is preserved by widening the
    per-step batch (see main_lidar_upsampling.py shim).
    """
    rank, world, coord = discover_launcher_env(args)
    args.rank = rank
    args.launcher_world_size = world
    args.distributed = False
    if int(os.environ.get("TULIP_TPU_MULTIHOST", "0")):
        # Multi-host: one JAX process per host, each driving its local
        # chips.  The coordinator is discovered the same way the reference
        # discovers its NCCL rendezvous (misc.py:253-274): torchrun/OMPI/
        # SLURM env mapped by discover_launcher_env.  On TPU pods those are
        # absent and jax auto-detects instead.
        kwargs = {}
        if coord is not None and world > 1:
            kwargs = dict(coordinator_address=coord,
                          num_processes=world, process_id=rank)
        jax.distributed.initialize(**kwargs)
        args.distributed = True
        args.rank = jax.process_index()
    elif world > 1 and rank > 0:
        print(f"[tulip_tpu] torchrun rank {rank}/{world}: single-controller "
              "JAX drives all chips from rank 0; this rank exits.")
        raise SystemExit(0)
    from ..utils.logger import setup_for_distributed
    setup_for_distributed(dist.is_main_process())


def make_mesh(mesh_shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Build the global device mesh.  Default: 1-D data-parallel mesh over
    all devices."""
    devices = np.asarray(jax.devices())
    if mesh_shape is None:
        mesh_shape = (len(devices),)
    if len(mesh_shape) > len(axis_names):
        axis_names = tuple(axis_names) + tuple(
            f"ax{i}" for i in range(len(mesh_shape) - len(axis_names)))
    devices = devices[: int(np.prod(mesh_shape))].reshape(tuple(mesh_shape))
    return Mesh(devices, tuple(axis_names)[: len(mesh_shape)])


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the 'data' axis; under a dp x sp mesh the
    NCHW width axis additionally shards over 'seq' (parallel/sp.py)."""
    spec = [None] * 4
    spec[0] = "data"
    if "seq" in mesh.axis_names:
        spec[3] = "seq"
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along dim 0.

    Single-process: a plain sharded device_put of the global batch.
    Multi-process (``jax.distributed``): each host passes only its OWN
    shard of the batch (the loader is constructed per-host via
    ``ShardedSampler(num_replicas=process_count, rank=process_index)``) and
    the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the multi-host analogue of
    the reference's per-rank DistributedSampler + DDP pairing
    (main_lidar_upsampling.py:172-178)."""
    sharding = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda a: jax.make_array_from_process_local_data(
                sharding, np.ascontiguousarray(a)), batch)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), batch)
