"""Parallel/distributed layer tests: mesh helpers, rank shims, torchrun
tolerance of the CLI (reference launch path: torchrun --nproc_per_node=N,
bash_scripts/*.sh)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_mesh_and_sharding():
    import jax
    from jax.sharding import PartitionSpec as P
    from tulip_tpu.parallel.mesh import (data_sharding, make_mesh, replicate,
                                         shard_batch)
    mesh = make_mesh()
    assert mesh.devices.size == jax.device_count() == 8
    batch = {"low": np.zeros((8, 1, 4, 8), np.float32)}
    sharded = shard_batch(mesh, batch)
    assert sharded["low"].sharding.spec == P("data", None, None, None)


def test_dist_shims_single_process():
    from tulip_tpu.parallel import dist
    assert dist.get_world_size() == 1
    assert dist.get_rank() == 0
    assert dist.is_main_process()
    assert dist.all_reduce_mean(3.5) == 3.5


def test_torchrun_rank_nonzero_exits_cleanly():
    """Under torchrun, ranks > 0 must exit 0 immediately so the shipped
    bash scripts don't crash (SURVEY.md 7.3.6)."""
    env = dict(os.environ)
    env.update(RANK="1", WORLD_SIZE="4", LOCAL_RANK="1",
               MASTER_ADDR="127.0.0.1", MASTER_PORT="29500",
               JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, "tulip/main_lidar_upsampling.py",
         "--model_select", "tulip_base", "--dataset_select", "kitti",
         "--img_size_low_res", "16", "256",
         "--img_size_high_res", "64", "256",
         "--window_size", "2", "8", "--patch_size", "1", "4",
         "--data_path_low_res", "/nonexistent",
         "--data_path_high_res", "/nonexistent",
         "--output_dir", "/tmp/never_used_rank1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert not os.path.exists("/tmp/never_used_rank1/log.txt")


def test_sampler_epoch_reshuffle_deterministic():
    from tulip_tpu.data.pipeline import ShardedSampler
    s1 = ShardedSampler(100, shuffle=True, seed=7)
    s2 = ShardedSampler(100, shuffle=True, seed=7)
    s1.set_epoch(3)
    s2.set_epoch(3)
    assert list(s1) == list(s2)


def test_launcher_env_discovery(monkeypatch):
    """OMPI (--dist_on_itp) and SLURM rank discovery, same precedence as the
    reference's init_distributed_mode (tulip/util/misc.py:253-274)."""
    import types
    from tulip_tpu.parallel.mesh import discover_launcher_env

    for var in ("RANK", "WORLD_SIZE", "LOCAL_RANK", "MASTER_ADDR",
                "MASTER_PORT", "SLURM_PROCID", "SLURM_NTASKS",
                "OMPI_COMM_WORLD_RANK", "OMPI_COMM_WORLD_SIZE",
                "OMPI_COMM_WORLD_LOCAL_RANK"):
        monkeypatch.delenv(var, raising=False)

    # no launcher env -> single process
    assert discover_launcher_env(None) == (0, 1, None)

    # OMPI env honored only under --dist_on_itp, and re-exports RANK etc.
    monkeypatch.setenv("OMPI_COMM_WORLD_RANK", "3")
    monkeypatch.setenv("OMPI_COMM_WORLD_SIZE", "8")
    monkeypatch.setenv("OMPI_COMM_WORLD_LOCAL_RANK", "1")
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.2")
    monkeypatch.setenv("MASTER_PORT", "23456")
    assert discover_launcher_env(
        types.SimpleNamespace(dist_on_itp=False)) == (0, 1, None)
    rank, world, coord = discover_launcher_env(
        types.SimpleNamespace(dist_on_itp=True))
    assert (rank, world, coord) == (3, 8, "10.0.0.2:23456")
    assert os.environ["RANK"] == "3"
    assert os.environ["WORLD_SIZE"] == "8"
    assert os.environ["LOCAL_RANK"] == "1"

    # torchrun env takes precedence once set
    monkeypatch.setenv("RANK", "2")
    monkeypatch.setenv("WORLD_SIZE", "4")
    assert discover_launcher_env(None) == (2, 4, "10.0.0.2:23456")

    # SLURM fallback
    monkeypatch.delenv("RANK")
    monkeypatch.delenv("WORLD_SIZE")
    monkeypatch.delenv("OMPI_COMM_WORLD_RANK")
    monkeypatch.setenv("SLURM_PROCID", "5")
    monkeypatch.setenv("SLURM_NTASKS", "16")
    rank, world, coord = discover_launcher_env(None)
    assert (rank, world, coord) == (5, 16, "10.0.0.2:23456")
    monkeypatch.delenv("MASTER_ADDR")
    assert discover_launcher_env(None) == (5, 16, None)
