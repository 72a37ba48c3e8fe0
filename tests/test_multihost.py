"""Multi-host init coverage: TULIP_TPU_MULTIHOST=1 -> jax.distributed.

Spawns 2 real processes on the CPU backend, each claiming to be one "host"
of a 2-host job, wired through the same torchrun-style env rendezvous the
reference uses for NCCL (tulip/util/misc.py:253-274: RANK / WORLD_SIZE /
MASTER_ADDR / MASTER_PORT).  Verifies:

- jax.distributed.initialize() connects (process_count == 2)
- rank/world shims map to process index (parallel/dist.py)
- cross-process scalar reduction (all_reduce_mean) is correct
- logging/checkpoint gating: only process 0 is "main"; rank-1 prints are
  suppressed by setup_for_distributed (reference: misc.py:189-204)
- a global-mesh psum over both processes' devices executes
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
sys.path.insert(0, os.environ["TULIP_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon,cpu

import types
import numpy as np

from tulip_tpu.parallel.mesh import init_distributed_mode, make_mesh
from tulip_tpu.parallel import dist

args = types.SimpleNamespace()
init_distributed_mode(args)

assert args.distributed is True
assert jax.process_count() == 2, jax.process_count()
rank = int(os.environ["RANK"])
assert dist.get_rank() == jax.process_index() == rank
assert dist.is_main_process() == (rank == 0)

# cross-process scalar mean: rank r contributes (r+1.0) -> mean 1.5
m = dist.all_reduce_mean(float(rank) + 1.0)
assert abs(m - 1.5) < 1e-9, m

# global-mesh collective: psum of ones over every device of both hosts
from jax.sharding import NamedSharding, PartitionSpec as P
mesh = make_mesh()
n_global = jax.device_count()
local = np.ones((len(mesh.local_devices), 1), np.float32)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data", None)), local, (n_global, 1))
total = jax.jit(lambda x: jax.numpy.sum(x),
                out_shardings=NamedSharding(mesh, P()))(garr)
assert float(total) == float(n_global), (float(total), n_global)

dist.barrier()
# gated print: visible from rank 0 only (setup_for_distributed)
print(f"MULTIHOST_OK rank={rank} world={jax.process_count()}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_multihost_cpu(tmp_path):
    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            TULIP_TPU_MULTIHOST="1",
            RANK=str(rank), WORLD_SIZE="2", LOCAL_RANK=str(rank),
            MASTER_ADDR="127.0.0.1", MASTER_PORT=str(port),
            TULIP_REPO=REPO,
            PALLAS_AXON_POOL_IPS="",
            JAX_PLATFORMS="cpu",
        )
        env.pop("XLA_FLAGS", None)  # 1 CPU device per "host" process
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rank {rank}:\n{err[-3000:]}"
        outs.append(out)
    assert "MULTIHOST_OK rank=0 world=2" in outs[0]
    # setup_for_distributed suppresses plain prints on non-main processes
    assert "MULTIHOST_OK" not in outs[1]
