"""Rank/world shims over single-controller JAX.

Parity target: tulip/util/misc.py:189-215, 473-481.  The reference is
multi-process (one rank per GPU, NCCL); JAX is single-controller — one Python
process drives all local chips, and multi-host runs have one process per
host.  So:

- ``get_rank``/``is_main_process`` map to ``jax.process_index()``
- ``get_world_size`` maps to ``jax.process_count()`` (host processes, the
  unit that matters for logging/checkpoint gating)
- gradient reduction is NOT done here — it happens inside the jitted train
  step as XLA collectives over the device mesh (tulip_tpu/train/step.py)
- scalar metric reduction uses multihost_utils when multi-process
"""

from __future__ import annotations

import numpy as np


def get_world_size() -> int:
    import jax
    return jax.process_count()


def get_rank() -> int:
    import jax
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def get_num_devices() -> int:
    import jax
    return jax.device_count()


def all_reduce_sum(x: np.ndarray) -> np.ndarray:
    """SUM all-reduce of a small host array across processes
    (reference: misc.py:44-55)."""
    if get_world_size() <= 1:
        return x
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x)).sum(axis=0)


def all_reduce_mean(x: float) -> float:
    """(reference: misc.py:473-481)"""
    world_size = get_world_size()
    if world_size > 1:
        return float(all_reduce_sum(np.asarray([x], np.float64))[0]) / world_size
    return x


def barrier() -> None:
    if get_world_size() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("tulip_tpu_barrier")
