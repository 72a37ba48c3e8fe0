"""Chamfer kernel benchmark at eval scale (DurLAR: 262144-point clouds)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from tulip_tpu.ops.chamfer import min_sq_dists_xla
from tulip_tpu.ops.pallas.chamfer import min_sq_dists_pallas

N = 262144
rng = np.random.default_rng(0)
a = jnp.asarray(rng.uniform(-60, 60, (N, 3)).astype(np.float32))
b = jnp.asarray(rng.uniform(-60, 60, (N, 3)).astype(np.float32))

for name, fn in (("xla", min_sq_dists_xla), ("pallas", min_sq_dists_pallas)):
    d = fn(a, b, chunk=4096)
    s = float(jnp.sum(d))  # sync
    t0 = time.perf_counter()
    for i in range(5):
        d = fn(a + np.float32(i) * 0.0, b, chunk=4096)
    s2 = float(jnp.sum(d))
    dt = (time.perf_counter() - t0) / 5
    print(f"chamfer {name}: {dt*1000:.1f} ms per direction "
          f"({N}x{N} pairs, sum={s2:.1f})", flush=True)
