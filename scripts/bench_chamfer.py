"""Chamfer kernel benchmark at eval scale (DurLAR: ~262144-point clouds).

Two workloads:
- "scene": clouds projected from a synthetic DurLAR range image through the
  real sensor model (eval/geometry.py) — the actual eval workload, spatially
  structured, where the hierarchical kernel's tile skipping pays off.
- "uniform": i.i.d. uniform boxes — the skipping worst case.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from tulip_tpu.ops.chamfer import min_sq_dists_xla
from tulip_tpu.ops.pallas.chamfer import min_sq_dists_pallas
from tulip_tpu.ops.pallas.chamfer_h import min_sq_dists_pallas_h

CHUNK = 4096


def pad_to(x, mult):
    p = (-len(x)) % mult
    if p:
        x = np.concatenate([x, np.full((p, 3), 1e8, np.float32)])
    return x


def make_clouds(kind):
    rng = np.random.default_rng(0)
    if kind == "uniform":
        N = 262144
        a = rng.uniform(-60, 60, (N, 3)).astype(np.float32)
        b = rng.uniform(-60, 60, (N, 3)).astype(np.float32)
        return a, b
    from tulip_tpu.eval.geometry import img_to_pcd_durlar
    base = rng.uniform(5, 100, (128, 1)) * np.ones((1, 2048))
    img = np.clip(base + rng.uniform(-2, 2, (128, 2048)), 0.5, 119.0) / 120.0
    img2 = np.clip(img + rng.uniform(-0.01, 0.01, img.shape), 0.004, 1.0)
    a = img_to_pcd_durlar(img.astype(np.float32)).astype(np.float32)
    b = img_to_pcd_durlar(img2.astype(np.float32)).astype(np.float32)
    return a, b


for kind in ("scene", "uniform"):
    a_np, b_np = make_clouds(kind)
    a = jnp.asarray(a_np)
    b = jnp.asarray(pad_to(b_np, CHUNK))
    print(f"--- {kind}: {len(a_np)} x {len(b_np)} points", flush=True)
    for name, fn in (("xla", min_sq_dists_xla),
                     ("pallas", min_sq_dists_pallas),
                     ("pallas_h", min_sq_dists_pallas_h)):
        chunk = 1024 if name == "pallas_h" else CHUNK
        d = fn(a, b, chunk=chunk)
        s = float(jnp.sum(d))  # sync
        t0 = time.perf_counter()
        for i in range(5):
            d = fn(a + np.float32(i) * 0.0, b, chunk=chunk)
        s2 = float(jnp.sum(d))
        dt = (time.perf_counter() - t0) / 5
        print(f"chamfer {name}: {dt*1000:.1f} ms per direction "
              f"(sum={s2:.1f})", flush=True)
