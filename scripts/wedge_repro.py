"""Staged repro for the intermittent on-chip hang first seen in the r4 eval
sweeps (device stops responding platform-wide until the pool watchdog resets
it, ~40 min).

Observed: the eval/MC engines hang at the first sample's chamfer read in 2
of 3 runs (bf16 runs; one fp32 run completed).  Suspects, in order:
  A. chamfer_h (hierarchical) at the engine's chunk=4096 (bench_chamfer
     historically measured chunk=1024) — standalone loop;
  B. the bf16 batch-1 fused-MSA eval forward — standalone loop;
  C. the eval loop's interleave: forward dispatch + chamfer dispatch with
     host reads of both while the other is in flight.

Run one stage per invocation (a hang costs a ~40 min watchdog reset):
    python scripts/wedge_repro.py --stage A [--iters 20] [--chunk 4096]
Prints STAGE_<X>_OK on success; a hang identifies the trigger.
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _clouds(seed=0, n=262144):
    rng = np.random.default_rng(seed)
    base = rng.uniform(3.0, 25.0, (n, 1))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    gt = (base * d).astype(np.float32)
    pred = gt + rng.normal(0, 0.05, gt.shape).astype(np.float32)
    return pred, gt


def stage_a(iters, chunk):
    """Direct pallas_h sweeps at an explicit --chunk (the r4 eval loop ran
    the hierarchical kernel at 4096, never bench-validated — suspect A)."""
    import jax
    import jax.numpy as jnp
    from tulip_tpu.ops import get_chamfer_impl, set_default_chamfer_impl
    set_default_chamfer_impl(os.environ.get("WEDGE_CHAMFER", "pallas_h"))
    impl = get_chamfer_impl()

    @jax.jit
    def pair(p1, p2):
        return jnp.mean(impl(p1, p2, chunk=chunk)), \
            jnp.mean(impl(p2, p1, chunk=chunk))

    for i in range(iters):
        pred, gt = _clouds(seed=i)
        rem = (-gt.shape[0]) % chunk
        if rem:
            pad = np.full((rem, 3), 1e8, np.float32)
            gt = np.concatenate([gt, pad])
            pred = np.concatenate([pred, pad])
        t0 = time.perf_counter()
        d1, d2 = pair(jnp.asarray(gt), jnp.asarray(pred))
        v = float(d1) + float(d2)
        print(f"A iter {i}: chamfer={v:.4f} dt={time.perf_counter()-t0:.2f}s",
              flush=True)
    print("STAGE_A_OK")


def _build_fwd():
    import jax
    import jax.numpy as jnp
    from tulip_tpu.config import model_config
    from tulip_tpu.eval.engine import _make_mc_forward
    from tulip_tpu.models.tulip import build_model, init_params
    cfg = model_config("tulip_base", img_size=(32, 2048),
                       target_img_size=(128, 2048), patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True, attn_impl="pallas")
    model = build_model(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    fwd = _make_mc_forward(model, jnp.bfloat16)
    rng = np.random.default_rng(0)
    low = jnp.asarray(np.log1p(rng.uniform(0.02, 0.4, (1, 1, 32, 2048))
                               ).astype(np.float32))
    key = jax.random.PRNGKey(0)
    return fwd, params, low, key


def stage_b(iters, chunk):
    import jax
    fwd, params, low, key = _build_fwd()
    for i in range(iters):
        t0 = time.perf_counter()
        out = fwd(params, low, jax.random.fold_in(key, i))
        s = float(out.sum())
        print(f"B iter {i}: sum={s:.3f} dt={time.perf_counter()-t0:.2f}s",
              flush=True)
    print("STAGE_B_OK")


def stage_c(iters, chunk):
    import jax
    from tulip_tpu.eval.metrics import chamfer_distance_async
    fwd, params, low, key = _build_fwd()
    pending = None
    for i in range(iters):
        out = fwd(params, low, jax.random.fold_in(key, i))   # dispatch
        if pending is not None:
            po, pi = pending
            s = float(np.asarray(po).sum())                  # read fwd i-1
            pred, gt = _clouds(seed=pi)
            h = chamfer_distance_async(gt, pred)             # dispatch sweep
            v = h()                                          # read sweep
            print(f"C iter {pi}: sum={s:.3f} chamfer={v:.4f}", flush=True)
        pending = (out, i)
    print("STAGE_C_OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["A", "B", "C"], required=True)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--chunk", type=int, default=4096)
    args = ap.parse_args()
    {"A": stage_a, "B": stage_b, "C": stage_c}[args.stage](args.iters,
                                                           args.chunk)


if __name__ == "__main__":
    main()
