"""Per-op device-time breakdown of the train (or eval) step from a real
jax.profiler trace.

Traces N steps on the current backend, then parses the Chrome-trace JSON the
TPU runtime emits and aggregates device-stream op durations by fusion name,
printing a sorted ms/step table — the fastest way to see where a step's time
actually goes (XLA fusions vs Pallas custom calls vs copies/transposes).

Usage: python scripts/trace_breakdown.py [--batch 16] [--steps 3]
       [--mode train|eval] [--attn pallas] [--out /tmp/jaxtrace]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def aggregate(trace_dir: str):
    """Returns (path, n_invocations, by_base, by_full, total_us) over the
    device 'XLA Ops' leaf lane only (the per-op stream; enclosing module /
    step spans live on their own lanes and would double-count)."""
    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        raise SystemExit(f"no trace files under {trace_dir}")
    path = files[-1]
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])

    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_name[e["pid"]] = e.get("args", {}).get("name", "")
        elif e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "tpu" in n.lower() or "device" in n.lower()}
    op_lanes = {k for k, n in tid_name.items()
                if k[0] in dev_pids and n == "XLA Ops"}
    mod_lanes = {k for k, n in tid_name.items()
                 if k[0] in dev_pids and n == "XLA Modules"}

    by_base = defaultdict(float)
    by_full = defaultdict(float)
    by_module = defaultdict(lambda: [0, 0.0])   # name -> [count, us]
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        lane = (e.get("pid"), e.get("tid"))
        if lane in mod_lanes:
            m = by_module[e.get("name", "?")]
            m[0] += 1
            m[1] += e["dur"]
            continue
        if op_lanes and lane not in op_lanes:
            continue
        name = e.get("name", "?")
        by_base[name.split(".")[0]] += e["dur"]
        by_full[name] += e["dur"]
        total += e["dur"]
    n_inv = sum(c for c, _ in by_module.values())
    return path, max(n_inv, 1), by_base, by_full, total, by_module


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--mode", default="train", choices=["train", "eval"])
    ap.add_argument("--attn", default="pallas")
    ap.add_argument("--out", default="/tmp/jaxtrace_breakdown")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--parse-only", default=None,
                    help="skip running; parse this trace dir")
    args = ap.parse_args()

    if args.parse_only is None:
        import jax
        import jax.numpy as jnp
        from tulip_tpu.config import model_config
        from tulip_tpu.models.tulip import apply_model, build_model, init_params
        from tulip_tpu.train.step import (init_train_state, make_optimizer,
                                          make_train_step)

        B = args.batch
        cfg = model_config('tulip_base', img_size=(32, 2048),
                           target_img_size=(128, 2048), patch_size=(1, 4),
                           window_size=(2, 8), pixel_shuffle=True,
                           circular_padding=True, log_transform=True,
                           patch_unmerging=True, attn_impl=args.attn)
        model = build_model(cfg)
        params = init_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        low = jnp.asarray(rng.uniform(0, 1, (B, 1, 32, 2048)).astype(np.float32))
        high = jnp.asarray(rng.uniform(0, 1, (B, 1, 128, 2048)).astype(np.float32))

        if args.mode == "train":
            tx = make_optimizer(0.01)
            state = init_train_state(params, tx)
            step = make_train_step(model, tx, compute_dtype=jnp.bfloat16,
                                   donate=False)
            run = lambda i: step(state, low, high, np.float32(1e-4),
                                 jax.random.PRNGKey(i))
        else:
            fwd = jax.jit(lambda p, lo: apply_model(
                p, model, lo, None, mode="eval", mc_drop=True,
                compute_dtype=jnp.bfloat16))
            run = lambda i: fwd(params, low)

        # warm up (compile) outside the trace
        out = run(0)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0],
                             np.float32).ravel()[0])
        with jax.profiler.trace(args.out):
            last = None
            for i in range(args.steps):
                last = run(i + 1)
            _ = float(np.asarray(jax.tree_util.tree_leaves(last)[0],
                                 np.float32).ravel()[0])
        trace_dir = args.out
        print("trace done")
    else:
        trace_dir = args.parse_only

    path, n_inv, by_base, by_full, total, by_module = aggregate(trace_dir)
    n_steps = args.steps
    print(f"parsed {path}")
    print(f"device XLA-Ops total: {total/1000:.1f} ms over {n_inv} module "
          f"invocation(s), {n_steps} step(s)  "
          f"(~{total/n_steps/1000:.2f} ms/step)")
    print("-- by module (count, ms/step):")
    for name, (c, us) in sorted(by_module.items(), key=lambda kv: -kv[1][1]):
        print(f"  {us/n_steps/1000:9.3f}  x{c:<4d} {name}")
    print("-- by op family (ms/step):")
    for name, us in sorted(by_base.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {us/n_steps/1000:9.3f}  {name}")
    print("-- top individual ops (ms/step):")
    for name, us in sorted(by_full.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {us/n_steps/1000:9.3f}  {name}")


if __name__ == "__main__":
    main()
