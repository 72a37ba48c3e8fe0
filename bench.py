"""Throughput benchmark: range-images/sec/chip, TULIP-base DurLAR 32x2048 ->
128x2048 (the BASELINE.json north-star config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu",
"tflops", "gflop_per_img"}.

vs_baseline: ratio against BASELINE.json's published reference number
(published.a100_pytorch_images_per_sec) when present; otherwise against the
first recorded TPU measurement in BASELINE.json (published.first_tpu_record).
NOTE: with no A100 in this environment the latter is progress-tracking only,
not an external baseline — the honest absolute account is the MFU fields:
analytic useful FLOPs (tulip_tpu/utils/flops.py, excludes padding waste)
achieved per second as a fraction of the chip's dense bf16 peak.  See
BASELINE.md "A100-baseline policy".
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0,
                    help="batch size (0 = sweep and pick best)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--mode", choices=["infer", "train"], default="infer")
    ap.add_argument("--img", nargs=2, type=int, default=(32, 2048))
    ap.add_argument("--target", nargs=2, type=int, default=(128, 2048))
    ap.add_argument("--attn", default="pallas",
                    choices=["xla", "grouped", "pallas"])
    ap.add_argument("--model", default="tulip_base",
                    choices=["tulip_base", "tulip_large"])
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--dispatch", choices=["scan", "host"], default="scan",
                    help="scan: chain the timed iterations on-device in one "
                    "lax.scan dispatch (measures device throughput; default)."
                    " host: one dispatch per iteration (includes the ~5 ms "
                    "per-call axon tunnel overhead in the number)")
    ap.add_argument("--reps", type=int, default=3,
                    help="timed repetitions (scan dispatch); best is reported")
    args = ap.parse_args()

    # Fail fast (rc=3) instead of hanging forever when the TPU tunnel is
    # down: importing jax here initializes the axon PJRT plugin, whose
    # device init blocks indefinitely if the tunnel is unreachable.  Probe
    # it in a killable subprocess first.
    if os.environ.get("TULIP_TPU_SKIP_PROBE") != "1":
        import subprocess
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                env={**os.environ, "TULIP_TPU_SKIP_PROBE": "1"},
                capture_output=True, text=True, timeout=900)
            rc, err = probe.returncode, probe.stderr
        except subprocess.TimeoutExpired:
            rc, err = -1, "device init did not finish within 900 s"
        if rc != 0:
            print(err[-2000:], file=sys.stderr)
            print("FATAL: backend init failed; not benchmarking",
                  file=sys.stderr)
            sys.exit(3)

    import jax
    import jax.numpy as jnp

    from tulip_tpu.config import model_config
    from tulip_tpu.models.tulip import apply_model, build_model, init_params

    cfg = model_config(args.model, img_size=tuple(args.img),
                       target_img_size=tuple(args.target), patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True, attn_impl=args.attn)
    model = build_model(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    n_chips = jax.device_count()

    rng = np.random.default_rng(0)

    def bench_batch(B):
        low = jnp.asarray(rng.uniform(0, 1, (B, 1, *cfg.img_size)).astype(np.float32))
        high = jnp.asarray(rng.uniform(0, 1, (B, 1, *cfg.target_img_size)).astype(np.float32))

        # `salt` forces a data dependence between iterations so the loop
        # cannot be overlapped/elided by an async runtime (a tiny nonzero
        # scale so nothing can constant-fold the chain away; it vanishes in
        # bf16 compute).
        if args.mode == "infer":
            def one_iter(p, lo, salt):
                pred = apply_model(p, model, lo + salt, None, mode="eval",
                                   mc_drop=True, compute_dtype=jnp.bfloat16)
                return jnp.mean(pred).astype(jnp.float32) * 1e-12

            if args.dispatch == "scan":
                def fn_many(p, lo, salt, K):
                    def body(s, _):
                        return one_iter(p, lo, s), None
                    s, _ = jax.lax.scan(body, salt, None, length=K)
                    return s
                fn_many = jax.jit(fn_many, static_argnums=3)
                salt = jnp.zeros((), jnp.float32)
                # warm up with the SAME static K as the timed reps — K is a
                # static arg, so a different warmup length would leave the
                # full iters-length compile inside the first timed rep
                _ = float(fn_many(params, low, salt, args.iters))
                dt = None
                for _rep in range(max(args.reps, 1)):
                    t0 = time.perf_counter()
                    _ = float(fn_many(params, low, salt, args.iters))
                    rep_dt = time.perf_counter() - t0
                    dt = rep_dt if dt is None else min(dt, rep_dt)
            else:
                fn = jax.jit(one_iter)
                salt = jnp.zeros((), jnp.float32)
                salt = fn(params, low, salt)
                _ = float(salt)   # host read: block_until_ready is
                for _ in range(args.warmup):   # unreliable on axon
                    salt = fn(params, low, salt)
                _ = float(salt)
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    salt = fn(params, low, salt)
                _ = float(salt)  # everything must have executed
                dt = time.perf_counter() - t0
        else:
            from tulip_tpu.train.step import (init_train_state, make_optimizer,
                                              make_train_step)
            tx = make_optimizer(0.01)
            # fresh param buffers per sweep point: the donated train state
            # consumes them (donate_argnums), deleting the shared originals
            params_copy = jax.tree_util.tree_map(jnp.array, params)
            state = init_train_state(params_copy, tx)
            key = jax.random.PRNGKey(0)
            if args.dispatch == "scan":
                step = make_train_step(model, tx, compute_dtype=jnp.bfloat16,
                                       donate=False)

                def steps_many(st, lo, hi, K):
                    def body(s, _):
                        s, (tl, _pl) = step(s, lo, hi, np.float32(1e-4), key)
                        return s, tl
                    st, tls = jax.lax.scan(body, st, None, length=K)
                    return st, tls[-1]
                steps_many = jax.jit(steps_many, static_argnums=3,
                                     donate_argnums=0)
                # same static K as the timed reps (see infer path)
                state, tl = steps_many(state, low, high, args.iters)
                _ = float(tl)
                dt = None
                for _rep in range(max(args.reps, 1)):
                    t0 = time.perf_counter()
                    state, tl = steps_many(state, low, high, args.iters)
                    _ = float(tl)
                    rep_dt = time.perf_counter() - t0
                    dt = rep_dt if dt is None else min(dt, rep_dt)
            else:
                step = make_train_step(model, tx, compute_dtype=jnp.bfloat16)
                state, (tl, _) = step(state, low, high, np.float32(1e-4), key)
                _ = float(tl)   # host read: block_until_ready is unreliable
                for _ in range(args.warmup):
                    state, (tl, _) = step(state, low, high, np.float32(1e-4), key)
                _ = float(tl)
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    state, (tl, _) = step(state, low, high, np.float32(1e-4), key)
                _ = float(tl)
                dt = time.perf_counter() - t0

        ips = B * args.iters / dt
        if args.verbose:
            print(f"  batch {B}: {ips:.1f} img/s ({dt/args.iters*1000:.1f} ms/step)",
                  file=sys.stderr)
        return ips

    last_exc = [None]

    def sweep_batches():
        best, best_b = 0.0, 0
        for B in (1, 2, 4, 8, 16, 32):
            try:
                ips = bench_batch(B)
            except Exception as e:
                last_exc[0] = e
                if args.verbose:
                    print(f"  batch {B}: failed ({type(e).__name__}: "
                          f"{str(e)[:300]})", file=sys.stderr)
                if best > 0:   # OOM after a success: stop the sweep
                    break
                continue       # small-batch compile quirk: keep sweeping
            if ips > best:
                best, best_b = ips, B
            elif ips < best * 0.9:
                break
        return best, best_b

    # Autotune over the numerics-pinned kernel-variant flags (each variant
    # computes the same math — equivalence tests pin them to the default
    # path): sweep batch on defaults, then re-run the best batch per
    # variant and report the winner + its configuration.
    VARIANTS = {
        "infer": [{}, {"TULIP_TPU_MSA_GROUPED": "1"}],
        "train": [{}],
    }[args.mode] if args.attn == "pallas" else [{}]
    _FLAG_KEYS = ("TULIP_TPU_MSA_NAT", "TULIP_TPU_MSA_GROUPED")

    def with_flags(flags, fn):
        saved = {k: os.environ.pop(k, None) for k in _FLAG_KEYS}
        os.environ.update(flags)
        # the flags are read at TRACE time by module-level-jitted kernels
        # with identical avals across variants — without busting the jit
        # cache each variant would silently re-measure the first one's
        # compiled kernel
        jax.clear_caches()
        try:
            return fn()
        finally:
            for k in _FLAG_KEYS:
                os.environ.pop(k, None)
                if saved[k] is not None:
                    os.environ[k] = saved[k]

    if args.batch > 0:
        best, best_b = with_flags(VARIANTS[0], lambda: bench_batch(args.batch)), args.batch
    else:
        best, best_b = with_flags(VARIANTS[0], sweep_batches)
    best_flags = dict(VARIANTS[0])
    for flags in VARIANTS[1:]:
        if best_b == 0:
            break
        try:
            ips = with_flags(flags, lambda: bench_batch(best_b))
        except Exception as e:
            if args.verbose:
                print(f"  variant {flags}: failed ({type(e).__name__}: "
                      f"{str(e)[:200]})", file=sys.stderr)
            continue
        if args.verbose:
            print(f"  variant {flags}: {ips:.1f} img/s", file=sys.stderr)
        if ips > best:
            best, best_flags = ips, dict(flags)

    if best <= 0.0:
        # a graded artifact must never encode total failure as a number:
        # an all-fail sweep exits nonzero with the captured exception
        if last_exc[0] is not None:
            import traceback
            traceback.print_exception(last_exc[0], file=sys.stderr)
        print("FATAL: every benchmark attempt failed; refusing to print a "
              "pass-shaped zero", file=sys.stderr)
        sys.exit(1)

    value = best / n_chips

    vs_baseline = None
    baseline_path = os.path.join(REPO, "BASELINE.json")
    if os.path.exists(baseline_path):
        published = json.load(open(baseline_path)).get("published", {})
        if args.mode == "train":
            ref = published.get("a100_pytorch_train_images_per_sec") \
                or published.get("first_tpu_train_record")
        else:
            ref = published.get("a100_pytorch_images_per_sec") \
                or published.get("first_tpu_record")
        if ref:
            vs_baseline = round(value / float(ref), 3)

    from tulip_tpu.utils.flops import (chip_peak_tflops, mfu,
                                       model_forward_flops, model_train_flops)
    flops_per_img = (model_forward_flops(cfg) if args.mode == "infer"
                     else model_train_flops(cfg))
    peak = chip_peak_tflops()
    tflops, util = mfu(value, flops_per_img, peak)

    metric = ("range-images/sec/chip 32->128 upsampling"
              if args.mode == "infer"
              else "train images/sec/chip 32->128")
    print(json.dumps({"metric": metric, "value": round(value, 2),
                      "unit": "images/sec/chip", "vs_baseline": vs_baseline,
                      "mfu": round(util, 4), "tflops": round(tflops, 2),
                      "gflop_per_img": round(flops_per_img / 1e9, 2),
                      "peak_tflops": peak,
                      "config": {"batch": best_b, "flags": best_flags}}))


if __name__ == "__main__":
    main()
