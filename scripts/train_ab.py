"""On-chip A/B of trace-time env-flag variants on the flagship TRAIN step
(batch 8, bf16, scan-chained timing, jit cache busted between variants) —
the training twin of flag_ab.py.

Usage: AB_BATCH=8 python scripts/train_ab.py "" "TULIP_TPU_ATTN_BUDGET_MB=24"
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FLAG_KEYS = ("TULIP_TPU_ATTN_BUDGET_MB", "TULIP_TPU_ATTN_MAXG",
             "TULIP_TPU_MLP_BWD_MB", "TULIP_TPU_MLP_TILE_MB",
             "TULIP_TPU_MSA_BUDGET_MB", "TULIP_TPU_ATTN_ROWEXP",
             "TULIP_TPU_REMAT_BLOCKS", "TULIP_TPU_LN_PALLAS")


def main():
    variants = sys.argv[1:] or [""]
    import jax
    import jax.numpy as jnp
    from tulip_tpu.config import model_config
    from tulip_tpu.models.tulip import build_model, init_params
    from tulip_tpu.train.step import (init_train_state, make_optimizer,
                                      make_train_step)

    B = int(os.environ.get("AB_BATCH", "8"))
    iters = int(os.environ.get("AB_ITERS", "10"))
    cfg = model_config("tulip_base", img_size=(32, 2048),
                       target_img_size=(128, 2048), patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True, attn_impl="pallas")
    model = build_model(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(weight_decay=0.01)
    rng = np.random.default_rng(0)
    low = jnp.asarray(rng.uniform(0, 1, (B, 1, 32, 2048)).astype(np.float32))
    high = jnp.asarray(
        rng.uniform(0, 1, (B, 1, 128, 2048)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    for spec in variants:
        for k in FLAG_KEYS:
            os.environ.pop(k, None)
        flags = {}
        if spec:
            for kv in spec.split(","):
                k, v = kv.split("=")
                flags[k] = v
        os.environ.update(flags)
        jax.clear_caches()
        step = make_train_step(model, tx, compute_dtype=jnp.bfloat16,
                               donate=False)
        state = init_train_state(params, tx)
        try:
            # warm: compile once, run once
            state, (tl, pl_) = step(state, low, high, np.float32(1e-4), key)
            float(tl)
            best = None
            for _rep in range(3):
                t0 = time.perf_counter()
                for i in range(iters):
                    state, (tl, pl_) = step(state, low, high,
                                            np.float32(1e-4), key)
                float(tl)   # serialize (block_until_ready unreliable)
                dt = (time.perf_counter() - t0) / iters
                best = dt if best is None else min(best, dt)
            print(f"{spec or '(default)':60s} {B / best:8.1f} img/s "
                  f"({best * 1e3:.2f} ms/step)", flush=True)
        except Exception as e:
            print(f"{spec or '(default)':60s} FAILED: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
