"""Quick on-chip A/B of trace-time env-flag variants on the flagship
inference forward (batch 16, bf16, scan-chained timing, one compile per
variant with the jit cache busted in between).

Usage: python scripts/flag_ab.py "" "TULIP_TPU_MSA_GROUPED=1"
Each positional arg is one comma-separated KEY=VAL set ('' = defaults).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FLAG_KEYS = ("TULIP_TPU_MSA_NAT", "TULIP_TPU_MSA_GROUPED",
             "TULIP_TPU_MSA_MASKED", "TULIP_TPU_LN_PALLAS", "TULIP_TPU_MLP_ACT",
             "TULIP_TPU_LN_XLA", "TULIP_TPU_NO_HALO", "TULIP_TPU_MSA_PACKED",
             "TULIP_TPU_GELU_TANH", "TULIP_TPU_MSA_BUDGET_MB",
             "TULIP_TPU_MLP_TILE_MB", "TULIP_TPU_SM_PROBE",
             "TULIP_TPU_SM_MXU", "TULIP_TPU_MSA_GROUP")


def main():
    variants = sys.argv[1:] or [""]
    import jax
    import jax.numpy as jnp
    from tulip_tpu.config import model_config
    from tulip_tpu.models.tulip import apply_model, build_model, init_params

    B = int(os.environ.get("AB_BATCH", "16"))
    iters = int(os.environ.get("AB_ITERS", "20"))
    cfg = model_config("tulip_base", img_size=(32, 2048),
                       target_img_size=(128, 2048), patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True, attn_impl="pallas")
    model = build_model(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    low = jnp.asarray(rng.uniform(0, 1, (B, 1, 32, 2048)).astype(np.float32))

    def fwd(p, x, salt, K):
        def body(s, _):
            pred = apply_model(p, model, x + s, None, mode="eval",
                               mc_drop=True, compute_dtype=jnp.bfloat16)
            return jnp.mean(pred).astype(jnp.float32) * 1e-12, None
        s, _ = jax.lax.scan(body, salt, None, length=K)
        return s

    fwd_j = jax.jit(fwd, static_argnums=3)

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
        salt = jnp.zeros((), jnp.float32)
        try:
            _ = float(fwd_j(params, low, salt, iters))  # compile + warm
            best = None
            for _rep in range(3):
                t0 = time.perf_counter()
                _ = float(fwd_j(params, low, salt, iters))
                dt = (time.perf_counter() - t0) / iters
                best = dt if best is None else min(best, dt)
            print(f"{spec or '(default)':60s} {B / best:8.1f} img/s "
                  f"({best * 1e3:.2f} ms/step)", flush=True)
        except Exception as e:  # keep measuring the other variants
            print(f"{spec or '(default)':60s} FAILED: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
