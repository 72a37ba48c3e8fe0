"""On-TPU Pallas smoke check: pin the COMPILED (non-interpret) kernels
against their XLA twins on the real backend.

CI runs the kernels in interpret mode on CPU (tests/conftest.py), which pins
their numerics but never their Mosaic lowering; real-TPU mis-lowering has
bitten before (see the workarounds in ops/pallas/chamfer.py).  This script
closes that gap: run it whenever a chip is attached (bench runs, TPU-VM CI).
tests/test_tpu_smoke.py invokes it in a subprocess outside the forced-CPU
test env and skips cleanly when no TPU is present (exit code 2).

Checks (all vs XLA twins, on the real backend, bf16 like production):
  1. inference forward: attn_impl='pallas' (fused window_msa + ln_mlp + head
     kernels) vs 'grouped' vs 'xla' whole-model forwards
  2. training: loss + grads through the attn_core custom VJP vs grouped XLA
  3. chamfer: Pallas tiled NN sweep vs lax.scan impl
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        print("SMOKE_SKIP: no TPU backend (default_backend=cpu)")
        return 2
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    from tulip_tpu.config import model_config
    from tulip_tpu.models.tulip import apply_model, build_model, init_params

    IMG, TGT = (32, 512), (128, 512)   # full 4-stage geometry, fast compile
    rng = np.random.default_rng(0)
    low = jnp.asarray(np.log1p(rng.uniform(0, 1, (4, 1, *IMG))
                               ).astype(np.float32))
    high = jnp.asarray(np.log1p(rng.uniform(0, 1, (4, 1, *TGT))
                                ).astype(np.float32))

    def cfg_for(impl):
        return model_config("tulip_base", img_size=IMG, target_img_size=TGT,
                            patch_size=(1, 4), window_size=(2, 8),
                            pixel_shuffle=True, circular_padding=True,
                            log_transform=True, patch_unmerging=True,
                            attn_impl=impl)

    models = {impl: build_model(cfg_for(impl))
              for impl in ("xla", "grouped", "pallas")}
    params = init_params(jax.random.PRNGKey(0), cfg_for("xla"))

    # --- 1. inference forward, bf16 (production eval path) ----------------
    preds = {}
    for impl, model in models.items():
        fwd = jax.jit(lambda p, x, m=model: apply_model(
            p, m, x, None, mode="eval", mc_drop=True,
            compute_dtype=jnp.bfloat16))
        preds[impl] = np.asarray(fwd(params, low), dtype=np.float32)
    scale = float(np.abs(preds["xla"]).max())
    for impl in ("grouped", "pallas"):
        diff = float(np.abs(preds[impl] - preds["xla"]).max())
        # bf16 forward reassociation noise; pallas fuses LN+MSA+MLP in VMEM
        assert diff < 0.02 * max(scale, 1.0), (impl, diff, scale)
        print(f"SMOKE_OK forward[{impl} vs xla]: max|d|={diff:.3e} "
              f"(scale {scale:.3f})")

    # --- 1b. natural-layout fused MSA (TULIP_TPU_MSA_NAT=1): same fused
    # inference compute, tiles read from the row-strip layout (new Mosaic
    # lowering — in-kernel (wh, Gww) <-> (GL,) reshapes) ------------------
    os.environ["TULIP_TPU_MSA_NAT"] = "1"
    try:
        fwd_nat = jax.jit(lambda p, x, m=models["pallas"]: apply_model(
            p, m, x, None, mode="eval", mc_drop=True,
            compute_dtype=jnp.bfloat16))
        pred_nat = np.asarray(fwd_nat(params, low), dtype=np.float32)
        dn = float(np.abs(pred_nat - preds["xla"]).max())
        assert dn < 0.02 * max(scale, 1.0), (dn, scale)
        print(f"SMOKE_OK forward[msa_nat vs xla]: max|d|={dn:.3e}")
    finally:
        del os.environ["TULIP_TPU_MSA_NAT"]

    # --- 1c. frame-threaded halo path (r4 default) vs self-contained
    # rolls.  Bit-identical in interpret mode (tests/test_fused_infer_paths
    # pins that); on-chip the halo assembly changes Mosaic VREG layouts, so
    # fp32 accumulations round differently — measured 2026-08-20: 36% of
    # outputs differ, 0.006% beyond one bf16 ulp, max 5.9e-3 at scale 0.63
    # (inside the 7.8e-3 pallas-vs-xla envelope).  Assert a few-ulp bound.
    os.environ["TULIP_TPU_NO_HALO"] = "1"
    try:
        jax.clear_caches()   # env flag is trace-time
        fwd_nr = jax.jit(lambda p, x, m=models["pallas"]: apply_model(
            p, m, x, None, mode="eval", mc_drop=True,
            compute_dtype=jnp.bfloat16))
        pred_nr = np.asarray(fwd_nr(params, low), dtype=np.float32)
        dr = float(np.abs(pred_nr - preds["pallas"]).max())
        assert dr < 0.02 * max(scale, 1.0), (dr, scale)
        print(f"SMOKE_OK forward[halo vs rolls]: max|d|={dr:.3e}")
    finally:
        del os.environ["TULIP_TPU_NO_HALO"]
        jax.clear_caches()

    # --- 2. training path: attn_core custom VJP vs grouped XLA ------------
    losses, grads = {}, {}
    for impl in ("grouped", "pallas"):
        model = models[impl]

        def loss_fn(p, lo, hi, m=model):
            pred, total, _ = apply_model(p, m, lo, hi, mode="train",
                                         rng=jax.random.PRNGKey(7),
                                         compute_dtype=jnp.bfloat16)
            return total

        val, grad = jax.jit(jax.value_and_grad(loss_fn))(params, low, high)
        losses[impl] = float(val)
        grads[impl] = grad
    ld = abs(losses["pallas"] - losses["grouped"]) / max(
        abs(losses["grouped"]), 1e-6)
    assert ld < 0.01, (losses, ld)
    print(f"SMOKE_OK train loss[pallas vs grouped]: rel d={ld:.3e}")
    worst = (None, 0.0)
    for k in grads["grouped"]:
        a = np.asarray(grads["grouped"][k], np.float32)
        b = np.asarray(grads["pallas"][k], np.float32)
        # absolute floor 1e-5: relative-position-bias-table grads are
        # cancellation-dominated near-zero sums at init (max|g| ~ 1e-7 —
        # softmax-backward rows sum to zero), where bf16 reassociation
        # noise swamps any relative metric.  Mis-lowering means O(1)
        # garbage, which the floored metric still catches.
        s = max(float(np.abs(a).max()), 1e-5)
        d = float(np.abs(a - b).max()) / s
        if d > worst[1]:
            worst = (k, d)
    assert worst[1] < 0.10, worst
    print(f"SMOKE_OK train grads[pallas vs grouped]: worst rel "
          f"max|d|={worst[1]:.3e} ({worst[0]})")

    # --- 2c. Pallas LayerNorm custom VJP (the train path's layout anchor,
    # ops/pallas/ln.py) — pin fwd + grads compiled, standalone ------------
    from tulip_tpu.models import layers as Lx
    from tulip_tpu.ops.pallas.ln import layer_norm_vjp
    xln = jnp.asarray(rng.standard_normal((4096, 96)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    wln = jnp.asarray(1 + 0.1 * rng.standard_normal(96).astype(np.float32))
    bln = jnp.asarray(0.1 * rng.standard_normal(96).astype(np.float32))
    gln = jnp.asarray(rng.standard_normal((4096, 96)).astype(np.float32))

    def ln_ref(x, w, b):
        return Lx.layer_norm({"n.weight": w, "n.bias": b}, "n", x, 1e-6)

    def ln_new(x, w, b):
        return layer_norm_vjp(x, w.reshape(1, -1), b.reshape(1, -1), 1e-6)

    for nm, f in (("ref", ln_ref), ("pallas", ln_new)):
        def lo(x, w, b, f=f):
            return jnp.sum(f(x, w, b).astype(jnp.float32) * gln)
        val, gs = jax.jit(jax.value_and_grad(lo, argnums=(0, 1, 2)))(
            xln, wln, bln)
        if nm == "ref":
            ref_out = (float(val), [np.asarray(t, np.float32) for t in gs])
        else:
            dv = abs(float(val) - ref_out[0]) / max(abs(ref_out[0]), 1e-6)
            dg = max(float(np.abs(np.asarray(t, np.float32) - r).max())
                     / max(float(np.abs(r).max()), 1e-6)
                     for t, r in zip(gs, ref_out[1]))
            assert dv < 1e-2 and dg < 2e-2, (dv, dg)
            print(f"SMOKE_OK ln_vjp[pallas vs xla]: val rel d={dv:.3e}, "
                  f"worst grad rel max|d|={dg:.3e}")

    # --- 3. chamfer: Pallas tiled sweep vs lax.scan twin ------------------
    from tulip_tpu.ops.chamfer import min_sq_dists_xla
    from tulip_tpu.ops.pallas.chamfer import min_sq_dists_pallas
    a = jnp.asarray(rng.uniform(-40, 40, (8192, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-40, 40, (9000, 3)).astype(np.float32))
    bp = jnp.concatenate(
        [b, jnp.full((4096 * 3 - 9000, 3), 1e8, jnp.float32)], axis=0)
    d_ref = np.asarray(jax.jit(
        lambda x, y: min_sq_dists_xla(x, y, chunk=4096))(a, bp))
    d_pl = np.asarray(jax.jit(
        lambda x, y: min_sq_dists_pallas(x, y, chunk=4096))(a, bp))
    dd = float(np.abs(d_pl - d_ref).max())
    assert dd < 1e-3, dd   # fp32 expansion-form ulp bound at |x|~40 m
    print(f"SMOKE_OK chamfer[pallas vs xla]: max|d|={dd:.3e} m^2")

    # hierarchical variant: Morton sort + dynamic chunk indexing + pl.when
    # predication — the riskiest Mosaic surface in the repo, pin it compiled
    from tulip_tpu.ops.pallas.chamfer_h import min_sq_dists_pallas_h
    d_h = np.asarray(jax.jit(
        lambda x, y: min_sq_dists_pallas_h(x, y, chunk=1024))(a, bp))
    dh = float(np.abs(d_h - d_ref).max())
    assert dh < 2e-3, dh
    print(f"SMOKE_OK chamfer[pallas_h vs xla]: max|d|={dh:.3e} m^2")

    print("SMOKE_PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
