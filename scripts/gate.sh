#!/bin/bash
# Pre-commit gate: run before EVERY commit that touches tulip_tpu/.
#
# Two checks, both of which would have blocked the round-3 end-of-round
# snapshot (a trace-time NameError in the default MSA kernel shipped with
# bench 0.0 and 3 red fast-lane tests):
#   1. flagship import-and-trace: jit-lower the graded inference config —
#      catches trace-time breakage (bad kernel signatures, shape bugs) in
#      seconds, without a slow CPU full compile;
#   2. the fast test lane (pytest default marker set).
# Prints GATE_PASS and exits 0 only if both are green.
set -e
cd "$(dirname "$0")/.."

echo "=== gate 1/2: flagship import-and-trace"
JAX_PLATFORMS=cpu python - <<'EOF'
import jax
import jax.numpy as jnp

from tulip_tpu.config import model_config
from tulip_tpu.models.tulip import apply_model, build_model, init_params

cfg = model_config("tulip_base", img_size=(32, 2048),
                   target_img_size=(128, 2048), patch_size=(1, 4),
                   window_size=(2, 8), pixel_shuffle=True,
                   circular_padding=True, log_transform=True,
                   patch_unmerging=True, attn_impl="pallas")
model = build_model(cfg)
params = init_params(jax.random.PRNGKey(0), cfg)
lo = jnp.zeros((2, 1, *cfg.img_size), jnp.float32)


def fwd(p, x):
    return apply_model(p, model, x, None, mode="eval", mc_drop=True,
                       compute_dtype=jnp.bfloat16)


jax.jit(fwd).lower(params, lo)   # trace + lower only: fast, catches bugs
print("GATE: flagship trace OK")
EOF

echo "=== gate 2/2: fast test lane"
python -m pytest tests/ -q -x

echo "GATE_PASS"
