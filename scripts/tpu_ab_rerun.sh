#!/bin/bash
# Clean re-run of the A/B train-profile matrix (the first pass was
# contaminated by a concurrent verification run, and the rowexp variants
# failed before the VMEM-fit fallback landed).  Run with the chip idle.
set -u
OUT=${1:-/tmp/tpu_ab_r2}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name: $* (timeout ${t}s)" | tee -a "$OUT/summary.log"
  local t0=$SECONDS
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name: rc=$rc dt=$((SECONDS-t0))s" | tee -a "$OUT/summary.log"
  tail -8 "$OUT/$name.log" | sed 's/^/    /' >> "$OUT/summary.log"
  return $rc
}

run smoke 1800 python scripts/tpu_smoke.py
run profile_default 1200 python scripts/train_profile.py --batch 16 --parts full
run profile_rowexp 1200 env TULIP_TPU_ATTN_ROWEXP=1 \
  python scripts/train_profile.py --batch 16 --parts full
run profile_fusedfwd 1200 env TULIP_TPU_FUSED_TRAIN_FWD=1 \
  python scripts/train_profile.py --batch 16 --parts full
run profile_rowexp_fused 1200 env TULIP_TPU_ATTN_ROWEXP=1 TULIP_TPU_FUSED_TRAIN_FWD=1 \
  python scripts/train_profile.py --batch 16 --parts full
run profile_remat 1200 env TULIP_TPU_REMAT_BLOCKS=1 \
  python scripts/train_profile.py --batch 16 --parts full
run bench_train 2400 python bench.py --mode train --verbose
run eval_sweep 3600 python scripts/eval_bench.py --samples 32
run chamfer 1800 python scripts/bench_chamfer.py

echo "AB RERUN DONE" | tee -a "$OUT/summary.log"
