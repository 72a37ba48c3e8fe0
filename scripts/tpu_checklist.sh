#!/bin/bash
# Ordered measurement plan for the moment the TPU tunnel is back
# (round-2 perf items: VERDICT.md #3 train throughput, #10 e2e IO numbers).
# Every step logs under $OUT and failures don't stop later steps.
set -u
OUT=${1:-/tmp/tpu_results_r2}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name: $* (timeout ${t}s)" | tee -a "$OUT/summary.log"
  local t0=$SECONDS
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name: rc=$rc dt=$((SECONDS-t0))s" | tee -a "$OUT/summary.log"
  tail -25 "$OUT/$name.log" | sed 's/^/    /' >> "$OUT/summary.log"
  return $rc
}

# 1. pin compiled Pallas kernels vs XLA twins (incl. new fwd-fused mode)
run smoke 1200 python scripts/tpu_smoke.py

# 2. component profile, default path
run profile_default 1200 python scripts/train_profile.py --batch 16

# 3. per-op trace breakdown (train + the graded inference path)
run trace 1200 python scripts/trace_breakdown.py --batch 16
run trace_infer 1200 python scripts/trace_breakdown.py --batch 16 --mode eval

# 4. A/B flags
run profile_fusedfwd 1200 env TULIP_TPU_FUSED_TRAIN_FWD=1 \
  python scripts/train_profile.py --batch 16 --parts full
run profile_remat 1200 env TULIP_TPU_REMAT_BLOCKS=1 \
  python scripts/train_profile.py --batch 16 --parts full
run profile_mlpxla 1200 env TULIP_TPU_MLP_XLA_BWD=1 \
  python scripts/train_profile.py --batch 16 --parts full
run profile_fused_remat 1200 env TULIP_TPU_FUSED_TRAIN_FWD=1 TULIP_TPU_REMAT_BLOCKS=1 \
  python scripts/train_profile.py --batch 16 --parts full
run profile_rowexp 1200 env TULIP_TPU_ATTN_ROWEXP=1 \
  python scripts/train_profile.py --batch 16 --parts full,attn
run profile_rowexp_fused 1200 env TULIP_TPU_ATTN_ROWEXP=1 TULIP_TPU_FUSED_TRAIN_FWD=1 \
  python scripts/train_profile.py --batch 16 --parts full

# 5. headline numbers (batch sweep)
run bench_train 2400 python bench.py --mode train --verbose
run bench_infer 2400 python bench.py --verbose
run bench_infer_nat 2400 env TULIP_TPU_MSA_NAT=1 python bench.py --verbose

# 6. e2e with real file IO (VERDICT item 10)
run e2e_io 2400 python scripts/e2e_io_bench.py --frames 256 --batch 16

# 7. eval / MC-dropout sweep throughput (VERDICT item 5)
run eval_sweep 3600 python scripts/eval_bench.py --samples 32

# 8. chamfer kernels (brute vs hierarchical, scene + uniform clouds)
run chamfer 1800 python scripts/bench_chamfer.py

echo "CHECKLIST DONE" | tee -a "$OUT/summary.log"
