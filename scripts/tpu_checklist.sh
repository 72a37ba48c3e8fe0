#!/bin/bash
# Standing on-chip measurement plan: run whenever kernels or the train/eval
# paths change, and once per round so BASELINE.md numbers stay current.
# Every step logs under $OUT and failures don't stop later steps.
# (The round-2/3 A/B matrix lived here; measured losers — fwd-fused train
# half-block, the MLP XLA-backward revert flag — were deleted from the
# codebase after losing, so the matrix below only carries live knobs.)
set -u
OUT=${1:-/tmp/tpu_results}
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

# 1. pin compiled Pallas kernels vs XLA twins (Mosaic lowering, real chip).
# HARD GATE: nothing below (especially the graded bench) runs unless the
# smoke printed SMOKE_PASS — a Mosaic-lowering regression must fail loudly
# here, not be laundered into a bench number.
run smoke 1200 python scripts/tpu_smoke.py
if ! grep -q SMOKE_PASS "$OUT/smoke.log"; then
  echo "FATAL: tpu_smoke.py did not print SMOKE_PASS — aborting checklist" \
    | tee -a "$OUT/summary.log"
  exit 1
fi

# 2. component profile, default path
run profile_default 1200 python scripts/train_profile.py --batch 16

# 3. per-op trace breakdown (train + the graded inference path)
run trace 1200 python scripts/trace_breakdown.py --batch 16
run trace_infer 1200 python scripts/trace_breakdown.py --batch 16 --mode eval

# 4. live A/B knobs (wash-or-situational variants kept after measurement)
run profile_remat 1200 env TULIP_TPU_REMAT_BLOCKS=1 \
  python scripts/train_profile.py --batch 16 --parts full

# 5. headline numbers (batch sweep; bench.py autotunes the live variants)
run bench_train 2400 python bench.py --mode train --verbose
run bench_infer 2400 python bench.py --verbose

# 6. e2e with real file IO
run e2e_io 2400 python scripts/e2e_io_bench.py --frames 256 --batch 16

# 7. eval / MC-dropout sweep throughput (graded configs #4/#5)
run eval_sweep 3600 python scripts/eval_bench.py --samples 32

# 8. chamfer kernels (brute vs hierarchical, scene + uniform clouds)
run chamfer 1800 python scripts/bench_chamfer.py

echo "CHECKLIST DONE" | tee -a "$OUT/summary.log"
