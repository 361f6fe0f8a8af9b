#!/usr/bin/env bash
# Round-4 evidence regeneration (VERDICT r3 next #3/#4/#5/#7).
# Sequential on purpose: one chip, and concurrent TPU processes
# serialize. Run from the repo root with NOTHING else using the chip.
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts

run() {  # run <logfile> <cmd...>
  local log="artifacts/$1"; shift
  echo "=== $(date -u +%FT%TZ) :: $* ===" | tee -a "$log"
  timeout 5400 "$@" 2>&1 | tee -a "$log"
  echo "=== exit $? ===" | tee -a "$log"
}

# 1. transfer paths + overlap verdict
run transfer_r4.log python tools/probe_transfer.py --mb 32 --reps 5

# 2. train-step transfer modes (b2 bf16): pure compute, then the
#    three host-transfer shapes
run bench_train_transfer_r4.log python bench_train.py --batch 2 \
    --dtype bf16 --steps 12 --reps 2 --device-inputs
run bench_train_transfer_r4.log python bench_train.py --batch 2 \
    --dtype bf16 --steps 12 --reps 2 --transfer-mode serial
run bench_train_transfer_r4.log python bench_train.py --batch 2 \
    --dtype bf16 --steps 12 --reps 2 --transfer-mode inline
run bench_train_transfer_r4.log python bench_train.py --batch 2 \
    --dtype bf16 --steps 12 --reps 2 --transfer-mode prefetch

# 3. split-vs-fused A/B (compile time printed by the warmup line);
#    b8 with bounded in-flight queue
run split_vs_fused_r4.log python bench_train.py --batch 2 \
    --dtype bf16 --steps 12 --reps 2 --device-inputs
run split_vs_fused_r4.log python bench_train.py --batch 2 \
    --dtype bf16 --steps 12 --reps 2 --device-inputs --fused
run split_vs_fused_r4.log python bench_train.py --batch 8 \
    --dtype bf16 --steps 8 --reps 2 --device-inputs --max-inflight 3
run split_vs_fused_r4.log python bench_train.py --batch 8 \
    --dtype bf16 --steps 8 --reps 2 --device-inputs --max-inflight 3 \
    --fused

# 4. roofline decomposition + its machine constants
run roofline_r4.log python tools/probe_roofline.py --batch 2 --steps 8
run op_overhead_r4.log python tools/op_overhead_probe.py
run matmul_ceiling_r4.log python tools/matmul_ceiling_probe.py

echo "ALL PROBES DONE $(date -u +%FT%TZ)"
