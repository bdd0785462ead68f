#!/bin/bash
# Round-3 window reordering of tools/chip_queue.sh: the tunnel has died
# four times before, so decision-critical steps run first (merge gate is
# multi-chip-deployment-blocking; CE impl / T-layout / KV cutoffs gate
# code decisions this round). Evidence-only steps (u64kv, bign_stable,
# profiler traces, refreshed sweep) run at the tail.
#
# bench + indirect already captured this window (chip_queue.log head).
set -u
cd "$(dirname "$0")/.."
LOG="${1:-bench_results/chip_queue.log}"
mkdir -p bench_results

run() { # run <name> <timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG"
  timeout "$to" "$@" 2>&1 | tail -40 | tee -a "$LOG"
  echo "--- $name exit=${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

# decision-critical
run merge_check 1800 python tools/probes/merge_chip_check.py 24
run ce_indep_keys 1200 env VRS_CE_IMPL=indep \
    python tools/round2_chip_check.py keys
run t_slope 900 python tools/probes/probe_transpose_slope.py
run t_keys_unrolled 1500 env VRS_TRANSPOSE=1 VRS_T_IMPL=unrolled \
    python tools/round2_chip_check.py keys
run kv_cutoff 2400 python tools/probes/kv_cutoff.py

# secondary levers / probes
run ce_variants 1200 python tools/probes/ce_variants.py
run ce_floor 900 python tools/probes/ce_floor.py
run t_keys_batched 1200 env VRS_TRANSPOSE=1 VRS_T_IMPL=batched \
    python tools/round2_chip_check.py keys
run t_kv_all_unrolled 2400 env VRS_TRANSPOSE=1 VRS_T_IMPL=unrolled \
    VRS_T_MODES=all python tools/round2_chip_check.py kv

# evidence-only tail
run u64kv 2400 python tools/round2_chip_check.py u64kv
run bign_stable 2400 python tools/probes/bign_stable_check.py
run prof_keys 1200 python tools/profile_fused.py keys 25
run prof_kv 1800 python tools/profile_fused.py kv 25
run sweep_r2 3600 python -m vulkan_radix_sort_tpu.bench network \
    --steps 8 --nonstable -o bench_results/network_v5e_r2.csv

echo "QUEUE2 DONE $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
