#!/bin/bash
# Third ordering of the round-3 chip window: t_keys_unrolled measured the
# T layout at 14.53 ms vs 24.18 (1.66x) — before flipping the default on,
# chip-verify the OTHER no-ride modes it would turn on (pairs/kvns, w3)
# and A/B the CE formulation under the T layout. Then resume the deferred
# evidence steps (kv_cutoff, u64kv timing, bign_stable, sweep).
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

# gate the default flip: every no-ride mode under the T layout + CE combo
run t_kvns_unrolled 1500 env VRS_TRANSPOSE=1 VRS_T_IMPL=unrolled \
    python tools/round2_chip_check.py kvns
run t_ce_combo 1200 env VRS_TRANSPOSE=1 VRS_T_IMPL=unrolled \
    VRS_CE_IMPL=indep python tools/round2_chip_check.py keys
run t_u64kv_unrolled 2400 env VRS_TRANSPOSE=1 VRS_T_IMPL=unrolled \
    python tools/round2_chip_check.py u64kv
run t_kv_unrolled 2400 env VRS_TRANSPOSE=1 VRS_T_IMPL=unrolled \
    python tools/round2_chip_check.py kv
run t_kv_all_unrolled 2400 env VRS_TRANSPOSE=1 VRS_T_IMPL=unrolled \
    VRS_T_MODES=all python tools/round2_chip_check.py kv

# deferred decision + evidence steps
run kv_cutoff 2400 env VRS_TRANSPOSE=1 VRS_T_IMPL=unrolled \
    python tools/probes/kv_cutoff.py
run ce_variants 1200 python tools/probes/ce_variants.py
run ce_floor 900 python tools/probes/ce_floor.py
run bign_stable 2400 python tools/probes/bign_stable_check.py
run prof_keys 1200 env VRS_TRANSPOSE=1 VRS_T_IMPL=unrolled \
    python tools/profile_fused.py keys 25
run sweep_r3 3600 env VRS_TRANSPOSE=1 VRS_T_IMPL=unrolled \
    python -m vulkan_radix_sort_tpu.bench network \
    --steps 8 --nonstable -o bench_results/network_v5e_r3.csv

echo "QUEUE3 DONE $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
