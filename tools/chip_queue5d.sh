#!/bin/bash
# Round-5 chip queue, part 4: A/B the multi-word indep CE (VRS_CE_MULTI)
# on the three carry paths it touches (stable kv, kvns, u64 stable kv) —
# each invocation bitwise-verifies before timing — then run the chunk-size
# re-sweep that lost its window in part 3 (queue5c).
set -u
cd "$(dirname "$0")/.."
LOG="${1:-bench_results/chip_queue.log}"
mkdir -p bench_results

run() { # run <name> <timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG"
  timeout "$to" "$@" 2>&1 | tail -20 | tee -a "$LOG"
  echo "--- $name exit=${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

run r5d_ce_multi_dep_kv 2400 env VRS_CE_MULTI=dep python tools/round2_chip_check.py kv
run r5d_ce_multi_indep_kv 2400 env VRS_CE_MULTI=indep python tools/round2_chip_check.py kv
run r5d_ce_multi_dep_kvns 2400 env VRS_CE_MULTI=dep python tools/round2_chip_check.py kvns
run r5d_ce_multi_indep_kvns 2400 env VRS_CE_MULTI=indep python tools/round2_chip_check.py kvns
run r5d_ce_multi_dep_u64kv 3600 env VRS_CE_MULTI=dep python tools/round2_chip_check.py u64kv
run r5d_ce_multi_indep_u64kv 3600 env VRS_CE_MULTI=indep python tools/round2_chip_check.py u64kv
run r5d_chunk_ab 7200 python tools/probes/chunk_ab.py

echo "QUEUE5D DONE $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
