#!/bin/bash
# Round-5 chip queue: (1) re-verify the driver contract under current
# defaults, (2) keys CE-formulation A/B under the T layout (the indep
# variant won by ~5% in the N layout and its per-stage probe slopes win
# on BOTH axes — it was never A/B'd end-to-end under T), (3) the
# double-buffered manual-DMA fill gate vs the BlockSpec auto-pipeline
# (round-4's serial variant lost 5.67 vs 5.37 ms; this variant prefetches
# the next live block during compute), (4) the sender-side odd-slot
# reversal saving on the slot merge (single-chip proxy for the
# distributed re-sort). Each step is independently resumable — the
# persistent compile cache accumulates across runs.
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

run r5_bench_defaults 1200 python bench.py
run r5_keys_ce_indep 1800 env VRS_CE_IMPL=indep \
    python tools/round2_chip_check.py keys
run r5_merge_base 2400 python tools/probes/merge_chip_check.py 24
run r5_merge_dmagate2 2400 env VRS_DMA_GATE=1 \
    python tools/probes/merge_chip_check.py 24
run r5_prearranged_ab 2400 python tools/probes/prearranged_ab.py

echo "QUEUE5 DONE $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
