#!/bin/bash
# Round-5 chip queue, part 8 (after the 5g sweep): re-measure the adaptive
# degenerate paths post identity-copy fix, spot-check u64 adaptive on
# chip, and close the round with a final driver bench under the shipped
# defaults.
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

run r5h_adaptive_degenerate2 2400 python tools/probes/adaptive_degenerate2.py
run r5h_bench_final 1800 python bench.py

echo "QUEUE5H DONE $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
