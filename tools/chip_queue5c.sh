#!/bin/bash
# Round-5 chip queue, part 3 (after the 5b sweep): price the sender-side
# flip's XLA lowering (the one cost the prearranged exchange added), and
# re-sweep the chunk size under the round-5 defaults (T + indep CE — the
# 2^16 optimum dates from the pre-T engine).
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

run r5c_flip_cost 1200 python tools/probes/flip_cost.py 23
run r5c_chunk_ab 7200 python tools/probes/chunk_ab.py

echo "QUEUE5C DONE $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
