#!/bin/bash
# Round-4 queue, part B — steps added after the running queue instance
# buffered its script (bash reads small scripts whole at start), plus the
# split_ab rerun that resumes from the persistent compile cache.
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

run r4_split_ab_resume 3600 python tools/probes/split_ab.py
# manual-DMA fill gating A/B (docs/SCALING_PROJECTION.md round-4 lever)
run r4_merge_base 2400 python tools/probes/merge_chip_check.py 24
run r4_merge_dmagate 2400 env VRS_DMA_GATE=1 \
    python tools/probes/merge_chip_check.py 24

echo "QUEUE4B DONE $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
