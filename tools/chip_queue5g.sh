#!/bin/bash
# Round-5 chip queue, part 7: re-run the adaptive A/B with the perturbed
# uniform chains (the first run's chained loop fed sorted output back in,
# so adaptive-on-uniform mis-measured as the fast path), then the final
# 32-step driver-fidelity sweep + plot under the shipped defaults.
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

run r5g_adaptive_ab 3600 python tools/probes/adaptive_ab.py
run r5g_sweep32 14000 python -m vulkan_radix_sort_tpu.bench network \
    --steps 32 --nonstable -o bench_results/network_v5e_r5.csv
run r5g_plot 600 python tools/plot_results.py \
    bench_results/network_v5e_r5.csv bench_results/xla_v5e_r4.csv \
    --output bench_results/results_v5e.png

echo "QUEUE5G DONE $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
