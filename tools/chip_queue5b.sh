#!/bin/bash
# Round-5 chip queue, part 2: re-verify everything under the NEW defaults
# (VRS_CE_IMPL=indep for keys, VRS_DMA_GATE=1 for the slot merge), capture
# the shipped-config merge numbers (prearranged + DMA gate combined), and
# refresh the 32-step driver-fidelity sweep + plot so the committed curve
# artifacts match the shipped engine.
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

run r5b_bench_defaults 1800 python bench.py
run r5b_prearranged_dmagate 2400 python tools/probes/prearranged_ab.py
run r5b_kv_check 1800 python tools/round2_chip_check.py kv
run r5b_merge_defaults 2400 python tools/probes/merge_chip_check.py 24
run r5b_sweep32 14000 python -m vulkan_radix_sort_tpu.bench network \
    --steps 32 --nonstable -o bench_results/network_v5e_r5.csv
run r5b_plot 600 python tools/plot_results.py \
    bench_results/network_v5e_r5.csv bench_results/xla_v5e_r4.csv \
    --output bench_results/results_v5e.png

echo "QUEUE5B DONE $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
