#!/bin/bash
# Round-4 chip queue (remaining items after the in-window work landed):
# the split-design A/B (VERDICT #3), the big-n re-time under the new
# T_MODES=all default, and the full-breadth sweep + competitor curves for
# the refreshed plot artifact (VERDICT #8). Each step is independently
# resumable — the persistent compile cache accumulates across runs.
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

run r4_split_ab 3600 python tools/probes/split_ab.py
run r4_bign_defaults 2400 python tools/probes/bign_stable_check.py
# manual-DMA fill gating A/B (docs/SCALING_PROJECTION.md round-4 lever):
# same probe, gate off vs on — flip the VRS_DMA_GATE default if verified
# AND faster
run r4_merge_base 2400 python tools/probes/merge_chip_check.py 24
run r4_merge_dmagate 2400 env VRS_DMA_GATE=1 \
    python tools/probes/merge_chip_check.py 24
# full-breadth sweep at driver fidelity (VERDICT #8): 32 steps, all three
# kinds, pure defaults — the analog of the reference's media/results.png
run r4_sweep32 14000 python -m vulkan_radix_sort_tpu.bench network \
    --steps 32 --nonstable -o bench_results/network_v5e_r4.csv
# competitor curve for the plot (XLA on the same chip, coarser steps)
run r4_sweep_xla 7000 python -m vulkan_radix_sort_tpu.bench xla \
    --steps 8 --nonstable -o bench_results/xla_v5e_r4.csv
run r4_plot 600 python tools/plot_results.py \
    bench_results/network_v5e_r4.csv bench_results/xla_v5e_r4.csv \
    --output bench_results/results_v5e.png

echo "QUEUE4 DONE $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
