#!/bin/bash
# One-shot chip queue: run every chip-gated measurement left on the round-2
# ledger (docs/STATUS.md) in priority order, appending JSON/text results to
# bench_results/chip_queue.log. Designed to survive a tunnel that drops
# mid-run: each step is independent, timeout-guarded, and logged as it
# finishes, so a partial window still captures the head of the queue.
#
# Usage: bash tools/chip_queue.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-bench_results/chip_queue.log}"
mkdir -p bench_results

run() { # run <name> <timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG"
  timeout "$to" "$@" 2>&1 | tail -40 | tee -a "$LOG"
  # the measurement's own status, not tee's (124 = killed by timeout)
  echo "--- $name exit=${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

# 1. headline re-verify (bench.py median-of-3) — the driver metric
run bench 1200 python bench.py

# 2. indirect keys re-verify (~23 ms expected; was pending at outage)
run indirect 1200 python tools/round2_chip_check.py indirect

# 3. u64 KV timing at 2^25 (STATUS open problem 5; w4 kernels compile-heavy)
run u64kv 2400 python tools/round2_chip_check.py u64kv

# 4. transpose slope probe — decides the T-layout (open problem 3)
run t_slope 1200 python tools/probes/probe_transpose_slope.py

# 5. T-layout on-chip A/B (keys + kv), both lowerings
run t_keys_batched 1200 env VRS_TRANSPOSE=1 VRS_T_IMPL=batched \
    python tools/round2_chip_check.py keys
run t_keys_unrolled 1800 env VRS_TRANSPOSE=1 VRS_T_IMPL=unrolled \
    python tools/round2_chip_check.py keys

# 5b. T-layout stable KV (value moves on every sublane stage but each
#     move is cheap there; only worth it if 5's unrolled keys run won)
run t_kv_all_unrolled 2400 env VRS_TRANSPOSE=1 VRS_T_IMPL=unrolled \
    VRS_T_MODES=all python tools/round2_chip_check.py kv

# 6. KV auto-backend cutoff sweep (VERDICT #7)
run kv_cutoff 2400 python tools/probes/kv_cutoff.py

# 7. CE-chain floor artifact (RADIX_INVESTIGATION 3b.2)
run ce_floor 1200 python tools/probes/ce_floor.py

# 7b. CE formulation A/B (dependent hi-roll vs two independent rolls)
run ce_variants 1200 python tools/probes/ce_variants.py

# 7c. the same A/B on the SHIPPED keys engine (probe geometry != pipeline)
run ce_indep_keys 1200 env VRS_CE_IMPL=indep \
    python tools/round2_chip_check.py keys

# 7d. measured per-kernel attribution of the fused pipeline (profiler
#     XSpace decode — retires stage-count proration)
run prof_keys 1200 python tools/profile_fused.py keys 25
run prof_kv 1800 python tools/profile_fused.py kv 25

# 7e. slot-merge kernels on chip (SMEM gate Mosaic lowering has never
#     executed; the distributed pipeline auto-enables it) + the
#     single-chip merge-vs-full-resort A/B at the v5e-16 slot geometry
run merge_check 1800 python tools/probes/merge_chip_check.py 24

# 7f. stable KV above the packed threshold: MODE_STABLE on chip
#     (compile-heavy first run: new 2^26 size bucket)
run bign_stable 2400 python tools/probes/bign_stable_check.py

# 8. refreshed sweep curves with the round-2 engine (packed-lazy KV,
#    lo/hi lex CE) — keys + stable kv + kvns, 8 sizes (compile-heavy on
#    first run; the persistent cache amortizes reruns)
run sweep_r2 3600 python -m vulkan_radix_sort_tpu.bench network \
    --steps 8 --nonstable -o bench_results/network_v5e_r2.csv

echo "QUEUE DONE $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
