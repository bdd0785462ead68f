#!/bin/bash
# Round-5 chip queue, part 5: validate the new per-kind chunk defaults
# end-to-end, probe whether the keys chunk optimum keeps moving up
# (2^18/2^19), time the adaptive fast paths, and re-run the driver bench
# + public-API check under final defaults (also primes the compile cache
# for the driver's end-of-round run).
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

run r5e_chunk_keys_ext 4800 python tools/probes/chunk_keys_ext.py
run r5e_bench_defaults 1800 python bench.py
run r5e_adaptive_ab 3600 python tools/probes/adaptive_ab.py
run r5e_api_check 900 python - <<'EOF'
import numpy as np, jax.numpy as jnp, vulkan_radix_sort_tpu as vrs
k = np.random.default_rng(0).integers(0, 2**32, size=1<<18, dtype=np.uint64).astype(np.uint32)
out = np.asarray(vrs.sort(jnp.asarray(k)))
assert np.array_equal(out, np.sort(k))
print("public API verified on", jnp.zeros(1).device)
EOF

echo "QUEUE5E DONE $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
