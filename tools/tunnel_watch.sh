#!/bin/bash
# Watch for a TPU tunnel window; when a probe succeeds, fire the chip queue.
# The probe is a short-lived full-stack check (import + devices + one op)
# so a half-up tunnel (imports hang) doesn't trigger a doomed queue run.
#
# Usage: bash tools/tunnel_watch.sh [queue_script] [probe_interval_s]
set -u
cd "$(dirname "$0")/.."
QUEUE="${1:-tools/chip_queue.sh}"
INTERVAL="${2:-240}"
LOG=bench_results/tunnel_watch.log
mkdir -p bench_results

probe() {
  timeout 150 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert jax.devices()[0].platform == "tpu"
y = jax.jit(lambda a: a + 1)(jnp.arange(1024, dtype=jnp.uint32))
y.block_until_ready()
EOF
}

echo "watch start $(date -u +%H:%M:%SZ) interval=${INTERVAL}s" >> "$LOG"
while true; do
  if probe; then
    echo "tunnel UP $(date -u +%H:%M:%SZ) — running $QUEUE" >> "$LOG"
    bash "$QUEUE" >> "$LOG" 2>&1
    echo "queue finished $(date -u +%H:%M:%SZ)" >> "$LOG"
    exit 0
  fi
  echo "tunnel down $(date -u +%H:%M:%SZ)" >> "$LOG"
  sleep "$INTERVAL"
done
