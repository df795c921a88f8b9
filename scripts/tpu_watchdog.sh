#!/bin/bash
# Probe the axon TPU relay until it answers, then run the round-3 final
# measurement sweep (scripts/bench_r3_final.sh) exactly once.
#
# Why: the relay has outage windows of 0.5-9 h where ANY jax device access
# HANGS (never errors). This loop probes with a hard timeout in a throwaway
# subprocess (the hang cannot be recovered in-process) and launches the
# sweep only when a real matmul round-trips. Detach with:
#   nohup bash scripts/tpu_watchdog.sh > bench_artifacts/watchdog.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts
probe() {
  # -k: a probe hung in device init ignores SIGTERM (stuck in a C call) —
  # without the follow-up SIGKILL every probe leaks a live process
  timeout -k 10 240 python - <<'EOF'
import jax
import jax.numpy as jnp
x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
assert float(x[0, 0]) == 128.0
print("relay up:", jax.devices()[0])
EOF
}
n=0
while true; do
  n=$((n + 1))
  echo "[watchdog] probe #$n $(date -u +%H:%M:%S)"
  if probe; then
    echo "[watchdog] relay is up — starting the sweep $(date -u +%H:%M:%S)"
    bash scripts/bench_r3_final.sh
    echo "[watchdog] sweep done $(date -u +%H:%M:%S)"
    exit 0
  fi
  sleep 240
done
