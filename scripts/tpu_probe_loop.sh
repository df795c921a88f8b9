#!/bin/bash
# Continuously probe the axon TPU relay and log state transitions to
# bench_artifacts/relay_status.log. Unlike tpu_watchdog.sh this never runs
# a sweep itself — it only records UP/DOWN so interactive work can check
# `tail -1 bench_artifacts/relay_status.log` cheaply.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts
log=bench_artifacts/relay_status.log
probe() {
  timeout -k 10 240 python - <<'EOF' >/dev/null 2>&1
import jax
import jax.numpy as jnp
x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
assert float(x[0, 0]) == 128.0
EOF
}
last=""
while true; do
  if probe; then state=UP; else state=DOWN; fi
  if [ "$state" != "$last" ]; then
    echo "$state $(date -u +%Y-%m-%dT%H:%M:%S)" >> "$log"
    last="$state"
  fi
  echo "$state $(date -u +%Y-%m-%dT%H:%M:%S)" > bench_artifacts/relay_now.txt
  sleep 180
done
