#!/bin/bash
# Probe the relay, then run bench_r4b.sh once per relay-up window until its
# key artifacts exist.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts
probe() {
  timeout -k 10 240 python - <<'PYEOF'
import jax
import jax.numpy as jnp
x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
assert float(x[0, 0]) == 128.0
print("relay up:", jax.devices()[0])
PYEOF
}
n=0
while true; do
  n=$((n + 1))
  echo "[watchdog-r4b] probe #$n $(date -u +%H:%M:%S)"
  if probe; then
    echo "[watchdog-r4b] relay up — sweep pass $(date -u +%H:%M:%S)"
    bash scripts/bench_r4b.sh
    ok=1
    for f in bench_artifacts/roofline_flagship.json \
             bench_artifacts/converge_flagship_high.json \
             bench_artifacts/converge_flagship_selective.json; do
      [ -f "$f" ] || { echo "[watchdog-r4b] missing $f"; ok=0; }
    done
    if [ "$ok" = 1 ]; then
      if [ -f bench_artifacts/converge_flagship_highest_bicgstab.json ] || \
         [ -f bench_artifacts/converge_flagship_highest_bicgstab_nx12.json ]; then
        echo "[watchdog-r4b] all key artifacts present — done"
        exit 0
      fi
    fi
  fi
  sleep 240
done
