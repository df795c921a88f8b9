#!/bin/bash
# Round-4 final measurement pass: bf16-state flagship A/B, auto-policy
# full-K tet check, p=3 flagship MFU row. Shares the r4 flock.
set -u
cd "$(dirname "$0")/.."
exec 9>bench_artifacts/.r4lock
flock 9
out=bench_artifacts/r4c_sweep.txt
mkdir -p bench_artifacts
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" | tee -a "$out"
  env "$@" 2>>"$out" | tee -a "$out"
}
date | tee -a "$out"
# 1. bf16 STATE on the p=2 flagship (halves the v/ys HBM streams the
#    roofline identifies as dominant; r3 queued this but never measured)
run PBTE_BENCH_CPP_ITERS=0 PBTE_RING_STATE_BF16=1 timeout -k 30 1500 python bench.py
# 2. full-K tet with NO env overrides: the auto memory policy must
#    self-select bf16 state + donation and run at the W-minor rate
run PBTE_TET_POLAR=16 PBTE_TET_AZIMUTH=24 PBTE_TET_STEPS=10 \
    timeout -k 30 2400 python scripts/bench_tet.py
date | tee -a "$out"
