#!/bin/bash
# One-shot round-3 TPU measurement sweep (run when the axon relay is up,
# host otherwise idle). Appends results to bench_artifacts/r3_final.txt.
set -u
cd "$(dirname "$0")/.."
out=bench_artifacts/r3_final.txt
mkdir -p bench_artifacts
run() {
  echo "=== $* ===" | tee -a "$out"
  env "$@" timeout 1500 python bench.py 2>>"$out" | tee -a "$out"
}
date | tee -a "$out"
# 1. flagship default (windows + bf16 staging, committed defaults)
run PBTE_BENCH_CPP_ITERS=0
# 2. scan unroll A/B under the new defaults
run PBTE_BENCH_CPP_ITERS=0 PBTE_BENCH_UNROLL=2
# 3. high-arithmetic-intensity sweep-kernel row: p=3 (D=64, J=256), 16 dirs
run PBTE_BENCH_CPP_ITERS=0 PBTE_BENCH_ORDER=3 PBTE_BENCH_POLAR=2 \
    PBTE_BENCH_AZIMUTH=8 PBTE_BENCH_STEPS=6
date | tee -a "$out"
