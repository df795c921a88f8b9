#!/bin/bash
# Round-4 TPU measurement sweep (run when the axon relay is up). Appends to
# bench_artifacts/r4_sweep.txt; individual scripts write their own JSON
# artifacts. Ordered by value so a short relay window still lands the
# headline rows.
set -u
# single-instance guard: concurrent sweeps would contend for the one chip
exec 9>bench_artifacts/.r4lock 2>/dev/null || true
flock -n 9 || { echo "[bench_r4] another sweep is running"; exit 0; }
cd "$(dirname "$0")/.."
out=bench_artifacts/r4_sweep.txt
mkdir -p bench_artifacts
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" | tee -a "$out"
  env "$@" 2>>"$out" | tee -a "$out"
}
date | tee -a "$out"
# 1. FULL legacy production tet config to convergence (VERDICT item 1:
#    the one documented reference workload the framework could not run)
run timeout -k 30 3000 python scripts/converge_tet.py
# 2. tet bench rows for BASELINE.md: the 96-dir subset (honest re-record)
#    and the full 16x24 step-rate row
run PBTE_TET_STEPS=10 timeout -k 30 1500 python scripts/bench_tet.py
run PBTE_TET_POLAR=16 PBTE_TET_AZIMUTH=24 PBTE_TET_STEPS=10 \
    PBTE_RING_STATE_BF16=1 PBTE_RING_DONATE=1 \
    timeout -k 30 2400 python scripts/bench_tet.py
# 3. flagship hex bench + compile-time row (VERDICT item 4: 284 s
#    compile+first-step regression — bench.py prints it)
run PBTE_BENCH_CPP_ITERS=0 timeout -k 30 1500 python bench.py
# 4. kernel-level MFU artifacts (VERDICT item 2)
for m in staged pure; do
  for o in 2 3; do
    run PBTE_KMFU_MODE=$m PBTE_KMFU_ORDER=$o timeout -k 30 900 \
        python scripts/bench_kernel_mfu.py
  done
done
# 5. Krylov on the TPU flagship at exact matmul precision (VERDICT item 3:
#    default-precision bicgstab diverged; highest is affine to f32
#    rounding and plain-highest needs 1490 iters)
run PBTE_CONV_ACCEL=bicgstab PBTE_CONV_PRECISION=highest \
    PBTE_CONV_TOL=1e-7 PBTE_CONV_PROBE=1e-7 PBTE_CONV_MAXIT=700 \
    timeout -k 30 3600 python scripts/converge_flagship.py
date | tee -a "$out"
