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
# 3. Krylov at exact precision on the largest hex shape whose ~8 BiCGStab
#    state trees fit one chip (nx=10: 0.87 GB/tree; 16^3 and 12^3 both
#    RESOURCE_EXHAUSTED — recorded in r4b_sweep) + the plain-highest
#    comparison at the same shape
run PBTE_CONV_NX=10 PBTE_CONV_ACCEL=bicgstab PBTE_CONV_PRECISION=highest \
    PBTE_CONV_TOL=1e-7 PBTE_CONV_PROBE=1e-7 PBTE_CONV_MAXIT=900 \
    timeout -k 30 3600 python scripts/converge_flagship.py
run PBTE_CONV_NX=10 PBTE_CONV_PRECISION=highest PBTE_CONV_TOL=1e-7 \
    PBTE_CONV_PROBE=1e-7 PBTE_CONV_MAXIT=2500 \
    timeout -k 30 3600 python scripts/converge_flagship.py
# 4. selective-v2 re-measure (closure einsums now exact too) + refreshed
#    field-bias table
run PBTE_CONV_PRECISION=selective PBTE_CONV_TOL=1e-7 PBTE_CONV_PROBE=1e-7 \
    PBTE_CONV_MAXIT=2500 timeout -k 30 3600 python scripts/converge_flagship.py
echo "=== field-bias table (v2) ===" | tee -a "$out"
timeout -k 30 600 python bench_artifacts/compare_fields.py 2>>"$out" | tee -a "$out" || true
date | tee -a "$out"
# 5. PRECISION POLISH recipe: default converge + 300 exact iterations —
#    targets <=1e-3 field bias at ~1.2-2x the default solve cost
run PBTE_CONV_POLISH=300 PBTE_CONV_TOL=1e-7 PBTE_CONV_PROBE=1e-7 \
    PBTE_CONV_MAXIT=1200 timeout -k 30 3600 python scripts/converge_flagship.py
echo "=== polish field bias ===" | tee -a "$out"
timeout -k 30 300 python - <<'PYEOF' 2>>"$out" | tee -a "$out"
import numpy as np
a = np.load("bench_artifacts/converge_flagship_default_polish300.npz")["Tc"]
b = np.load("bench_artifacts/converge_flagship_highest.npz")["Tc"]
print("polish300 vs highest: rel_l2",
      np.linalg.norm(a - b) / np.linalg.norm(b),
      "rel_max", np.abs(a - b).max() / np.abs(b).max())
PYEOF
date | tee -a "$out"
# 6. polish + Aitken extrapolation of the quasi-neutral mode (the plain
#    300-step polish removed <5% of the bias — r4c row above)
run PBTE_CONV_POLISH=60 PBTE_CONV_POLISH_EXTRAP=1 PBTE_CONV_TOL=1e-7 \
    PBTE_CONV_PROBE=1e-7 PBTE_CONV_MAXIT=1200 \
    timeout -k 30 3600 python scripts/converge_flagship.py
echo "=== polish-extrap field bias ===" | tee -a "$out"
timeout -k 30 300 python - <<'PYEOF' 2>>"$out" | tee -a "$out"
import numpy as np
a = np.load("bench_artifacts/converge_flagship_default_polish60.npz")["Tc"]
b = np.load("bench_artifacts/converge_flagship_highest.npz")["Tc"]
print("polish60+extrap vs highest: rel_l2",
      np.linalg.norm(a - b) / np.linalg.norm(b),
      "rel_max", np.abs(a - b).max() / np.abs(b).max())
PYEOF
date | tee -a "$out"
