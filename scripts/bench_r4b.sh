#!/bin/bash
# Round-4 follow-up sweep: precision tiers, Krylov retry/fallback, p=3
# flagship row, unroll A/B, supercell fold A/B. Run after bench_r4.sh
# (shares its flock so the two never overlap).
set -u
cd "$(dirname "$0")/.."
exec 9>bench_artifacts/.r4lock
flock 9
out=bench_artifacts/r4b_sweep.txt
mkdir -p bench_artifacts
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" | tee -a "$out"
  env "$@" 2>>"$out" | tee -a "$out"
}
date | tee -a "$out"
# 0. full-resolution tet convergence RERUN on the WD layout (D' on lanes:
#    f32 state fits without bf16/donation; factor matmul ~94% lane fill
#    vs 20% W-minor) — refreshes tet_fullres.json
run timeout -k 30 3000 python scripts/converge_tet.py
run PBTE_TET_POLAR=16 PBTE_TET_AZIMUTH=24 PBTE_TET_STEPS=10 \
    timeout -k 30 2400 python scripts/bench_tet.py
run PBTE_TET_STEPS=10 timeout -k 30 1500 python scripts/bench_tet.py
# 0b. WD vs W-minor A/B at the 96-dir subset
run PBTE_TET_STEPS=10 PBTE_SUPER_WD=0 timeout -k 30 1500 python scripts/bench_tet.py
# 1. Krylov retry in isolation (the in-sweep row hit RESOURCE_EXHAUSTED
#    right after the 12 GB full-K tet job — suspected relay memory carry)
run PBTE_CONV_ACCEL=bicgstab PBTE_CONV_PRECISION=highest \
    PBTE_CONV_TOL=1e-7 PBTE_CONV_PROBE=1e-7 PBTE_CONV_MAXIT=700 \
    timeout -k 30 3600 python scripts/converge_flagship.py
# 1b. fallback shape if 16^3 genuinely cannot hold ~8 BiCGStab state
#     copies: same physics at 12^3
if [ ! -f bench_artifacts/converge_flagship_highest_bicgstab.json ]; then
  run PBTE_CONV_NX=12 PBTE_CONV_ACCEL=bicgstab PBTE_CONV_PRECISION=highest \
      PBTE_CONV_TOL=1e-7 PBTE_CONV_PROBE=1e-7 PBTE_CONV_MAXIT=700 \
      timeout -k 30 3600 python scripts/converge_flagship.py
  run PBTE_CONV_NX=12 PBTE_CONV_PRECISION=highest PBTE_CONV_TOL=1e-7 \
      PBTE_CONV_PROBE=1e-7 PBTE_CONV_MAXIT=2500 \
      timeout -k 30 3600 python scripts/converge_flagship.py
fi
# 2. precision tiers on the flagship: global bf16x3 ("high") and the
#    selective transport-exact mode; field bias vs the committed highest npz
run PBTE_CONV_PRECISION=high PBTE_CONV_TOL=1e-7 PBTE_CONV_PROBE=1e-7 \
    PBTE_CONV_MAXIT=2500 timeout -k 30 3600 python scripts/converge_flagship.py
run PBTE_CONV_PRECISION=selective PBTE_CONV_TOL=1e-7 PBTE_CONV_PROBE=1e-7 \
    PBTE_CONV_MAXIT=2500 timeout -k 30 3600 python scripts/converge_flagship.py
echo "=== field-bias table ===" | tee -a "$out"
timeout -k 30 600 python bench_artifacts/compare_fields.py 2>>"$out" | tee -a "$out" || true
# 3. p=3 flagship row (the reference's production order; the p=2 kernel is
#    MXU shape-limited — BASELINE.md r4 kernel rows)
run PBTE_BENCH_CPP_ITERS=0 PBTE_BENCH_ORDER=3 PBTE_BENCH_POLAR=2 \
    PBTE_BENCH_AZIMUTH=8 PBTE_BENCH_STEPS=6 timeout -k 30 2400 python bench.py
# 4. scan-unroll A/B on the flagship (unroll=2 may keep the carry in
#    registers across the fused pair — the level-pair fusion lever)
run PBTE_BENCH_CPP_ITERS=0 PBTE_BENCH_UNROLL=2 timeout -k 30 1500 python bench.py
# 5. supercell fold A/B at the 96-dir subset (two-matmul default vs the
#    dense folded bcat)
run PBTE_TET_STEPS=10 PBTE_SUPER_FOLD=1 timeout -k 30 1500 python scripts/bench_tet.py
# 6. HBM roofline of the flagship step (VERDICT item 2 alternative bar)
run timeout -k 30 1800 python scripts/roofline_flagship.py
date | tee -a "$out"
