#!/bin/bash
# One-shot round-3 TPU measurement sweep (run when the axon relay is up,
# host otherwise idle). Appends results to bench_artifacts/r3_final.txt.
set -u
cd "$(dirname "$0")/.."
out=bench_artifacts/r3_final.txt
mkdir -p bench_artifacts
run() {
  echo "=== $* ===" | tee -a "$out"
  env "$@" timeout -k 30 1500 python bench.py 2>>"$out" | tee -a "$out"
}
date | tee -a "$out"
# 1. flagship default (windows + bf16 staging, committed defaults)
run PBTE_BENCH_CPP_ITERS=0
# 2. scan unroll A/B under the new defaults
run PBTE_BENCH_CPP_ITERS=0 PBTE_BENCH_UNROLL=2
# 3. high-arithmetic-intensity sweep-kernel row: p=3 (D=64, J=256), 16 dirs
run PBTE_BENCH_CPP_ITERS=0 PBTE_BENCH_ORDER=3 PBTE_BENCH_POLAR=2 \
    PBTE_BENCH_AZIMUTH=8 PBTE_BENCH_STEPS=6
# 4. bf16 STATE storage A/B (ys + inter-iteration slabs stored bf16;
#    halves the ys-write / v_l-read HBM streams — flip the default if it wins)
run PBTE_BENCH_CPP_ITERS=0 PBTE_RING_STATE_BF16=1
# 5. MFU-scaling row: 24^3 (ne=13824, W=576 plane) amortizes per-level
#    overheads; reports frac_f32_peak at a production-growth shape
run PBTE_BENCH_CPP_ITERS=0 PBTE_BENCH_NX=24 PBTE_BENCH_STEPS=6
run PBTE_BENCH_CPP_ITERS=0 PBTE_BENCH_NX=24 PBTE_BENCH_STEPS=6 \
    PBTE_RING_STATE_BF16=1
# 5a. kernel-level MFU of the batched sweep contraction (the north-star
#     wording is "in batched sweep kernels"): staged = the real ring body,
#     pure = bare matmul; p=2 flagship kernel and the p=3 (J=256) kernel
for m in staged pure; do
  for o in 2 3; do
    echo "=== kmfu mode=$m order=$o ===" | tee -a "$out"
    env PBTE_KMFU_MODE=$m PBTE_KMFU_ORDER=$o timeout -k 30 900 \
        python scripts/bench_kernel_mfu.py 2>>"$out" | tee -a "$out"
  done
done
# 5b. tet production shape: forced ring vs the measured scan path (auto
#     rejects ring there only on the W>=64 lane-fill heuristic — W=50)
echo "=== tet ring A/B ===" | tee -a "$out"
env PBTE_TET_SWEEP=ring PBTE_TET_STEPS=5 timeout -k 30 2400 \
    python scripts/bench_tet.py 2>>"$out" | tee -a "$out"
# 5c. FULL 16x24-angle legacy tet quadrature. The all-groups vmap
#     RESOURCE_EXHAUSTED here in the r3 measurement (the subset row
#     extrapolates); sequential groups (lax.map) trade the per-group
#     window working set for one level of sequencing. First row records
#     the actual OOM buffer (or a surprise pass), second the seq path.
echo "=== tet full-K (vmap groups; expect OOM) ===" | tee -a "$out"
env PBTE_TET_POLAR=16 PBTE_TET_AZIMUTH=24 PBTE_TET_STEPS=3 \
    timeout -k 30 2400 python scripts/bench_tet.py 2>>"$out" | tee -a "$out"
echo "=== tet full-K sequential groups ===" | tee -a "$out"
env PBTE_TET_POLAR=16 PBTE_TET_AZIMUTH=24 PBTE_TET_STEPS=3 \
    PBTE_SEQ_GROUPS=1 timeout -k 30 2400 \
    python scripts/bench_tet.py 2>>"$out" | tee -a "$out"
# 5d. class-compressed operator streams A/B on the tet subset row (kills
#     the O(G*ne) coupling/mass/face-int streams; window ops rebuilt from
#     (ncls, ...) caches via the one-hot). Needs cache_policy=full.
echo "=== tet class-ops A/B ===" | tee -a "$out"
env PBTE_TET_POLICY=full PBTE_TET_STEPS=5 timeout -k 30 2400 \
    python scripts/bench_tet.py 2>>"$out" | tee -a "$out"
env PBTE_TET_POLICY=full PBTE_TET_STEPS=5 PBTE_SCAN_CLASS_OPS=1 \
    timeout -k 30 2400 python scripts/bench_tet.py 2>>"$out" | tee -a "$out"
echo "=== tet full-K seq + class-ops ===" | tee -a "$out"
env PBTE_TET_POLAR=16 PBTE_TET_AZIMUTH=24 PBTE_TET_STEPS=3 \
    PBTE_TET_POLICY=full PBTE_SEQ_GROUPS=1 PBTE_SCAN_CLASS_OPS=1 \
    timeout -k 30 2400 python scripts/bench_tet.py 2>>"$out" | tee -a "$out"
# 6. Krylov-accelerated flagship convergence (the other half of the
#    north-star: wall time to residual 1e-8). BiCGStab holds ~8 state
#    copies (~9 GB f32 at hex-16^3) — if it OOMs the row just fails.
echo "=== converge bicgstab ===" | tee -a "$out"
env PBTE_CONV_ACCEL=bicgstab PBTE_CONV_TOL=1e-8 PBTE_CONV_PROBE=1e-8 \
    PBTE_CONV_MAXIT=600 timeout -k 30 2400 python scripts/converge_flagship.py \
    2>>"$out" | tee -a "$out"
# 7. production-field recipe: exact-precision (highest) fixed point via
#    the accelerated solve — plain highest needed 1490 iters to 1e-7
echo "=== converge bicgstab highest ===" | tee -a "$out"
env PBTE_CONV_ACCEL=bicgstab PBTE_CONV_PRECISION=highest \
    PBTE_CONV_TOL=1e-8 PBTE_CONV_PROBE=1e-8 PBTE_CONV_MAXIT=600 \
    timeout -k 30 3600 python scripts/converge_flagship.py 2>>"$out" | tee -a "$out"
date | tee -a "$out"
