"""Benchmark: batched-sweep throughput on the flagship 3D problem.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: element-ordinate DOF/s swept (the BASELINE.md north-star) on a 3D
unit-cube hex mesh, p=2 L2 elements, 8x8 product angular quadrature, full
non-gray 2x20-band silicon spectrum, float32, consistent DG faces, and the
eigendecomposition-compressed transport operators (cache_policy="eigen":
band-independent complex factors, ~10x less HBM than direct inverses).

vs_baseline: the reference publishes no benchmark numbers (BASELINE.md), so
the baseline is constructed from the sequential oracle (an algorithmically
faithful mirror of the reference's per-element sweep loop) measured on this
machine, scaled by a generous 100x python->C++ factor to approximate the
reference's single-core C++ throughput. vs_baseline = tpu_dofs / (100 *
python_oracle_dofs).

Env overrides: PBTE_BENCH_NX, PBTE_BENCH_ORDER, PBTE_BENCH_POLAR,
PBTE_BENCH_AZIMUTH, PBTE_BENCH_NSPEC, PBTE_BENCH_STEPS, PBTE_BENCH_PLATFORM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    platform = os.environ.get("PBTE_BENCH_PLATFORM", "")
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        ),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_problem

    nx = int(os.environ.get("PBTE_BENCH_NX", 6))
    order = int(os.environ.get("PBTE_BENCH_ORDER", 2))
    polar = int(os.environ.get("PBTE_BENCH_POLAR", 8))
    azimuth = int(os.environ.get("PBTE_BENCH_AZIMUTH", 8))
    nspec = int(os.environ.get("PBTE_BENCH_NSPEC", 20))
    steps = int(os.environ.get("PBTE_BENCH_STEPS", 20))
    policy = os.environ.get("PBTE_BENCH_POLICY", "eigen")

    solver = _build_problem(
        nx=nx, order=order, polar=polar, azimuth=azimuth, nspec=nspec,
        dtype=jnp.float32, geom="hex", dim=3, cache_policy=policy,
    )
    ne, D, K, BS = solver.ne, solver.D, solver.K, solver.BS
    print(
        f"[bench] hex {nx}^3 ne={ne} p={order} D={D} K={K} BS={BS} "
        f"groups={solver.G} Km={solver.Km} levels={solver.plan.max_levels} "
        f"width={solver.plan.max_width} device={jax.devices()[0]}",
        file=sys.stderr,
    )

    u, Tc, Tv = solver.initial_state()
    # warmup / compile. NOTE: jax.block_until_ready returns early on the axon
    # platform; fetching a scalar value is the only reliable device sync.
    t0 = time.time()
    u, Tc, Tv2, r = solver.step(u, Tc, Tv)
    _ = float(r)
    print(f"[bench] compile+first step: {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    prev = Tv2
    for _ in range(steps):
        u, Tc, Tv2, r = solver.step(u, Tc, prev)
        prev = Tv2
    _ = float(r)  # value fetch = real sync
    dt = time.time() - t0
    dofs = steps * K * BS * ne * D / dt
    print(
        f"[bench] {steps} steps in {dt:.3f}s -> {dofs:.4g} element-ordinate DOF/s "
        f"(residual {float(r):.3e})",
        file=sys.stderr,
    )

    # ---- baseline: sequential oracle (reference algorithm) on a small shape
    from pbte_tpu import mesh as pmesh
    from pbte_tpu.angular import quadrature as ang
    from pbte_tpu.fem import assembly
    from pbte_tpu.material import nongray_smrt as mat
    from pbte_tpu.validation.oracle import solve_oracle

    msmall = pmesh.make_cartesian_2d(2, 2, pmesh.GEOM_TRIANGLE).scaled(1e-6)
    ops_s = assembly.assemble(pmesh.connect(msmall), order=1)
    quad_s = ang.build(ang.AngularOptions(dimension=2, azimuth_points=8))
    tab_s = mat.build_tables(mat.SILICON, num_spectral=4)
    bcs = {1: -0.5, 2: -0.5, 3: 0.5, 4: -0.5}
    t0 = time.time()
    n_iter = 3
    solve_oracle(ops_s, quad_s, tab_s, bcs, tol=0, max_iter=n_iter)
    dt_o = time.time() - t0
    oracle_dofs = (
        n_iter * quad_s.num_directions * 8 * msmall.num_elements * ops_s.ndof / dt_o
    )
    baseline = 100.0 * oracle_dofs  # generous python->C++ factor
    print(
        f"[bench] oracle: {oracle_dofs:.4g} DOF/s python-sequential; "
        f"baseline (x100 C++ estimate): {baseline:.4g}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "element_ordinate_dof_per_s",
                "value": dofs,
                "unit": "dof/s",
                "vs_baseline": dofs / baseline,
            }
        )
    )


if __name__ == "__main__":
    main()
