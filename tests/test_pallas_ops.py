"""Pallas kernels: level-solve identity + the fused wavefront sweep."""

import numpy as np
import pytest

from pbte_tpu.ops.level_solve import level_solve, level_solve_reference


def test_level_solve_matches_einsum():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    KB, D, W = 16, 10, 24
    a = jnp.asarray(rng.standard_normal((KB, D, D, W)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((KB, D, W)), jnp.float32)
    got = level_solve(a, r, block=8, interpret=True)
    want = level_solve_reference(a, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_level_solve_block_validation():
    import jax.numpy as jnp

    a = jnp.zeros((10, 3, 3, 4), jnp.float32)
    r = jnp.zeros((10, 3, 4), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        level_solve(a, r, block=8, interpret=True)


def test_solver_with_pallas_matches_default(reference_root):
    from pbte_tpu import mesh as pmesh
    from pbte_tpu.angular import quadrature as ang
    from pbte_tpu.fem import assembly
    from pbte_tpu.material import nongray_smrt as mat
    from pbte_tpu.solver.source_iteration import SourceIterationSolver

    m = pmesh.load_mfem_mesh(str(reference_root / "config/mesh/unit-square-iso.mesh"))
    m = m.scaled(1e-6)
    ops = assembly.assemble(pmesh.connect(m), order=1)
    quad = ang.build(ang.AngularOptions(dimension=2, azimuth_points=8))
    tables = mat.build_tables(mat.SILICON, num_spectral=4)
    bcs = {1: -0.5, 2: 0.5}
    s0 = SourceIterationSolver(ops, quad, tables, bcs, cache_policy="eigen")
    s1 = SourceIterationSolver(ops, quad, tables, bcs, cache_policy="eigen",
                               use_pallas=True)
    assert s1._fused is not None  # fused sweep active (interpret mode on CPU)
    r0 = s0.solve(tol=0, max_iter=4, verbose=False)
    r1 = s1.solve(tol=0, max_iter=4, verbose=False)
    np.testing.assert_allclose(np.asarray(r1.Tc), np.asarray(r0.Tc), rtol=1e-10)
