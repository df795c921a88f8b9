"""Supercell merge (fem/supercell.py): simplex lattices as block lattices.

The 6-tet / 2-tri splits of Cartesian lattices are merged into macro-cell
super elements and swept with the shift-structured lattice ring; the block
solve must reproduce the fine-mesh sweep EXACTLY (same linear systems,
solved simultaneously; ref semantics src/PBTESolver.cpp:208-332). Every
test compares full iterate trajectories against the general scan path on
the raw fine ops in float64.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pbte_tpu import mesh as pmesh  # noqa: E402
from pbte_tpu.angular import quadrature as ang  # noqa: E402
from pbte_tpu.fem import assembly, supercell  # noqa: E402
from pbte_tpu.material import nongray_smrt as mat  # noqa: E402
from pbte_tpu.solver.source_iteration import SourceIterationSolver  # noqa: E402

TABLES = mat.build_tables(mat.SILICON, num_spectral=3)


def _run(mesh, quad, bcs, order, nsteps=4, **kw):
    ops = assembly.assemble(
        pmesh.connect(mesh), order=order, face_mode="consistent"
    )
    s = SourceIterationSolver(
        ops, quad, TABLES, bcs, dtype=jnp.float64, **kw
    )
    u, Tc, Tv = s.initial_state()
    hist = []
    prev = Tv
    for _ in range(nsteps):
        u, Tc, Tv2, r = s.step(u, Tc, prev)
        prev = Tv2
        hist.append(float(r))
    return s, u, Tc, prev, hist


def test_detect_tri_lattice():
    m = pmesh.make_cartesian_2d(4, 3, "triangle")
    ops = assembly.assemble(pmesh.connect(m), order=1, face_mode="consistent")
    ops = assembly.permute_faces(ops, assembly.canonical_face_perm(ops))
    cls = assembly.element_classes(ops)
    sc = supercell.detect(ops, cls)
    assert sc is not None
    assert sc.gsz == 2 and sc.ncell == 12
    assert sc.super_ops.ndof == 2 * ops.ndof
    assert sc.super_ops.faces_per_elem == 4
    assert sorted(sc.lat_dims) == [3, 4]
    # every fine element appears exactly once in the block map
    assert np.array_equal(np.sort(sc.elem_at.reshape(-1)), np.arange(24))


def test_detect_six_tet_lattice():
    m = pmesh.make_cartesian_3d(3, 2, 2, "tet")
    ops = assembly.assemble(pmesh.connect(m), order=1, face_mode="consistent")
    ops = assembly.permute_faces(ops, assembly.canonical_face_perm(ops))
    cls = assembly.element_classes(ops)
    sc = supercell.detect(ops, cls)
    assert sc is not None
    assert sc.gsz == 6 and sc.ncell == 12
    assert sc.int_normals.shape[0] == 12  # 6 intra faces x 2 sides
    assert sc.super_ops.faces_per_elem == 6
    quad = ang.build(
        ang.AngularOptions(dimension=3, polar_points=4, azimuth_points=8)
    )
    assert supercell.verify_acyclic(sc, quad.directions)


def test_detect_rejects_hex():
    m = pmesh.make_cartesian_3d(2, 2, 2, "hex")
    ops = assembly.assemble(pmesh.connect(m), order=1, face_mode="consistent")
    ops = assembly.permute_faces(ops, assembly.canonical_face_perm(ops))
    assert supercell.detect(ops, assembly.element_classes(ops)) is None


def test_tri_lattice_iterate_exact():
    m = pmesh.make_cartesian_2d(4, 3, "triangle")
    quad = ang.build(
        ang.AngularOptions(dimension=2, polar_points=1, azimuth_points=8)
    )
    bcs = {1: -0.5, 2: 0.0, 3: 0.5, 4: 0.0}
    s_ref, u_r, Tc_r, Tv_r, h_r = _run(
        m, quad, bcs, 1, sweep_mode="scan", supercell="off"
    )
    s_sup, u_s, Tc_s, Tv_s, h_s = _run(
        m, quad, bcs, 1, sweep_mode="ring", supercell="on"
    )
    assert s_sup._super is not None and s_sup.sweep_mode == "ring"
    assert s_sup.G == 4  # quadrant sign patterns only
    np.testing.assert_allclose(h_s, h_r, rtol=1e-12)
    scale = np.abs(np.asarray(Tc_r)).max()
    assert (
        np.abs(s_sup.Tc_fine(Tc_s) - np.asarray(Tc_r)).max() < 1e-13 * scale
    )
    np.testing.assert_allclose(
        np.asarray(Tv_s), np.asarray(Tv_r), rtol=0, atol=1e-13 * scale
    )
    ud_r = s_ref.u_by_direction(u_r)
    ud_s = s_sup.u_by_direction(u_s)
    assert np.abs(ud_s - ud_r).max() < 1e-13 * np.abs(ud_r).max()


@pytest.mark.parametrize("order", [1, 2])
def test_six_tet_iterate_exact(order):
    m = pmesh.make_cartesian_3d(3, 2, 2, "tet").scaled(1e-6)
    quad = ang.build(
        ang.AngularOptions(dimension=3, polar_points=4, azimuth_points=4)
    )
    bcs = {a: (0.5 if a == 6 else -0.5) for a in range(1, 7)}
    s_ref, u_r, Tc_r, Tv_r, h_r = _run(
        m, quad, bcs, order, sweep_mode="scan", supercell="off"
    )
    s_sup, u_s, Tc_s, Tv_s, h_s = _run(
        m, quad, bcs, order, sweep_mode="ring", supercell="on"
    )
    assert s_sup._super is not None and s_sup.sweep_mode == "ring"
    assert s_sup.G == 8  # octant groups, not the 24 fine signature groups
    assert s_sup.D == 6 * s_ref.D
    np.testing.assert_allclose(h_s, h_r, rtol=1e-11)
    scale = np.abs(np.asarray(Tc_r)).max()
    assert (
        np.abs(s_sup.Tc_fine(Tc_s) - np.asarray(Tc_r)).max() < 1e-12 * scale
    )
    ud_r = s_ref.u_by_direction(u_r)
    ud_s = s_sup.u_by_direction(u_s)
    assert np.abs(ud_s - ud_r).max() < 1e-12 * np.abs(ud_r).max()
    Qc_r, Qv_r = s_ref.heat_flux(u_r)
    Qc_s, Qv_s = s_sup.heat_flux(u_s)
    qs = np.abs(np.asarray(Qv_r)).max()
    assert np.abs(np.asarray(Qv_s) - np.asarray(Qv_r)).max() < 1e-12 * qs
    assert (
        np.abs(np.asarray(Qc_s) - np.asarray(Qc_r)).max()
        < 1e-12 * np.abs(np.asarray(Qc_r)).max()
    )


def test_six_tet_oracle_convergence():
    """Converged solve through the supercell ring equals the sequential
    reference-mirror oracle (validation/oracle.py) on the fine mesh."""
    from pbte_tpu.validation import oracle

    m = pmesh.make_cartesian_3d(2, 2, 2, "tet").scaled(1e-6)
    quad = ang.build(
        ang.AngularOptions(dimension=3, polar_points=2, azimuth_points=4)
    )
    bcs = {a: (0.5 if a == 6 else -0.5) for a in range(1, 7)}
    conn = pmesh.connect(m)
    ops = assembly.assemble(conn, order=1, face_mode="consistent")
    s = SourceIterationSolver(
        ops, quad, TABLES, bcs, dtype=jnp.float64,
        sweep_mode="ring", supercell="on",
    )
    assert s._super is not None
    res = s.solve(tol=1e-10, max_iter=200, verbose=False)
    _u, Tc_o, _tv, _res, _it = oracle.solve_oracle(
        ops, quad, TABLES, bcs, tol=1e-10, max_iter=200
    )
    scale = np.abs(Tc_o).max()
    assert np.abs(s.Tc_fine(res.Tc) - Tc_o).max() < 1e-9 * scale


def test_forced_ring_unsupported_bcs_fall_back():
    """Dirichlet/diffuse/specular/periodic gate the merge off (the closures
    are implemented on the fine paths only)."""
    m = pmesh.make_cartesian_3d(2, 2, 2, "tet").scaled(1e-6)
    quad = ang.build(
        ang.AngularOptions(dimension=3, polar_points=2, azimuth_points=4)
    )
    ops = assembly.assemble(pmesh.connect(m), order=1, face_mode="consistent")
    bcs = {a: -0.5 for a in range(1, 6)}
    s = SourceIterationSolver(
        ops, quad, TABLES, bcs, dirichlet_bcs={6: 0.1},
        dtype=jnp.float64, supercell="on",
    )
    assert s._super is None
