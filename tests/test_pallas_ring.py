"""Pallas VMEM lattice ring kernel (ops/lattice_ring.py) vs the XLA ring
path, interpreted on CPU. Both run f32 with full-precision matmuls
(cast_bf16 is False in interpret mode), so fields must agree tightly."""

import numpy as np

import jax.numpy as jnp

from pbte_tpu import mesh as pmesh
from pbte_tpu.angular import quadrature as ang
from pbte_tpu.fem import assembly
from pbte_tpu.material import nongray_smrt as mat
from pbte_tpu.solver.source_iteration import SourceIterationSolver

BCS3 = {1: -0.5, 2: -0.5, 3: -0.5, 4: -0.5, 5: -0.5, 6: 0.5}


def _problem(nx=9, ny=8, nz=8, order=1, nspec=2):
    m = pmesh.make_cartesian_3d(nx, ny, nz, "hex").scaled(1e-6)
    ops = assembly.assemble(pmesh.connect(m), order=order,
                            face_mode="consistent")
    quad = ang.build(ang.AngularOptions(
        dimension=3, polar_points=2, azimuth_points=4))
    tables = mat.build_tables(mat.SILICON, num_spectral=nspec)
    return ops, quad, tables


def _pair(ops, quad, tables, niter, **kw):
    import os

    # the XLA ring bf16-stages operands by default (numerically free on the
    # TPU MXU, ~1e-3 on CPU's exact f32 einsum); this parity test needs the
    # exact-f32 XLA leg
    os.environ["PBTE_RING_BF16"] = "0"
    try:
        sp = SourceIterationSolver(ops, quad, tables, BCS3,
                                   dtype=jnp.float32, sweep_mode="ring",
                                   use_pallas="on", **kw)
        sx = SourceIterationSolver(ops, quad, tables, BCS3,
                                   dtype=jnp.float32, sweep_mode="ring",
                                   use_pallas="off", **kw)
    finally:
        del os.environ["PBTE_RING_BF16"]
    assert sp._use_pallas_ring and sp._pallas_interpret
    assert not sx._use_pallas_ring
    assert sp._ring_lattice and sp._ring_ccpl
    rp = sp.solve(tol=0, max_iter=niter, verbose=False)
    rx = sx.solve(tol=0, max_iter=niter, verbose=False)
    return sp, sx, rp, rx


def test_pallas_ring_matches_xla_isothermal():
    """Non-cubic hex lattice: Tc, residual, and the state views of the
    kernel path must match the XLA ring path (both exact f32 on CPU)."""
    ops, quad, tables = _problem()
    sp, sx, rp, rx = _pair(ops, quad, tables, niter=4)
    np.testing.assert_allclose(np.asarray(rp.Tc), np.asarray(rx.Tc),
                               rtol=2e-5, atol=5e-7)
    np.testing.assert_allclose(rp.residual, rx.residual, rtol=1e-3)
    np.testing.assert_allclose(sp.u_by_direction(rp.u),
                               sx.u_by_direction(rx.u),
                               rtol=2e-5, atol=5e-7)


def test_pallas_ring_matches_xla_dirichlet():
    """Dirichlet (legacy type 7) source slab goes through the kernel's
    extra dsrc input."""
    import os

    ops, quad, tables = _problem(nx=8, ny=8, nz=8)
    kw = dict(dirichlet_bcs={6: 0.25})
    bcs = {a: -0.5 for a in range(1, 6)}
    os.environ["PBTE_RING_BF16"] = "0"  # exact-f32 XLA leg (see _pair)
    try:
        sp = SourceIterationSolver(ops, quad, tables, bcs,
                                   dtype=jnp.float32, sweep_mode="ring",
                                   use_pallas="on", **kw)
        sx = SourceIterationSolver(ops, quad, tables, bcs,
                                   dtype=jnp.float32, sweep_mode="ring",
                                   use_pallas="off", **kw)
    finally:
        del os.environ["PBTE_RING_BF16"]
    assert sp._use_pallas_ring and sp.has_dirichlet
    rp = sp.solve(tol=0, max_iter=4, verbose=False)
    rx = sx.solve(tol=0, max_iter=4, verbose=False)
    Tp = np.asarray(rp.Tc, dtype=np.float64)
    Tx = np.asarray(rx.Tc, dtype=np.float64)
    assert np.linalg.norm(Tp - Tx) / np.linalg.norm(Tx) < 1e-5


def test_pallas_gating():
    """Ineligible problems (periodic, f64) keep the XLA path even when
    the kernel is requested."""
    m = pmesh.make_cartesian_3d(8, 8, 8, "hex").scaled(1e-6)
    mp = pmesh.make_periodic(m, [0])
    ops = assembly.assemble(pmesh.connect(mp), order=1,
                            face_mode="consistent")
    quad = ang.build(ang.AngularOptions(
        dimension=3, polar_points=2, azimuth_points=4))
    tables = mat.build_tables(mat.SILICON, num_spectral=2)
    bcs = {a: (-0.5 if a != 6 else 0.5) for a in range(1, 7)
           }
    s = SourceIterationSolver(ops, quad, tables, {3: -0.5, 4: 0.5, 5: -0.5,
                                                  6: 0.5},
                              require_bcs=False, dtype=jnp.float32,
                              sweep_mode="ring", use_pallas="on")
    assert not s._use_pallas_ring  # periodic -> XLA path

    ops2 = assembly.assemble(pmesh.connect(m), order=1,
                             face_mode="consistent")
    s2 = SourceIterationSolver(ops2, quad, tables, bcs, dtype=jnp.float64,
                               sweep_mode="ring", use_pallas="on")
    assert not s2._use_pallas_ring  # f64 -> XLA path


def test_pallas_ring_bf16_state_converges():
    """bf16 state through the kernel (the measured-best flagship config,
    PBTE_RING_STATE_BF16=1 + PBTE_PALLAS=1): the iteration must converge to
    the same field within bf16-state resolution, with the macroscopic
    partials still f32 (computed from the f32 MXU accumulator in-kernel)."""
    import os

    ops, quad, tables = _problem(nx=8, ny=8, nz=8)
    os.environ["PBTE_RING_STATE_BF16"] = "1"
    try:
        sp = SourceIterationSolver(ops, quad, tables, BCS3,
                                   dtype=jnp.float32, sweep_mode="ring",
                                   use_pallas="on")
        # interpret mode disables the bf16-state flag (CPU tests keep
        # exact dtypes); force it for this coverage test
        sp._pallas_state_bf16 = True
    finally:
        del os.environ["PBTE_RING_STATE_BF16"]
    u, Tc, Tv = sp.initial_state()
    assert u[0].dtype == jnp.bfloat16
    prev = Tv
    for _ in range(30):
        u, Tc, Tv2, r = sp.step(u, Tc, prev)
        prev = Tv2
    assert u[0].dtype == jnp.bfloat16
    assert Tc.dtype == jnp.float32
    sx = SourceIterationSolver(ops, quad, tables, BCS3, dtype=jnp.float32,
                               sweep_mode="ring", use_pallas="off")
    ux, Tcx, Tvx = sx.initial_state()
    prevx = Tvx
    for _ in range(30):
        ux, Tcx, Tvx2, rx = sx.step(ux, Tcx, prevx)
        prevx = Tvx2
    scale = float(np.abs(np.asarray(Tcx)).max())
    assert np.abs(np.asarray(Tc) - np.asarray(Tcx)).max() < 3e-2 * scale
    assert np.isfinite(float(r))
