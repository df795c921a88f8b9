"""Fused Pallas wavefront sweep + the padded-layout XLA fallback path."""

import numpy as np

from pbte_tpu import mesh as pmesh
from pbte_tpu.angular import quadrature as ang
from pbte_tpu.fem import assembly
from pbte_tpu.material import nongray_smrt as mat
from pbte_tpu.solver.source_iteration import SourceIterationSolver


def _problem(reference_root=None, nx=None):
    if nx is None:
        m = pmesh.load_mfem_mesh(
            str(reference_root / "config/mesh/unit-square-iso.mesh")
        )
        bcs = {1: -0.5, 2: 0.5}
    else:
        m = pmesh.make_cartesian_2d(nx, nx, pmesh.GEOM_TRIANGLE)
        bcs = {1: -0.5, 2: -0.5, 3: 0.5, 4: -0.5}
    m = m.scaled(1e-6)
    ops = assembly.assemble(pmesh.connect(m), order=1)
    quad = ang.build(ang.AngularOptions(dimension=2, azimuth_points=8))
    tables = mat.build_tables(mat.SILICON, num_spectral=4)
    return ops, quad, tables, bcs


def test_solver_with_pallas_matches_default(reference_root):
    ops, quad, tables, bcs = _problem(reference_root)
    s0 = SourceIterationSolver(ops, quad, tables, bcs, cache_policy="eigen")
    s1 = SourceIterationSolver(ops, quad, tables, bcs, cache_policy="eigen",
                               use_pallas=True)
    assert s1._fused is not None  # fused sweep active (interpret mode on CPU)
    r0 = s0.solve(tol=0, max_iter=4, verbose=False)
    r1 = s1.solve(tol=0, max_iter=4, verbose=False)
    np.testing.assert_allclose(np.asarray(r1.Tc), np.asarray(r0.Tc), rtol=1e-10)


def test_padded_scan_fallback_matches_compact(monkeypatch):
    """H>4 disables the fused kernel but keeps the padded (L*W) element
    layout; the scan path must then clamp its level windows against ne_pad,
    not ne (round-1 advisor bug: mis-clamped windows silently skipped the
    tail levels, max |Tc| error 0.22 on a 32-element mesh)."""
    import pbte_tpu.ops.fused_sweep as fs

    monkeypatch.setattr(fs, "max_level_gap", lambda *a, **k: 99)
    ops, quad, tables, bcs = _problem(nx=4)  # 32 elements, multiple levels
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        s_pad = SourceIterationSolver(ops, quad, tables, bcs,
                                      cache_policy="eigen", use_pallas=True)
    assert s_pad.padded and not s_pad.use_pallas and s_pad.ne_pad > s_pad.ne
    s_ref = SourceIterationSolver(ops, quad, tables, bcs, cache_policy="eigen")
    rp = s_pad.solve(tol=0, max_iter=20, verbose=False)
    rr = s_ref.solve(tol=0, max_iter=20, verbose=False)
    np.testing.assert_allclose(np.asarray(rp.Tc), np.asarray(rr.Tc),
                               rtol=1e-10, atol=1e-14)


def test_step_impl_direct_with_pallas_request(reference_root):
    """__graft_entry__.entry() hands out _step_impl directly; it must be the
    (always-jittable) scan path even when the solver was built with
    use_pallas=True (round-1 advisor: a dead branch called _step_pallas with
    the wrong arity)."""
    ops, quad, tables, bcs = _problem(reference_root)
    import jax.numpy as jnp

    s = SourceIterationSolver(ops, quad, tables, bcs, cache_policy="eigen",
                              use_pallas=True)
    # _step_impl's contract is the scan layout (G, Km, BS, D, ne_pad)
    u = jnp.zeros((s.G, s.Km, s.BS, s.D, s.ne_pad), dtype=s.dtype)
    Tc = jnp.zeros((s.ne, s.D), dtype=s.dtype)
    Tv = jnp.zeros((s.ne,), dtype=s.dtype)
    u2, Tc2, Tv2, res = s._step_impl(s.consts, u, Tc, Tv)
    assert np.isfinite(float(res))
