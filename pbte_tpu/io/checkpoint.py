"""Checkpoint / resume for the outer source iteration.

The reference has NO checkpointing (SURVEY.md section 5); its nearest artifact
is the end-of-run coefficient dump, which contains exactly the state needed
for a restart because the outer iteration is memoryless beyond (u, Tc, Tv).
This module makes that a first-class capability: a single .npz per checkpoint
with the solver state + shape/config fingerprint, verified on load.
"""

from __future__ import annotations

import numpy as np


def _fingerprint(solver) -> dict:
    # cache_policy/use_pallas determine the state LAYOUT of u (scan layout
    # (G, Km, BS, D, ne_pad) vs fused (G, L, Km, D, BS, W)); a layout-
    # mismatched load must fail here, not as an opaque XLA shape error later
    policy = {"full": 0, "on-the-fly": 1, "eigen": 2}[
        getattr(solver, "cache_policy", "full")
    ]
    fp = dict(
        G=solver.G, Km=solver.Km, BS=solver.BS, D=solver.D, ne=solver.ne,
        K=solver.K, dt_inv=solver.dt_inv,
        ne_pad=getattr(solver, "ne_pad", solver.ne),
        cache_policy=policy,
        use_pallas=int(bool(getattr(solver, "use_pallas", False))),
    )
    if hasattr(solver, "pplan"):  # SpatialShardedSolver
        fp["nparts"] = solver.pplan.nparts
        fp["ne_max"] = solver.ne_max
    if getattr(solver, "sweep_mode", "scan") == "ring":
        # the ring carries the mass-transformed state v = M^T u — a
        # checkpoint of one kind must not silently load into the other
        fp["state_kind"] = 1
    return fp


def _expected_u_shape(solver) -> tuple:
    if hasattr(solver, "pplan"):  # SpatialShardedSolver
        return (solver.pplan.nparts, solver.G, solver.Km, solver.BS,
                solver.D, solver.ne_max)
    if getattr(solver, "_fused", None) is not None and solver.use_pallas:
        return (solver.G, solver.L, solver.Km, solver.D, solver.BS, solver.W)
    if getattr(solver, "sweep_mode", "scan") == "ring":
        return (solver.L, solver.G, solver.Km, solver.D, solver.BS, solver.W)
    return (solver.G, solver.Km, solver.BS, solver.D, solver.ne_pad)


def save_checkpoint(path: str, solver, u, Tc, Tv, iteration: int, residual: float):
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path,
        u=np.asarray(u),
        Tc=np.asarray(Tc),
        Tv=np.asarray(Tv),
        iteration=iteration,
        residual=residual,
        **{f"fp_{k}": v for k, v in _fingerprint(solver).items()},
    )


def load_checkpoint(path: str, solver):
    """Returns (state_tuple, iteration, residual); state feeds solver.solve."""
    import jax.numpy as jnp

    data = np.load(path)
    fp = _fingerprint(solver)
    for k, v in fp.items():
        if f"fp_{k}" not in data:
            raise ValueError(f"checkpoint missing fingerprint field {k!r}")
        stored = data[f"fp_{k}"]
        if not np.allclose(stored, v):
            raise ValueError(
                f"checkpoint mismatch: {k} was {stored}, solver has {v}"
            )
    want = _expected_u_shape(solver)
    if tuple(data["u"].shape) != want:
        raise ValueError(
            f"checkpoint u has shape {data['u'].shape}, solver expects {want}"
        )
    u = jnp.asarray(data["u"], dtype=solver.dtype)
    Tc = jnp.asarray(data["Tc"], dtype=solver.dtype)
    Tv = jnp.asarray(data["Tv"], dtype=solver.dtype)
    return (u, Tc, Tv), int(data["iteration"]), float(data["residual"])
