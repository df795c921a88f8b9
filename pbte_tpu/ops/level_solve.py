"""Pallas TPU kernel: batched per-element operator application.

The innermost hot op of the wavefront sweep is
    sol[k, b, i, w] = sum_j A_inv[k, b, i, j, w] * rhs[k, b, j, w]
— a (D x D) matvec batched over (directions x bands x level-width), with the
level-width axis w on the 128-wide lane dimension (the element-last layout).

This kernel keeps one (TB, D, D, W) block of A_inv and its rhs resident in
VMEM and runs the D^2 fused multiply-adds on the VPU with w fully
lane-parallel, avoiding intermediate HBM round-trips between the j-terms.
It is numerically identical to the jnp.einsum the solver uses by default
(set use_pallas=True on the solver to switch); on bandwidth-bound shapes both
run at the A_inv streaming rate, and the kernel is the hook point for the
next round's fully-fused level step (rhs assembly + solve in one kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(a_ref, rhs_ref, out_ref, *, D):
    # a_ref (TB, D, D, W); rhs_ref (TB, D, W); out_ref (TB, D, W)
    acc = a_ref[:, :, 0, :] * rhs_ref[:, 0, :][:, None, :]
    for j in range(1, D):
        acc += a_ref[:, :, j, :] * rhs_ref[:, j, :][:, None, :]
    out_ref[:] = acc


def level_solve(a_inv, rhs, block: int = 8, interpret: bool | None = None):
    """a_inv (KB, D, D, W), rhs (KB, D, W) -> (KB, D, W).

    KB is the flattened (directions x bands) batch; pad KB to a multiple of
    `block` before calling (the solver does)."""
    KB, D, _, W = a_inv.shape
    if KB % block != 0:
        raise ValueError(f"batch {KB} not divisible by block {block}")
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    grid = (KB // block,)
    return pl.pallas_call(
        functools.partial(_kernel, D=D),
        out_shape=jax.ShapeDtypeStruct((KB, D, W), a_inv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, D, D, W), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((block, D, W), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block, D, W), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(a_inv, rhs)


def level_solve_reference(a_inv, rhs):
    """The einsum the solver uses by default (for testing/benchmarking)."""
    return jnp.einsum("kijw,kjw->kiw", a_inv, rhs)
