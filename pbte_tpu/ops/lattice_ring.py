"""Pallas TPU kernel for the lattice-shift ring sweep.

The XLA scan implementation of the shift-structured ring sweep
(`solver/source_iteration.py:_step_ring`, lattice branch) is dominated by
data movement the compiler cannot avoid: per level it materializes the
shifted+masked copies of the previous solution slab, concatenates them with
the rhs into the J-wide matmul operand (``xcat``), and streams both through
HBM.  This kernel removes that staging (xcat lives only in VMEM scratch),
cutting HBM traffic per step from ~22.6 GB to the mandatory state in/out
(+ small side inputs).

MEASURED HISTORY (v5e, flagship shapes L=46, Gb=4, Km=10, BS=40, D=27,
W=256):

- r4 (per-band unrolled dots): 22.9 ms/bucket, ~45 ms/step — SLOWER than
  the 31.7 ms XLA step of the time; attributed to Mosaic's sequential
  per-band dot emission.
- r5 re-measure with a chained-dispatch protocol (single-shot timings on
  the tunneled platform carry ~40 ms of dispatch+fetch overhead that had
  polluted the r4 numbers): the kernel is 100% DMA-BOUND — a zero-compute
  passthrough costs the same 15.7 ms/bucket as the full f32 kernel, and
  one batched ``dot_general`` over the band axis times IDENTICAL to the
  unrolled loop (15.68 vs 15.68 ms) while compiling ~100x faster (2.9 s
  vs 228 s cold). The binding constraint is the Pallas DMA pipeline's
  ~270-380 GB/s effective bandwidth on these blocks (a plain Pallas
  streaming copy measures 382 GB/s where the XLA copy reaches 814); block
  enlarging, D-padding to 32, and 2-levels-per-grid-step all measured
  neutral.
- r5 WIN: bfloat16 state through the kernel (v/ys blocks) halves the
  dominant streams — 10.47 ms/bucket, end-to-end flagship 21.5 ms/step =
  1.32e10 DOF/s vs 25.9 ms XLA f32 / 22.4 ms XLA bf16-state — the best
  committed flagship configuration (PBTE_PALLAS=1 PBTE_RING_STATE_BF16=1),
  with BETTER closure numerics than the XLA bf16-state mode: the
  macroscopic partials leave the kernel in f32, computed from the f32 MXU
  accumulator before the state cast.

The integration (`use_pallas="on"`) and the CPU-interpreter parity tests
in tests/test_pallas_ring.py cover both state dtypes.

This kernel keeps the whole per-level working set in VMEM:

- grid ``(G_b, Km_b, L)`` with the level axis innermost — TPU grids run
  sequentially, so the previous level's solution slab ("the ring") persists
  in a VMEM scratch buffer across levels of one ``(group, slot)`` pair and
  is reset to zero when ``l == 0``;
- the matmul operand ``xcat (BS, J, W)`` is assembled in VMEM scratch in
  bfloat16 (the MXU truncates f32 operands to bf16 at default matmul
  precision anyway, so this matches the XLA path's numerics) and never
  touches HBM;
- upwind neighbor selection is a zero-filled lane shift of the ring slab
  by the static lattice shift (a static slice concatenated with a zero
  block — the exact semantics of the XLA path's pad+slice; a circular
  ``pltpu.roll`` would also be correct under the cin-zero boundary
  invariant but Mosaic cannot lower ``tpu.dynamic_rotate`` for this
  3-D vector shape), masked by the inflow coefficients ``cin``;
- every elementwise stage is one full-band ``(BS, D, W)`` VPU op — the
  per-band weights arrive as ``(BS, 1, 1)`` VMEM vectors and broadcast,
  instead of SMEM scalars consumed by a BS-times unrolled loop (the
  unrolled form measured 12.4 us per grid step; the matmuls alone need
  ~3 us);
- per band ``b`` the transport solve is one 2-D MXU dot
  ``bcat[b] (D, J) @ xcat[b] (J, W)`` — leading-axis slices only, no
  relayouts (the kernel-path state layout is ``(L, G, Km, BS, D, W)``,
  chosen at solver init);
- the macroscopic partial ``sum_b macro_w[b] * sol[b]`` is one broadcast
  multiply + axis-0 reduction while the solution is hot, written as a
  small ``(D, W)`` block per ``(group, slot, level)``.

HBM traffic per outer step is thereby reduced to: one read of the previous
state, one write of the new state, one read of the (slot-constant)
transport factors, plus O(state/BS) side inputs.

Reference semantics: the per-level recurrence is the batched form of the
per-element upwind DG sweep in ``/root/reference/src/PBTESolver.cpp:256-308``
(see the solver docstrings for the full mapping).

Periodic wrap couplings, multi-class lattices, f64, explicit ``highest``
matmul precision, and sharded runs fall back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(v_ref, ttc_ref, bsrc_ref, cin_ref, bcat_ref, mw_ref, wvec_ref,
            *rest, shifts, BS, D, W, has_dirichlet, cast_bf16, interpret):
    if has_dirichlet:
        dsrc_ref = rest[0]
        rest = rest[1:]
    ys_ref, ms_ref, ring_ref, xcat_ref = rest
    op_dtype = jnp.bfloat16 if cast_bf16 else v_ref.dtype

    l = pl.program_id(2)

    @pl.when(l == 0)
    def _():
        ring_ref[...] = jnp.zeros_like(ring_ref)

    ttc = ttc_ref[0, 0]         # (D, W)
    bsrc = bsrc_ref[0, 0, 0]    # (D, W)

    # neighbor terms: zero-filled lane shift of the previous level's slab
    # by the static lattice shift, scaled by the inflow coefficients
    # (out[..., w] = ring[..., w-s], zero where w < s — identical to the
    # XLA path's pad+slice)
    ring = ring_ref[...]        # (BS, D, W) op_dtype
    for fi, s in enumerate(shifts):
        cf = cin_ref[0, 0, 0, fi].astype(op_dtype)  # (W,)
        if s:
            yf = jnp.concatenate(
                [jnp.zeros(ring.shape[:-1] + (s,), ring.dtype),
                 ring[:, :, :W - s]],
                axis=2,
            )
        else:
            yf = ring
        xcat_ref[:, (fi + 1) * D:(fi + 2) * D, :] = yf * cf[None, None, :]

    # full-band rhs: per-band weights broadcast from (BS, 1, 1) vectors —
    # ONE VPU op per term over the whole (BS, D, W) slab
    w_src = wvec_ref[0, 0]      # (BS, 1, 1) each
    w_rel = wvec_ref[0, 1]
    w_bcv = wvec_ref[0, 2]
    rhs = (
        w_src * ttc[None]
        + w_rel * v_ref[0, 0, 0]
        - w_bcv * bsrc[None]
    )
    if has_dirichlet:
        rhs = rhs - wvec_ref[0, 3] * dsrc_ref[0, 0, 0][None]
    xcat_ref[:, :D, :] = rhs.astype(op_dtype)

    # batched MXU transport solve: ONE dot_general over the band axis.
    # r4 unrolled this loop because Mosaic's batched emission was assumed
    # broken; the r5 microbench measured the batched form IDENTICAL in
    # step time (15.68 vs 15.68 ms/bucket — the kernel is DMA-bound either
    # way) and ~100x faster to compile (2.9 s vs 228 s cold), which is the
    # structural fix for the cold-compile minutes.
    sol = jax.lax.dot_general(
        bcat_ref[0, 0].astype(op_dtype), xcat_ref[...],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                           # (BS, D, J) @ (BS, J, W) -> (BS, D, W)
    ys_ref[0, 0, 0] = sol.astype(ys_ref.dtype)
    ring_ref[...] = sol.astype(op_dtype)

    # macroscopic partial from the f32 sol (exact even under bf16 state):
    # one broadcast multiply + axis-0 reduce
    ms_ref[0, 0, 0] = jnp.sum(sol * mw_ref[0, 0], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("shifts", "cast_bf16", "interpret"),
)
def lattice_ring_sweep(v, ttc, bsrc, cin, bcat, macro_w, wvec, *,
                       shifts, dsrc=None, cast_bf16=True, interpret=False):
    """Run one outer-iteration lattice ring sweep for one Km bucket.

    Args:
      v: previous state, ``(L, Gb, Km, BS, D, W)`` (mass-transformed).
      ttc: lagged-temperature slab after M^T, ``(L, Gb, D, W)``.
      bsrc: boundary-source slab, ``(L, Gb, Km, D, W)``.
      cin: inflow coefficients, ``(L, Gb, Km, nf, W)`` (slot-major so
        the block's trailing dims are whole axes, a Mosaic requirement).
      bcat: folded+concatenated transport factors, ``(Gb, Km, BS, D, J)``
        with ``J = (1 + nf) * D``.
      macro_w: macroscopic reduction weights, ``(Gb, Km, BS)``.
      wvec: ``(4, BS)`` rows ``[src_w, relax_w, vg*bc_w, vg]``.
      shifts: static per-face lane shifts of the lattice (tuple of int).
      dsrc: optional Dirichlet source slab, ``(L, Gb, Km, D, W)``.
      cast_bf16: cast MXU operands to bfloat16 (matches XLA default
        matmul precision on TPU); False keeps full precision (CPU tests).
      interpret: run the kernel in the Pallas interpreter (CPU).

    Returns:
      ``(ys, ms)``: new state ``(L, Gb, Km, BS, D, W)`` (same dtype as
      ``v`` — bfloat16 state halves the kernel's dominant HBM streams:
      measured 10.47 vs 15.68 ms/bucket at the flagship, r5) and per-slot
      macroscopic partials ``(Gb, Km, L, D, W)`` in FLOAT32 regardless of
      the state dtype (computed from the f32 MXU accumulator before the
      state cast, so the closure precision does not degrade with bf16
      state — unlike the XLA path's PBTE_RING_STATE_BF16 mode).
    """
    L, Gb, Km, BS, D, W = v.shape
    nf = len(shifts)
    J = (1 + nf) * D
    assert bcat.shape == (Gb, Km, BS, D, J), (bcat.shape, (Gb, Km, BS, D, J))
    has_dirichlet = dsrc is not None
    dtype = v.dtype
    ms_dtype = jnp.float32 if dtype in (jnp.bfloat16, jnp.float32) else dtype
    op_dtype = jnp.bfloat16 if cast_bf16 else dtype

    in_specs = [
        pl.BlockSpec((1, 1, 1, BS, D, W), lambda g, k, l: (l, g, k, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, D, W), lambda g, k, l: (l, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, D, W), lambda g, k, l: (l, g, k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, nf, W), lambda g, k, l: (l, g, k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, BS, D, J), lambda g, k, l: (g, k, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, BS, 1, 1), lambda g, k, l: (g, k, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, BS, 1, 1), lambda g, k, l: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [
        v, ttc, bsrc, cin,
        bcat,
        macro_w[:, :, :, None, None],           # (Gb, Km, BS, 1, 1)
        wvec[None, :, :, None, None],           # (1, 4, BS, 1, 1)
    ]
    if has_dirichlet:
        in_specs.append(
            pl.BlockSpec((1, 1, 1, D, W), lambda g, k, l: (l, g, k, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(dsrc)

    kernel = functools.partial(
        _kernel, shifts=tuple(int(s) for s in shifts), BS=BS, D=D, W=W,
        has_dirichlet=has_dirichlet, cast_bf16=cast_bf16,
        interpret=interpret,
    )
    ys, ms = pl.pallas_call(
        kernel,
        grid=(Gb, Km, L),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, 1, BS, D, W),
                         lambda g, k, l: (l, g, k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, D, W), lambda g, k, l: (g, k, l, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, Gb, Km, BS, D, W), dtype),
            jax.ShapeDtypeStruct((Gb, Km, L, D, W), ms_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((BS, D, W), op_dtype),   # ring: previous level's sol
            pltpu.VMEM((BS, J, W), op_dtype),   # xcat: matmul operand
        ],
        interpret=interpret,
    )(*args)
    return ys, ms
