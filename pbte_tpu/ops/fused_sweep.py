"""Fully-fused Pallas wavefront-sweep kernel (KBA on a chip).

Why: on this TPU the XLA `lax.scan` over wavefront levels pays a measured
~1.3 ms FIXED cost per iteration (even for trivial bodies), which dominates
the whole outer step (~50 of 72 ms on the flagship). A Pallas kernel with
grid=(L,) iterates levels as hardware grid steps (microseconds of overhead)
and keeps the moving data in VMEM:

- the previous H wavefronts of the solution live in a VMEM ring scratch
  (H bounded by the max upwind level gap: 1 on structured meshes, 2 on the
  tet meshes tested — the planner verifies and falls back to XLA otherwise);
- upwind neighbor values are produced by ONE-HOT MXU matmuls
  (ring[KmBSD, H*W] @ onehot[H*W, W]) instead of unsupported lane gathers;
- the per-level dense solve uses the eigendecomposition-compressed operator
  (band-independent complex factors, split into real/imag parts);
- everything u-independent (pseudo-time term, equilibrium source, boundary
  inflow) is precomputed OUTSIDE the kernel for all elements in one batched
  XLA pass (`rhs_base`), entering the kernel as a blocked input.

Data layout: LEVEL-PADDED element-last — every per-element tensor is
(..., L, W) with level l in slab [.., l, :]; the element axis seen by XLA ops
is the flattened L*W. Padding slots carry zero macroscopic weight and produce
zero ring contributions (their one-hot columns are zero), so they are inert.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except ImportError:  # pragma: no cover
    _HAVE_PLTPU = False


@dataclasses.dataclass
class FusedSweepPlan:
    """Host-built, level-padded tensors for one direction group."""

    H: int  # ring depth (max upwind level gap)
    L: int
    W: int
    onehot: np.ndarray  # (nf, H*W, L, W) ring-slot -> neighbor map
    valid: np.ndarray  # (L, W) 1.0 real / 0.0 padding


def max_level_gap(nbr_pos, W) -> int:
    """Max upwind level gap over a level-PADDED layout (position // W = level).
    nbr_pos (nf, L*W) with -1 for boundary/padding."""
    nf, ne_pad = nbr_pos.shape
    lev = np.arange(ne_pad) // W
    gap = 0
    for f in range(nf):
        nb = nbr_pos[f]
        ok = nb >= 0
        if ok.any():
            gap = max(gap, int((lev[ok] - lev[nb[ok]]).max()))
    return max(1, gap)


def build_group_plan(nbr_pos, valid_pos, L, W, H) -> FusedSweepPlan:
    """Level-PADDED layout: position p holds (level p//W, slot p%W).
    nbr_pos (nf, L*W) with -1 boundary/padding; valid_pos (L*W,) bool."""
    nf, ne_pad = nbr_pos.shape
    onehot = np.zeros((nf, H * W, L, W), dtype=np.float32)
    valid = valid_pos.reshape(L, W).astype(np.float32)
    # vectorized over all (face, position) pairs (the per-position Python
    # loop was ~G*ne_pad*nf iterations of setup time)
    pos = np.arange(ne_pad)
    l, w = pos // W, pos % W
    nb = nbr_pos  # (nf, ne_pad)
    gl, gw = nb // W, nb % W
    gap = l[None, :] - gl
    # downwind (gap <= 0) neighbors never contribute (their inflow factor
    # cin is zero); invalid/boundary positions carry no entry
    use = (nb >= 0) & (gap > 0) & valid_pos[None, :]
    if np.any(use & (gap > H)):
        raise ValueError("upwind level gap exceeds ring depth")
    fi, pi = np.nonzero(use)
    onehot[fi, (gl[fi, pi] % H) * W + gw[fi, pi], l[pi], w[pi]] = 1.0
    return FusedSweepPlan(H=H, L=L, W=W, onehot=onehot, valid=valid)


def pick_km_chunk(Km, D, BS, W, nf, H,
                  budget_bytes=92 * 2**20) -> int:
    """Largest divisor of Km whose kernel VMEM footprint fits the budget.

    Directions are independent inside a sweep (they couple only through Tc,
    outside the kernel), so the Km axis can be split across kernel calls —
    each chunk gets its own ring. The model mirrors the observed allocation:
    double-buffered input/output windows, the scratch accumulators, the ring,
    and a 1.5x margin for register-allocator spill slots (41 MB observed at
    the flagship's Km=12)."""
    su = lambda x: -(-x // 8) * 8        # sublane pad
    la = lambda x: -(-x // 128) * 128    # lane pad
    per_km = 4 * (
        2 * 2 * D * su(BS) * la(W)       # rhsb in + out windows, x2 buffers
        + 4 * 2 * D * su(D) * la(W)      # P/Q re+im, x2 buffers
        + 2 * 2 * su(D) * la(W)          # lambda re+im
        + 2 * su(nf) * la(W)             # cin
        + 3 * D * su(BS) * la(W)         # acc/tre/tim scratches
        + D * BS * la(H * W)             # ring slice
    )
    fixed = 4 * (
        2 * nf * D * su(D) * la(W)       # coupling
        + 2 * su(H * W) * la(W) * nf     # one-hot
    )
    per_km = int(per_km * 1.5)           # spill margin
    best = 1
    for c in range(1, Km + 1):
        if Km % c == 0 and fixed + c * per_km <= budget_bytes:
            best = c
    return best


def _kernel(rhsb, cpl, cin, oh, pre, pim, qre, qim, lre, lim, valid, vg,
            out, ring, acc_s, tre_s, tim_s, *, Km, BS, D, W, nf, H,
            split_dot):
    # All blocked inputs have a leading (1,)-sized level axis. Working tensors
    # keep trailing (BS, W) so every broadcast is a legal sublane/lane
    # replication for Mosaic (band vectors enter as (BS, 1); per-dof rows as
    # (..., 1, W)).
    #
    # The D-contractions are statically unrolled (Mosaic TC kernels cannot
    # lower dynamic_slice on values, which fori_loop + dynamic indexing would
    # need) and accumulate THROUGH VMEM SCRATCH REFS: accumulating into a
    # value would let the scheduler keep every unrolled product live at once
    # (~19 lane-padded (Km,D,BS,W) temporaries blew the scoped-VMEM stack);
    # the ref write ends each term's liveness at the iteration boundary.
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        ring[...] = jnp.zeros_like(ring)

    dt = rhsb.dtype
    vgb = vg[...][None, None]  # (1, 1, BS, 1)
    # the out block doubles as the rhs accumulator until the final solve
    # (one fewer 6.6 MB lane-padded scratch)
    out[0] = rhsb[0]  # (Km, D, BS, W)

    # ---- interior inflow: one-hot neighbor matmul + coupling contraction --
    ring2 = ring[...]  # (Km*D*BS, H*W)
    if split_dot:
        # On hardware the MXU truncates f32 operands to bf16 (measured
        # ~3e-2 absolute Tc error after 100 iterations); HIGHEST (bf16x6)
        # spilled 51 MB of registers and Mosaic rejects HIGH, so split the
        # ring into 3 bf16 planes by hand (8 mantissa bits each = f32's 24)
        # and use the native exact bf16 x bf16 -> f32 mode. The one-hot
        # selector is exact in bf16 so each pass is exact.
        hi = ring2.astype(jnp.bfloat16)
        r1 = ring2 - hi.astype(dt)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(dt)).astype(jnp.bfloat16)
        parts = (hi, mid, lo)
    for f in range(nf):
        if split_dot:
            ohb = oh[0, f].astype(jnp.bfloat16)
            nb = sum(
                jnp.dot(part, ohb, preferred_element_type=dt)
                for part in parts
            )  # (KmDBS, W)
        else:
            nb = jnp.dot(ring2, oh[0, f],
                         preferred_element_type=dt)  # (KmDBS, W)
        nb = nb.reshape(Km, D, BS, W)
        acc_s[...] = jnp.zeros((Km, D, BS, W), dt)
        for j in range(D):
            acc_s[...] += cpl[0, f, :, j, :][None, :, None, :] * nb[:, j][:, None]
        cinf = cin[0, :, f, :][:, None, None, :]  # (Km, 1, 1, W)
        out[0] -= vgb * cinf * acc_s[...]

    # ---- eigen solve: A^-1 = P diag(1/(1+vg lam)) Q, complex split --------
    tre_s[...] = jnp.zeros((Km, D, BS, W), dt)
    tim_s[...] = jnp.zeros((Km, D, BS, W), dt)
    for j in range(D):
        rj = out[0, :, j][:, None]  # (Km, 1, BS, W)
        tre_s[...] += qre[0, :, :, j, :][:, :, None, :] * rj
        tim_s[...] += qim[0, :, :, j, :][:, :, None, :] * rj
    d_re = 1.0 + vgb * lre[0][:, :, None, :]  # (Km, D, BS, W)
    d_im = vgb * lim[0][:, :, None, :]
    inv = 1.0 / (d_re * d_re + d_im * d_im)
    t_re, t_im = tre_s[...], tim_s[...]
    tre_s[...] = (t_re * d_re + t_im * d_im) * inv  # s_re
    tim_s[...] = (t_im * d_re - t_re * d_im) * inv  # s_im
    acc_s[...] = jnp.zeros((Km, D, BS, W), dt)
    for j in range(D):
        acc_s[...] += pre[0, :, :, j, :][:, :, None, :] * tre_s[:, j][:, None]
        acc_s[...] -= pim[0, :, :, j, :][:, :, None, :] * tim_s[:, j][:, None]
    sol = acc_s[...] * valid[0, 0, :][None, None, None, :]
    out[0] = sol

    # ---- ring update (static branches over l % H) --------------------------
    flat = sol.reshape(Km * D * BS, W)
    for h in range(H):
        @pl.when(l % H == h)
        def _(h=h):
            ring[:, h * W:(h + 1) * W] = flat


def fused_sweep(rhsb, cpl, cin, oh, pre, pim, qre, qim, lre, lim, valid, vg,
                *, H, interpret=False):
    """Per-element tensors LEADING-level-padded; the solution/rhs layout is
    (L, Km, D, BS, W). Blocks slice only the leading level axis so the
    trailing two dims always equal the full array dims (a Pallas TPU
    requirement); vg enters as (BS, 1)."""
    L, Km, D, BS, W = rhsb.shape
    nf = cpl.shape[1]

    def lead(shape):
        return pl.BlockSpec((1,) + shape, lambda l: (l,) + (0,) * len(shape))

    kern = functools.partial(_kernel, Km=Km, BS=BS, D=D, W=W, nf=nf, H=H,
                             split_dot=not interpret)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((L, Km, D, BS, W), rhsb.dtype),
        grid=(L,),
        in_specs=[
            lead((Km, D, BS, W)),       # rhsb
            lead((nf, D, D, W)),        # coupling
            lead((Km, nf, W)),          # cin (interior-masked)
            lead((nf, H * W, W)),       # onehot
            lead((Km, D, D, W)),        # P re
            lead((Km, D, D, W)),        # P im
            lead((Km, D, D, W)),        # Q re
            lead((Km, D, D, W)),        # Q im
            lead((Km, D, W)),           # lam re
            lead((Km, D, W)),           # lam im
            lead((1, W)),               # valid
            pl.BlockSpec((BS, 1), lambda l: (0, 0)),  # vg (BS, 1)
        ],
        out_specs=lead((Km, D, BS, W)),
        scratch_shapes=[
            pltpu.VMEM((Km * D * BS, H * W), rhsb.dtype),   # wavefront ring
            pltpu.VMEM((Km, D, BS, W), rhsb.dtype),          # acc (cu / sol)
            pltpu.VMEM((Km, D, BS, W), rhsb.dtype),          # t/s re
            pltpu.VMEM((Km, D, BS, W), rhsb.dtype),          # t/s im
        ] if _HAVE_PLTPU else [],
        # the level grid axis is a sequential dependence (ring carries the
        # upwind wavefronts); the unrolled D-loops need more scoped VMEM than
        # the 16 MB default (v5e has 128 MB)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ) if (_HAVE_PLTPU and not interpret) else None,
        interpret=interpret,
    )(rhsb, cpl, cin, oh, pre, pim, qre, qim, lre, lim, valid, vg)
