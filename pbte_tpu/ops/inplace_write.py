"""Pallas TPU kernel: in-place column-window write into the sweep state.

Profiling the outer step on TPU v5e showed `dynamic-update-slice` of the
level solution into the (Km, BS, D, ne) sweep state plus the copies XLA
inserts around it costing ~30 ms/step (~40% of the whole step): inside the
level scan XLA does not prove the carry update can be done in place and
materializes copies of the ~400 MB state.

This kernel keeps the state in HBM (memory_space ANY), aliases it as its own
output (`input_output_aliases`), and DMAs ONLY the W-column window from VMEM
into the right offset — a true in-place update touching W/ne of the buffer.

STATUS: Mosaic currently rejects the dynamic lane-dimension window
(`tpu.memref_slice` of a (.., 27)-wide window at a dynamic, non-128-aligned
offset), so the solver does not use this kernel yet; microbenchmarks also
showed the real cost is a ~1.3 ms fixed per-scan-iteration overhead on this
platform rather than copy-on-write, so the fix belongs in a fully-fused level
step (next round). Kept with its CPU fallback as the documented attempt.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-specific bits are optional so the CPU fallback path still imports
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except ImportError:  # pragma: no cover
    _HAVE_PLTPU = False


def _kernel(off_ref, u_hbm, sol_ref, out_hbm):
    # one program: DMA the (Km, BS, D, W) solution window into the state
    def body(sem):
        off = off_ref[0]
        dma = pltpu.make_async_copy(
            sol_ref,
            out_hbm.at[:, :, :, pl.ds(off, sol_ref.shape[-1])],
            sem,
        )
        dma.start()
        dma.wait()

    pl.run_scoped(body, pltpu.SemaphoreType.DMA)


def write_window(u_g, sol, off, *, interpret: bool | None = None):
    """u_g (Km, BS, D, ne), sol (Km, BS, D, W), off scalar int32 ->
    u_g with columns [off, off+W) replaced, updated IN PLACE (u_g donated)."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    if not _HAVE_PLTPU or interpret:
        # interpreter / CPU fallback: plain functional update
        return jax.lax.dynamic_update_slice_in_dim(u_g, sol, off, axis=-1)
    off_arr = jnp.asarray(off, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # u stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # sol DMA'd directly
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(u_g.shape, u_g.dtype),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},  # u_g (arg after prefetch) aliases out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(off_arr, u_g, sol)
