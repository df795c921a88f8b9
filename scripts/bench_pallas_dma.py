"""Pallas DMA-pipeline bandwidth exploration (round 5).

The flagship Pallas ring kernel is DMA-bound: the r5 A/B
(bench_artifacts/pallas_ring_v2_ab.json) measured the auto-pipelined Pallas
streaming copy at ~382 GB/s where the plain XLA copy reaches ~814 GB/s on
this chip — i.e. the kernel leaves ~2x bandwidth on the table. This script
measures copy bandwidth across:

  - xla:            y = x (device copy, the upper bound)
  - auto/<blockMB>: pallas_call auto-pipeline, grid over chunks
  - manual/<bufs>x<blockMB>: one grid step, refs in ANY (HBM), explicit
    make_async_copy chunks with N in-flight buffers (true multi-buffering;
    the auto pipeline double-buffers only)

Timing protocol (this tunneled platform): chained dispatches, sync by
fetching one element — single-shot timings carry ~40 ms dispatch+fetch
overhead. First call per shape is discarded (compile).

Writes bench_artifacts/pallas_dma_bw.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

LANE = 128
SUB = 8


def _time(fn, x, reps=20):
    y = fn(x)
    _ = float(y.ravel()[0])  # sync (block_until_ready returns early on axon)
    t0 = time.time()
    for _ in range(reps):
        y = fn(y)
    _ = float(y.ravel()[0])
    return (time.time() - t0) / reps


def xla_copy():
    @jax.jit
    def f(x):
        return x + 0.0

    return f


def auto_copy(rows_per_block, total_rows):
    grid = (total_rows // rows_per_block,)

    def kern(x_ref, y_ref):
        y_ref[...] = x_ref[...]

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[pl.BlockSpec((rows_per_block, LANE),
                                   lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rows_per_block, LANE), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((total_rows, LANE), x.dtype),
        )(x)

    return f


def manual_copy(rows_per_block, total_rows, n_bufs):
    """Explicit multi-buffered DMA: n_bufs input buffers + n_bufs output
    buffers, VMEM copy between (standing in for compute). The input DMA for
    chunk i+n_bufs is only started after the VMEM copy frees in_scratch[slot];
    the output DMA for chunk i-n_bufs is waited before out_scratch[slot] is
    overwritten — no slot races."""
    nchunks = total_rows // rows_per_block

    def kern(x_hbm, y_hbm, in_scr, out_scr, in_sems, out_sems):
        def in_dma(slot, i):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * rows_per_block, rows_per_block)],
                in_scr.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, i):
            return pltpu.make_async_copy(
                out_scr.at[slot],
                y_hbm.at[pl.ds(i * rows_per_block, rows_per_block)],
                out_sems.at[slot],
            )

        for w in range(min(n_bufs, nchunks)):
            in_dma(w, w).start()

        def body(i, _):
            slot = jax.lax.rem(i, n_bufs)
            in_dma(slot, i).wait()

            # out_scr[slot] must be free before we overwrite it
            @pl.when(i >= n_bufs)
            def _():
                out_dma(slot, i - n_bufs).wait()

            out_scr[slot] = in_scr[slot]  # "compute"
            out_dma(slot, i).start()

            # in_scr[slot] is free again after the VMEM copy above
            @pl.when(i + n_bufs < nchunks)
            def _():
                in_dma(slot, i + n_bufs).start()

            return 0

        jax.lax.fori_loop(0, nchunks, body, 0)
        for w in range(min(n_bufs, nchunks)):
            i = nchunks - min(n_bufs, nchunks) + w
            out_dma(i % n_bufs, i).wait()

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((total_rows, LANE), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((n_bufs, rows_per_block, LANE), jnp.float32),
                pltpu.VMEM((n_bufs, rows_per_block, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((n_bufs,)),
                pltpu.SemaphoreType.DMA((n_bufs,)),
            ],
        )(x)

    return f


def main():
    total_mb = float(os.environ.get("DMA_TOTAL_MB", 512))
    total_rows = int(total_mb * 1e6 / (LANE * 4) // SUB * SUB)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(total_rows, LANE)),
        dtype=jnp.float32,
    )
    nbytes = x.nbytes * 2  # read + write
    rows = {}

    def run(name, fn, reps=15):
        try:
            dt = _time(fn, x, reps)
            bw = nbytes / dt / 1e9
            rows[name] = round(bw, 1)
            print(f"{name:24s} {dt*1e3:8.2f} ms  {bw:7.1f} GB/s", flush=True)
        except Exception as e:
            rows[name] = f"ERROR: {type(e).__name__}: {e}"[:200]
            print(f"{name:24s} FAILED: {e}", flush=True)

    run("xla", xla_copy())
    for mb in (0.5, 1, 2, 4, 8):
        rpb = int(mb * 1e6 / (LANE * 4) // SUB * SUB)
        if total_rows % rpb:
            rpb = total_rows // (total_rows // rpb)
            rpb = rpb // SUB * SUB
            while total_rows % rpb:
                rpb -= SUB
        run(f"auto/{mb}MB", auto_copy(rpb, total_rows))
    for mb in (0.5, 1, 2, 4, 8):
        rpb = int(mb * 1e6 / (LANE * 4) // SUB * SUB)
        while total_rows % rpb:
            rpb -= SUB
        for bufs in (2, 3, 4):
            run(f"manual/{bufs}x{mb}MB", manual_copy(rpb, total_rows, bufs))

    out = {
        "metric": "pallas_dma_copy_bandwidth",
        "hardware": str(jax.devices()[0]),
        "total_mb_each_way": total_mb,
        "gbs": rows,
        "protocol": "chained dispatches, first-element fetch sync, "
                    "reps>=15, bytes = read+write",
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_artifacts", "pallas_dma_bw.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
