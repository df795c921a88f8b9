"""Kernel-level MFU of the batched sweep contraction (the north-star says
"≥60% TPU peak FLOPs in batched sweep kernels" — BASELINE.json; whole-step
MFU in bench.py additionally pays per-level HBM streaming of state/ys, so
this isolates the KERNEL: the folded transport matmul
``sol = [B | -vg*B*C_f] @ [rhs; un_f]`` exactly as the ring body emits it
(pbte_tpu/solver/source_iteration.py, the ``kbiJ,kJbw->kibw`` einsum),
including its real per-level staging — the shifted-carry reads, the bf16
xcat concatenation, and the carry update.

Chained inside ONE lax.scan per jit call: separate jit dispatches cost ~1 ms
each on the tunneled platform and would swamp sub-ms kernels (measured,
round 3). Each level's input is the previous level's output, like the real
sweep.

Modes (PBTE_KMFU_MODE):
  staged  — full per-level staging as in the solver body (default)
  pure    — the bare matmul with a carried xcat (isolates MXU emission rate)

Shapes default to the flagship ring level (Km=8 direction groups, BS=40
bands, D=27 p=2 dofs, J=(1+3)*D folded contraction, W=256 lane slots);
PBTE_KMFU_ORDER=3 switches to the p=3 kernel (D=64, J=256).

Prints one JSON line with tf_per_s and frac_f32_peak (measured 88 TF/s
chip peak, BASELINE.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEASURED_F32_PEAK = 88e12


def main() -> None:
    import jax

    # the environment's sitecustomize force-sets JAX_PLATFORMS=axon; a config
    # update before any device access is the only effective override
    platform = os.environ.get("PBTE_KMFU_PLATFORM", "")
    if platform:
        jax.config.update("jax_platforms", platform)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache",
            ),
        ),
    )
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    mode = os.environ.get("PBTE_KMFU_MODE", "staged")
    order = int(os.environ.get("PBTE_KMFU_ORDER", 2))
    D = (order + 1) ** 3
    Km = int(os.environ.get("PBTE_KMFU_KM", 8))
    BS = int(os.environ.get("PBTE_KMFU_BS", 40))
    W = int(os.environ.get("PBTE_KMFU_W", 256))
    nf_act = 3  # active upwind faces per direction group on a 3D lattice
    J = (1 + nf_act) * D
    levels = int(os.environ.get("PBTE_KMFU_LEVELS", 2000))
    shifts = (0, 1, 16)  # the three lattice strides at hex-16^3

    rng = np.random.default_rng(0)
    bcat = jnp.asarray(
        rng.standard_normal((Km, BS, D, J)) / np.sqrt(J), jnp.bfloat16
    )
    ring0 = jnp.asarray(rng.standard_normal((Km, D, BS, W)), jnp.bfloat16)
    cin = jnp.asarray(rng.uniform(0.4, 0.6, (nf_act, Km, W)), jnp.float32)
    rhs0 = jnp.asarray(rng.standard_normal((Km, D, BS, W)), jnp.bfloat16)
    xcat0 = jnp.asarray(rng.standard_normal((Km, J, BS, W)), jnp.bfloat16)

    if mode == "staged":

        def body(ring, _):
            # mirror of the solver body: rhs is a cheap VPU expression there;
            # here a carried tensor stands in (same HBM read) and the three
            # shifted reads + bf16 concat + folded matmul are identical
            parts = [rhs0]
            for fi, s in enumerate(shifts):
                yf = ring
                if s:
                    yf = jnp.pad(
                        yf[..., :-s], ((0, 0), (0, 0), (0, 0), (s, 0))
                    )
                parts.append(
                    (yf * cin[fi][:, None, None, :]).astype(jnp.bfloat16)
                )
            xcat = jnp.concatenate(parts, axis=1)
            sol = jnp.einsum(
                "kbiJ,kJbw->kibw", bcat, xcat,
                preferred_element_type=jnp.float32,
            )
            return sol.astype(jnp.bfloat16), None

        carry0 = ring0
    elif mode == "pure":

        def body(xcat, _):
            sol = jnp.einsum(
                "kbiJ,kJbw->kibw", bcat, xcat,
                preferred_element_type=jnp.float32,
            )
            # feed the output back as the next xcat (tile D -> J) so levels
            # stay data-dependent; the tile is a cheap VPU broadcast
            nxt = jnp.concatenate([sol] * (J // D), axis=1)
            return nxt.astype(jnp.bfloat16), None

        carry0 = xcat0
    else:
        raise SystemExit(f"unknown PBTE_KMFU_MODE={mode}")

    @jax.jit
    def chain(c):
        c, _ = lax.scan(body, c, None, length=levels)
        return c[0, 0, 0, 0]

    t0 = time.time()
    _ = float(chain(carry0))
    print(f"[kmfu] compile+first: {time.time()-t0:.1f}s "
          f"mode={mode} D={D} J={J} Km={Km} BS={BS} W={W} levels={levels} "
          f"device={jax.devices()[0]}", file=sys.stderr)

    reps = int(os.environ.get("PBTE_KMFU_REPS", 3))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        _ = float(chain(carry0))
        best = min(best, time.time() - t0)
    flops = 2.0 * Km * BS * D * J * W * levels
    tf = flops / best / 1e12
    print(f"[kmfu] best {best*1e3:.1f} ms for {levels} levels "
          f"({flops/levels/1e9:.3f} GF/level) at {tf:.1f} TF/s = "
          f"{tf*1e12/MEASURED_F32_PEAK:.1%} of measured f32 peak",
          file=sys.stderr)
    rec = {
        "metric": "sweep_kernel_tf_per_s",
        "value": tf,
        "unit": "TF/s",
        "mode": mode,
        "order": order,
        "shape": {"Km": Km, "D": D, "J": J, "BS": BS, "W": W},
        "frac_f32_peak": tf * 1e12 / MEASURED_F32_PEAK,
        "best_ms": best * 1e3,
        "levels": levels,
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_artifacts", f"kernel_mfu_{mode}_p{order}.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
