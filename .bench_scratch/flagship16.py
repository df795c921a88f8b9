"""Flagship hex-16^3 (ne=4096) scan-path timing, eigen+class policy."""
import sys; sys.path.insert(0, "/root/repo")
import time, sys
import numpy as np, jax
import __graft_entry__ as ge

t0 = time.time()
solver = ge._build_problem(nx=16, order=2, polar=4, azimuth=16, nspec=20,
                           cache_policy='eigen')
print(f"setup: {time.time()-t0:.1f}s ncls={solver.ncls} G={solver.G} "
      f"Km={solver.Km} L={solver.L} W={solver.W} segments={solver.segments}",
      flush=True)
u, Tc, Tv = solver.initial_state()
step = jax.jit(solver._step_impl)
t0 = time.time()
u, Tc, Tv, r = step(solver.consts, u, Tc, Tv)
print("first residual:", float(r), f"(compile+run {time.time()-t0:.1f}s)", flush=True)
t0 = time.perf_counter()
N = 10
for _ in range(N):
    u, Tc, Tv, r = step(solver.consts, u, Tc, Tv)
rv = float(r)  # device sync (block_until_ready unreliable on axon)
dt = (time.perf_counter() - t0) / N
ne, D, K, BS = solver.ne, solver.D, solver.K, solver.BS
dofs = ne * D * K * BS
print(f"step: {dt*1e3:.2f} ms  DOF/s: {dofs/dt:.3e}  residual={rv:.6f}", flush=True)
