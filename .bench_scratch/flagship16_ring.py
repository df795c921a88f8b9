import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax
import __graft_entry__ as ge

t0 = time.time()
solver = ge._build_problem(nx=16, order=2, polar=4, azimuth=16, nspec=20,
                           cache_policy='eigen')
print(f"setup: {time.time()-t0:.1f}s mode={solver.sweep_mode} "
      f"ncls={solver.ncls_ring} H={getattr(solver,'_ring_H',None)} "
      f"canon={solver._canonical_faces} L={solver.L} W={solver.W}", flush=True)
u, Tc, Tv = solver.initial_state()
t0 = time.time()
u, Tc, Tv, r = solver.step(u, Tc, Tv)
print(f"first: residual={float(r):.6f} (compile+run {time.time()-t0:.1f}s)", flush=True)
t0 = time.perf_counter()
N = 10
for _ in range(N):
    u, Tc, Tv, r = solver.step(u, Tc, Tv)
rv = float(r)
dt = (time.perf_counter() - t0) / N
dofs = solver.ne * solver.D * solver.K * solver.BS
print(f"ring step: {dt*1e3:.2f} ms  DOF/s: {dofs/dt:.3e}  residual={rv:.6f}", flush=True)
