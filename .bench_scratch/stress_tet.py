import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from pbte_tpu import mesh as pmesh
from pbte_tpu.angular import quadrature as ang
from pbte_tpu.fem import assembly
from pbte_tpu.material import nongray_smrt as mat
from pbte_tpu.solver.source_iteration import SourceIterationSolver

t0 = time.time()
m = pmesh.uniform_refine(pmesh.load_builtin("unit-cube-tet").scaled(1e-6), 2)
ops = assembly.assemble(pmesh.connect(m), order=3, face_mode='consistent')
quad = ang.build(ang.AngularOptions(dimension=3, polar_points=4, azimuth_points=16))
tables = mat.build_tables(mat.SILICON, num_spectral=20)
bcs = {a: (0.5 if a == 6 else -0.5) for a in range(1, 7)}
solver = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float32,
                               cache_policy='on-the-fly')
print(f"setup {time.time()-t0:.1f}s mode={solver.sweep_mode} ne={solver.ne} "
      f"D={solver.D} ncls={solver.ncls_ring} H={getattr(solver,'_ring_H',0)} "
      f"L={solver.L} W={solver.W}", flush=True)
u, Tc, Tv = solver.initial_state()
t0 = time.time()
u, Tc, Tv, r = solver.step(u, Tc, Tv)
print(f"first {float(r):.4f} ({time.time()-t0:.1f}s)", flush=True)
t0 = time.perf_counter()
for _ in range(5):
    u, Tc, Tv, r = solver.step(u, Tc, Tv)
rv = float(r)
dt = (time.perf_counter() - t0) / 5
dofs = solver.ne * solver.D * solver.K * solver.BS
print(f"stress-tet step: {dt*1e3:.2f} ms  DOF/s {dofs/dt:.3e} residual={rv:.5f}", flush=True)
