import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from pbte_tpu import mesh as pmesh
from pbte_tpu.angular import quadrature as ang
from pbte_tpu.fem import assembly
from pbte_tpu.material import nongray_smrt as mat
from pbte_tpu.solver.source_iteration import SourceIterationSolver

t0 = time.time()
m = pmesh.make_cartesian_3d(16, 16, 16, 'hex').scaled(1e-6)
ops = assembly.assemble(pmesh.connect(m), order=2, face_mode='consistent')
quad = ang.build(ang.AngularOptions(dimension=3, polar_points=4, azimuth_points=16))
tables = mat.build_tables(mat.SILICON, num_spectral=20)
bcs = {a: (0.5 if a == 6 else -0.5) for a in range(1, 7)}
solver = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float32,
                               cache_policy='eigen', scan_unroll=2)
print(f"setup {time.time()-t0:.1f}s", flush=True)
u, Tc, Tv = solver.initial_state()
t0 = time.time()
u, Tc, Tv, r = solver.step(u, Tc, Tv)
print(f"first {float(r):.4f} ({time.time()-t0:.1f}s)", flush=True)
t0 = time.perf_counter()
for _ in range(10):
    u, Tc, Tv, r = solver.step(u, Tc, Tv)
rv = float(r)
dt = (time.perf_counter() - t0) / 10
print(f"unroll=2 step: {dt*1e3:.2f} ms  DOF/s {solver.ne*solver.D*solver.K*solver.BS/dt:.3e}", flush=True)
