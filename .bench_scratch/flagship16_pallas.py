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
bcs = {1: -0.5, 2: -0.5, 3: -0.5, 4: -0.5, 5: -0.5, 6: 0.5}
print(f"assembled {time.time()-t0:.1f}s", flush=True)
solver = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float32,
                               cache_policy='eigen', use_pallas=True)
print(f"setup total {time.time()-t0:.1f}s H={solver._fused['H'] if solver._fused else None} "
      f"km_chunk={solver._fused.get('km_chunk') if solver._fused else None} "
      f"L={solver.L} W={solver.W} padded={solver.padded}", flush=True)
u, Tc, Tv = solver.initial_state()
t0 = time.time()
u, Tc, Tv, r = solver.step(u, Tc, Tv)
print(f"first step (compile+run) {time.time()-t0:.1f}s residual={float(r):.6f}", flush=True)
t0 = time.perf_counter()
N = 5
for _ in range(N):
    u, Tc, Tv, r = solver.step(u, Tc, Tv)
rv = float(r)
dt = (time.perf_counter() - t0) / N
dofs = solver.ne * solver.D * solver.K * solver.BS
print(f"pallas step: {dt*1e3:.2f} ms  DOF/s: {dofs/dt:.3e}  residual={rv:.6f}", flush=True)
