import sys, time, os
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp, numpy as np
from pbte_tpu import mesh as pmesh
from pbte_tpu.angular import quadrature as ang
from pbte_tpu.fem import assembly
from pbte_tpu.material import nongray_smrt as mat
from pbte_tpu.solver.source_iteration import SourceIterationSolver

nx = int(os.environ.get("NX", 6))
m = pmesh.make_cartesian_3d(nx,nx,nx,"hex").scaled(1e-6)
ops = assembly.assemble(pmesh.connect(m), order=2, face_mode="consistent")
quad = ang.build(ang.AngularOptions(dimension=3, polar_points=8, azimuth_points=8))
tables = mat.build_tables(mat.SILICON, 20)
bcs = {a: (0.5 if a==6 else -0.5) for a in range(1,7)}
res = {}
for pal in (True, False):
    t0=time.time()
    solver = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float32,
                                   cache_policy="eigen", use_pallas=pal)
    su = time.time()-t0
    u, Tc, Tv = solver.initial_state()
    t0=time.time()
    u, Tc, Tv2, r = solver.step(u, Tc, Tv); _ = float(r)
    comp = time.time()-t0
    prev=Tv2; t0=time.time()
    for _ in range(10):
        u, Tc, Tv2, r = solver.step(u, Tc, prev)
        prev = Tv2
    rv=float(r); dt=time.time()-t0
    dofs = 10*solver.K*solver.BS*solver.ne*solver.D/dt
    res[pal] = np.asarray(Tc)
    print("use_pallas=%d: setup %.0fs compile %.1fs %.1f ms/step DOF/s=%.3e r=%.4f"
          % (pal, su, comp, dt/10*1000, dofs, rv), flush=True)
print("Tc agree:", np.abs(res[True]-res[False]).max())
