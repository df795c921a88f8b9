import sys, time
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

def run(nx, K=(8,8), order=2, steps=10, nspec=20):
    t0=time.time()
    m = pmesh.make_cartesian_3d(nx,nx,nx,"hex").scaled(1e-6)
    ops = assembly.assemble(pmesh.connect(m), order=order, face_mode="consistent")
    t_asm = time.time()-t0
    quad = ang.build(ang.AngularOptions(dimension=3, polar_points=K[0], azimuth_points=K[1]))
    tables = mat.build_tables(mat.SILICON, nspec)
    bcs = {a: (0.5 if a==6 else -0.5) for a in range(1,7)}
    t0=time.time()
    solver = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float32)
    t_setup = time.time()-t0
    u, Tc, Tv = solver.initial_state()
    t0=time.time()
    u, Tc, Tv2, r = solver.step(u, Tc, Tv)
    fr = float(r); t_compile = time.time()-t0
    prev=Tv2
    t0=time.time()
    for _ in range(steps):
        u, Tc, Tv2, r = solver.step(u, Tc, prev)
        prev = Tv2
    rv=float(r); dt=time.time()-t0
    dofs = steps*solver.K*solver.BS*solver.ne*solver.D/dt
    print(f"nx={nx} ne={solver.ne} K={solver.K}: asm {t_asm:.0f}s setup {t_setup:.0f}s "
          f"compile {t_compile:.1f}s {dt/steps*1000:.0f} ms/step DOF/s={dofs:.3e} "
          f"L={solver.L} W={solver.W}", flush=True)

import os
nx = int(os.environ.get("NX", 6))
K1 = int(os.environ.get("K1", 8)); K2 = int(os.environ.get("K2", 8))
run(nx, K=(K1,K2))
