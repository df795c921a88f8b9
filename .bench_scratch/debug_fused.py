import sys, os
sys.path.insert(0, "/root/repo")
import jax
if os.environ.get("DEVICE") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp, numpy as np
from pbte_tpu import mesh as pmesh
from pbte_tpu.angular import quadrature as ang
from pbte_tpu.fem import assembly
from pbte_tpu.material import nongray_smrt as mat
from pbte_tpu.solver.source_iteration import SourceIterationSolver

nx = int(os.environ.get("NX", 2))
p = int(os.environ.get("ORDER", 1))
m = pmesh.make_cartesian_3d(nx, nx, nx, "hex").scaled(1e-6)
ops = assembly.assemble(pmesh.connect(m), order=p, face_mode="consistent")
quad = ang.build(ang.AngularOptions(dimension=3, polar_points=4, azimuth_points=4))
tables = mat.build_tables(mat.SILICON, 2)
bcs = {a: (0.5 if a == 6 else -0.5) for a in range(1, 7)}

sp = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float32,
                           cache_policy="eigen", use_pallas=True)
sx = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float32,
                           cache_policy="eigen", use_pallas=False)
print("G Km D BS L W nf:", sp.G, sp.Km, sp.D, sp.BS, sp.L, sp.W, sp.nf,
      "km_chunk", sp._fused["km_chunk"], flush=True)

up, Tcp, Tvp = sp.initial_state()
ux, Tcx, Tvx = sx.initial_state()
hist = []
for it in range(4):
    up, Tcp, Tvp, rp = sp.step(up, Tcp, Tvp)
    ux, Tcx, Tvx, rx = sx.step(ux, Tcx, Tvx)
    print("it%d: rp=%.6f rx=%.6f dTc=%.3e" % (
        it, float(rp), float(rx),
        np.abs(np.asarray(Tcp) - np.asarray(Tcx)).max()), flush=True)
    hist.append((np.asarray(Tcp), np.asarray(Tcx)))
np.save("/tmp/tc_%s.npy" % os.environ.get("TAG", "x"),
        np.asarray(hist))
