"""Profile the real solver step at hex nx^3 with class-eigen on the TPU."""
import sys, time, glob, gzip, json, os
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp
import numpy as np
from pbte_tpu import mesh as pmesh
from pbte_tpu.angular import quadrature as ang
from pbte_tpu.fem import assembly
from pbte_tpu.material import nongray_smrt as mat
from pbte_tpu.solver.source_iteration import SourceIterationSolver

NX = int(os.environ.get("NX", 16))
t0 = time.time()
m = pmesh.make_cartesian_3d(NX, NX, NX, "hex").scaled(1e-6)
topo = pmesh.connect(m)
print(f"mesh+connect: {time.time()-t0:.1f}s", flush=True)
ops = assembly.assemble(topo, order=2, face_mode="consistent")
print(f"assemble: {time.time()-t0:.1f}s", flush=True)
quad = ang.build(ang.AngularOptions(dimension=3, polar_points=8, azimuth_points=8))
tables = mat.build_tables(mat.SILICON, 20)
bcs = {a: (0.5 if a == 6 else -0.5) for a in range(1, 7)}
solver = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float32,
                               cache_policy="eigen")
print(f"solver setup: {time.time()-t0:.1f}s  ncls={solver.ncls} "
      f"G={solver.G} Km={solver.Km} L={solver.L} W={solver.W} "
      f"segments={solver.segments}", flush=True)

u, Tc, Tv = solver.initial_state()
t1 = time.time()
u, Tc, Tv2, r = solver.step(u, Tc, Tv)
print(f"compile+first step: {time.time()-t1:.1f}s res={float(r):.4f}", flush=True)

prev = Tv2
t1 = time.time()
N = 10
for _ in range(N):
    u, Tc, Tv2, r = solver.step(u, Tc, prev)
    prev = Tv2
_ = float(r)
dt = (time.time() - t1) / N
K, BS, ne, D = solver.K, solver.BS, solver.ne, solver.D
print(f"step: {dt*1e3:.1f} ms -> {K*BS*ne*D/dt:.4g} DOF/s", flush=True)

with jax.profiler.trace("/tmp/jaxtrace16"):
    for _ in range(2):
        u, Tc, Tv2, r = solver.step(u, Tc, prev)
        prev = Tv2
    _ = float(r)
files = glob.glob("/tmp/jaxtrace16/**/*.trace.json.gz", recursive=True)
if files:
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    from collections import defaultdict
    tot = defaultdict(float); cnt = defaultdict(int)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            n = ev.get("name", "?")
            if n.startswith("$"):
                continue
            tot[n] += ev["dur"]; cnt[n] += 1
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:28]:
        print(f"{us/1000:9.2f} ms  x{cnt[name]:5d}  {name[:100]}")
