import sys, time, os, glob, gzip, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp
from pbte_tpu import mesh as pmesh
from pbte_tpu.angular import quadrature as ang
from pbte_tpu.fem import assembly
from pbte_tpu.material import nongray_smrt as mat
from pbte_tpu.solver.source_iteration import SourceIterationSolver

m = pmesh.make_cartesian_3d(6,6,6,"hex").scaled(1e-6)
ops = assembly.assemble(pmesh.connect(m), order=2, face_mode="consistent")
quad = ang.build(ang.AngularOptions(dimension=3, polar_points=8, azimuth_points=8))
tables = mat.build_tables(mat.SILICON, 20)
bcs = {a: (0.5 if a==6 else -0.5) for a in range(1,7)}
solver = SourceIterationSolver(ops, quad, tables, bcs, dtype=jnp.float32, cache_policy="eigen")
u, Tc, Tv = solver.initial_state()
u, Tc, Tv2, r = solver.step(u, Tc, Tv); _ = float(r)
prev = Tv2
with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(3):
        u, Tc, Tv2, r = solver.step(u, Tc, prev)
        prev = Tv2
    _ = float(r)
print("trace done", flush=True)
# parse
files = glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
if files:
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    from collections import defaultdict
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            pidn = ev.get("pid")
            tot[name] += ev["dur"]
            cnt[name] += 1
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:25]
    for name, us in top:
        print(f"{us/1000:9.2f} ms  x{cnt[name]:5d}  {name[:90]}")
