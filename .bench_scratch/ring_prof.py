import sys; sys.path.insert(0, "/root/repo")
import time, glob, gzip, json, collections
import numpy as np, jax
import __graft_entry__ as ge

solver = ge._build_problem(nx=16, order=2, polar=4, azimuth=16, nspec=20,
                           cache_policy='eigen')
u, Tc, Tv = solver.initial_state()
step = jax.jit(solver._step_impl)
u, Tc, Tv, r = step(solver.consts, u, Tc, Tv); print(float(r), flush=True)
with jax.profiler.trace("/tmp/ringtrace"):
    for _ in range(3):
        u, Tc, Tv, r = step(solver.consts, u, Tc, Tv)
    print(float(r), flush=True)
print("trace done", flush=True)
