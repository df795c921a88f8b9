import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax
import __graft_entry__ as ge

solver = ge._build_problem(nx=16, order=2, polar=4, azimuth=16, nspec=20,
                           cache_policy='eigen')
u, Tc, Tv = solver.initial_state()
u, Tc, Tv, r = solver.step(u, Tc, Tv); print(float(r), flush=True)
with jax.profiler.trace("/tmp/ringtrace2"):
    for _ in range(3):
        u, Tc, Tv, r = solver.step(u, Tc, Tv)
    print(float(r), flush=True)
