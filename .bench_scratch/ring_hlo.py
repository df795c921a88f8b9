import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax
import __graft_entry__ as ge

solver = ge._build_problem(nx=16, order=2, polar=4, azimuth=16, nspec=20,
                           cache_policy='eigen')
u, Tc, Tv = solver.initial_state()
step = jax.jit(solver._step_impl)
comp = step.lower(solver.consts, u, Tc, Tv).compile()
txt = comp.as_text()
open("/tmp/ring_hlo.txt", "w").write(txt)
print("bytes:", len(txt))
