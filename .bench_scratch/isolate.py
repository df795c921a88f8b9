"""Isolate the pathological op in the ring body."""
import time
import jax, jax.numpy as jnp
from jax import lax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

Km, BS, D, W, L, H, nf = 12, 40, 27, 256, 46, 2, 6
dt = jnp.float32
key = jax.random.PRNGKey(0)

def timeit(f, *args, n=20):
    r = f(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], r)
    return (time.time() - t0) / n

rhsb = jax.random.normal(key, (L, Km, BS, D, W), dt)
Ac = jax.random.normal(key, (Km, D, D), dt)
Cf = jax.random.normal(key, (nf, D, D), dt)
cin = jax.random.normal(key, (L, Km, nf, W), dt)
nbr1 = jax.random.randint(key, (L, nf, W), 0, W, jnp.int32)

# 1) scan streaming xs only (read rhs, write ys)
@jax.jit
def xs_only(rhsb):
    def body(c, rhs):
        return c, rhs * 1.0001
    _, ys = lax.scan(body, jnp.zeros((1,), dt), rhsb)
    return ys

# 2) + class solve einsum
@jax.jit
def xs_solve(rhsb, Ac):
    def body(c, rhs):
        sol = jnp.einsum("kij,kbjw->kbiw", Ac, rhs)
        return c, sol
    _, ys = lax.scan(body, jnp.zeros((1,), dt), rhsb)
    return ys

# 3) carry prev + solve, NO gather, NO coupling
@jax.jit
def prev_solve(rhsb, Ac):
    prev0 = jnp.zeros((Km, BS, D, W), dt)
    def body(prev, rhs):
        sol = jnp.einsum("kij,kbjw->kbiw", Ac, rhs - 0.01 * prev)
        return sol, sol
    _, ys = lax.scan(body, prev0, rhsb)
    return ys

# 4) + gather (no coupling einsum): sum over faces of gathered
@jax.jit
def prev_gather(rhsb, nbr1, Ac):
    prev0 = jnp.zeros((Km, BS, D, W), dt)
    def body(prev, xs):
        rhs, idx = xs
        un = prev[:, :, :, idx]  # (Km,BS,D,nf,W)
        sol = jnp.einsum("kij,kbjw->kbiw", Ac, rhs - 0.01 * un.sum(3))
        return sol, sol
    _, ys = lax.scan(body, prev0, (rhsb, nbr1))
    return ys

# 5) coupling einsum alone (two-step: weight then couple), no gather
@jax.jit
def prev_couple(rhsb, cin, Ac, Cf):
    prev0 = jnp.zeros((Km, BS, D, W), dt)
    def body(prev, xs):
        rhs, ci = xs
        un = jnp.broadcast_to(prev[:, :, :, None, :], (Km, BS, D, nf, W))
        uw = jnp.einsum("kfw,kbjfw->kbjfw", ci, un)
        term = jnp.einsum("fij,kbjfw->kbiw", Cf, uw)
        sol = jnp.einsum("kij,kbjw->kbiw", Ac, rhs - term)
        return sol, sol
    _, ys = lax.scan(body, prev0, (rhsb, cin))
    return ys

for name, f, args in [
    ("xs-only", xs_only, (rhsb,)),
    ("xs+solve", xs_solve, (rhsb, Ac)),
    ("prev+solve", prev_solve, (rhsb, Ac)),
    ("prev+gather+solve", prev_gather, (rhsb, nbr1, Ac)),
    ("prev+couple+solve", prev_couple, (rhsb, cin, Ac, Cf)),
]:
    d = timeit(f, *args)
    print(f"{name:20s} {d*1e3:8.2f} ms/scan  {d/L*1e6:8.1f} us/level")
