"""Ablate the ring body at exact flagship shapes (G=8 vmapped)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
from jax import lax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

G, Km, BS, D, W, L, nf = 8, 10, 40, 27, 192, 46, 6
NE = L * W
dt = jnp.float32
key = jax.random.PRNGKey(0)

def timeit(f, *args, n=8):
    def sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf[(0,) * leaf.ndim])
    r = f(*args); sync(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    sync(r)
    return (time.time() - t0) / n

rhsb = jax.random.normal(key, (G, Km, BS, D, NE), dt) * 0.01
cin = jax.random.normal(key, (G, Km, nf, NE), dt) * 0.1
oh = jax.random.normal(key, (G, L, W, nf * W), dt) * 0.01
Cf = jax.random.normal(key, (G, nf, D, D), dt) * 0.1
Ainv = jax.random.normal(key, (G, 1, Km, BS, D, D), dt) * 0.1
offs = jnp.arange(L, dtype=jnp.int32) * W

def make(variant):
    @jax.jit
    def step(rhsb, cin, oh, Cf, Ainv):
        def group(rhs_g, cin_g, oh_g, Cf_g, Ainv_g):
            ring0 = jnp.zeros((Km, BS, D, W), dt)
            def body(ring, xs):
                off, oh_l = xs
                rhs = lax.dynamic_slice_in_dim(rhs_g, off, W, axis=-1)
                if variant >= 2:
                    cin_l = lax.dynamic_slice_in_dim(cin_g, off, W, axis=-1)
                    un = jnp.einsum("kbdv,vx->kbdx", ring, oh_l).reshape(
                        Km, BS, D, nf, W)
                    if variant >= 3:
                        term = jnp.einsum("fij,kfw,kbjfw->kbiw", Cf_g, cin_l, un)
                        rhs = rhs - term
                    else:
                        rhs = rhs - 0.001 * un.sum(3)
                if variant >= 4:
                    sol = jnp.einsum("kbij,kbjw->kbiw", Ainv_g[0], rhs)
                else:
                    sol = rhs
                return sol, sol
            _, ys = lax.scan(body, ring0, (offs, oh_g))
            if variant >= 5:
                return jnp.moveaxis(ys, 0, 3).reshape(Km, BS, D, NE)
            return ys
        return jax.vmap(group)(rhsb, cin, oh, Cf, Ainv)
    return step

names = {1: "slice+ys only", 2: "+onehot", 3: "+coupling", 4: "+apply", 5: "+final transpose"}
import sys as _s
which = [int(x) for x in _s.argv[1:]] or [1, 2, 3, 4, 5]
for v in which:
    d = timeit(make(v), rhsb, cin, oh, Cf, Ainv)
    print(f"v{v} {names[v]:20s}: {d*1e3:8.2f} ms/step {d/L*1e6:8.1f} us/level", flush=True)
