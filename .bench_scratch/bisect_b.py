"""Bisect the prev-onehot body: which op costs 600 ms/level?"""
import time, sys
import jax, jax.numpy as jnp
from jax import lax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

G, Km, BS, D, NE, W, L, nf = 8, 12, 40, 27, 4096, 256, 16, 6
dt = jnp.float32
key = jax.random.PRNGKey(0)
offs = jnp.arange(L, dtype=jnp.int32) * ((NE - W) // max(L - 1, 1))

def timeit(f, *args, n=5):
    r = f(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], r)
    return (time.time() - t0) / n

rhsb = jax.random.normal(key, (G, Km, BS, D, NE), dt)
Ac = jax.random.normal(key, (G, Km, BS, D, D), dt)
Cf = jax.random.normal(key, (G, nf, D, D), dt)
cin = jax.random.normal(key, (G, Km, nf, NE), dt)
oh_prev = jax.random.normal(key, (L, W, nf * W), dt) * 0.01

def make(variant):
    @jax.jit
    def run(rhsb, Ac, Cf, cin, oh_prev):
        def group(rhs_g, A_g, C_g, ci_g):
            out0 = jnp.zeros((Km, BS, D, NE), dt)
            prev0 = jnp.zeros((Km, BS, D, W), dt)
            def body(carry, lo):
                out_g, prev = carry
                l, off = lo
                rhs = lax.dynamic_slice_in_dim(rhs_g, off, W, axis=-1)
                term = 0.0
                if variant == "solve-only":
                    pass
                elif variant == "onehot-only":
                    oh = oh_prev[l]
                    un = jnp.einsum("kbdv,vx->kbdx", prev, oh)
                    term = un.reshape(Km, BS, D, nf, W).sum(3) * 0.001
                elif variant == "couple-only":
                    ci = lax.dynamic_slice_in_dim(ci_g, off, W, axis=-1)
                    un = jnp.broadcast_to(
                        prev[:, :, :, None, :], (Km, BS, D, nf, W))
                    term = jnp.einsum("fij,kfw,kbjfw->kbiw", C_g, ci, un)
                elif variant == "full":
                    ci = lax.dynamic_slice_in_dim(ci_g, off, W, axis=-1)
                    oh = oh_prev[l]
                    un = jnp.einsum("kbdv,vx->kbdx", prev, oh).reshape(
                        Km, BS, D, nf, W)
                    term = jnp.einsum("fij,kfw,kbjfw->kbiw", C_g, ci, un)
                sol = jnp.einsum("kbij,kbjw->kbiw", A_g, rhs - term)
                out_g = lax.dynamic_update_slice_in_dim(out_g, sol, off, axis=-1)
                return (out_g, sol), None
            (out_g, _), _ = lax.scan(body, (out0, prev0), (jnp.arange(L), offs))
            return out_g
        return jax.vmap(group, in_axes=(0, 0, 0, 0))(rhsb, Ac, Cf, cin)
    return run

for v in sys.argv[1:] or ["solve-only", "onehot-only", "couple-only", "full"]:
    d = timeit(make(v), rhsb, Ac, Cf, cin, oh_prev)
    print(f"{v:14s} {d*1e3:9.2f} ms/{L}-levels  {d/L*1e6:9.1f} us/level", flush=True)
