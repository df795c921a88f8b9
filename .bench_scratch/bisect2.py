import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
from jax import lax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

key = jax.random.PRNGKey(0)
def timeit(f, *args, n=10):
    r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    return (time.time() - t0) / n

for (Km, BS, D, NE, W, L) in [(12,40,27,4096,256,46), (10,40,27,4096,192,16), (10,40,27,4096,192,46)]:
    dt = jnp.float32
    u = jax.random.normal(key, (Km, BS, D, NE), dt)
    rhs = jax.random.normal(key, (Km, BS, D, NE), dt)
    offs = jnp.arange(L, dtype=jnp.int32) * ((NE - W) // max(L - 1, 1))
    @jax.jit
    def scan_dus(u, rhs, offs=offs, W=W):
        def body(c, off):
            w = lax.dynamic_slice_in_dim(rhs, off, W, axis=-1)
            c = lax.dynamic_update_slice_in_dim(c, w * 1.0001, off, axis=-1)
            return c, None
        return lax.scan(body, u, offs)[0]
    d = timeit(scan_dus, u, rhs)
    print(f"Km={Km} W={W} L={L}: {d*1e3:8.2f} ms/call {d/L*1e6:8.1f} us/level", flush=True)
