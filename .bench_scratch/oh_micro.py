import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
from jax import lax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

G, Km, BS, D, W, L, nf = 8, 10, 40, 27, 192, 46, 6
dt = jnp.float32
key = jax.random.PRNGKey(0)

def timeit(f, *args, n=10):
    def sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf[(0,) * leaf.ndim])
    r = f(*args); sync(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    sync(r)
    return (time.time() - t0) / n

# A: pure flat matmul loop over levels, no vmap: (G*KmBSD, W) @ (W, nfW)
ringf = jax.random.normal(key, (G * Km * BS * D, W), dt)
ohf = jax.random.normal(key, (L, W, nf * W), dt)
@jax.jit
def flat(ringf, ohf):
    def body(c, oh_l):
        y = c @ oh_l          # (GKmBSD, nfW)
        c = c + y[:, :W] * 1e-6
        return c, None
    return lax.scan(body, ringf, ohf)[0]
d = timeit(flat, ringf, ohf)
fl = G*Km*BS*D*W*nf*W*2
print(f"A flat matmul scan: {d/L*1e6:8.1f} us/level  ({fl/(d/L)/1e12:.1f} TF)", flush=True)

# B: same but vmapped over G with (Km,BS,D,W) ring + reshape to 2D inside
ring4 = jax.random.normal(key, (G, Km, BS, D, W), dt)
oh4 = jax.random.normal(key, (G, L, W, nf * W), dt)
@jax.jit
def vm(ring4, oh4):
    def group(r_g, oh_g):
        def body(c, oh_l):
            un = jnp.einsum("kbdv,vx->kbdx", c, oh_l)
            c = c + un[..., :W] * 1e-6
            return c, None
        return lax.scan(body, r_g, oh_g)[0]
    return jax.vmap(group)(ring4, oh4)
d = timeit(vm, ring4, oh4)
print(f"B vmapped einsum  : {d/L*1e6:8.1f} us/level  ({fl/(d/L)/1e12:.1f} TF)", flush=True)

# C: with the (Km,BS,D,nf,W) reshape materialized
@jax.jit
def vm_rs(ring4, oh4):
    def group(r_g, oh_g):
        def body(c, oh_l):
            un = jnp.einsum("kbdv,vx->kbdx", c, oh_l).reshape(Km, BS, D, nf, W)
            c = c + un.sum(3) * 1e-6
            return c, None
        return lax.scan(body, r_g, oh_g)[0]
    return jax.vmap(group)(ring4, oh4)
d = timeit(vm_rs, ring4, oh4)
print(f"C + reshape+sum   : {d/L*1e6:8.1f} us/level  ({fl/(d/L)/1e12:.1f} TF)", flush=True)
