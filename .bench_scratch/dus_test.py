import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
from jax import lax

Km, BS, D, ne, L, W = 12, 40, 27, 216, 16, 27
G = 8
key = jax.random.PRNGKey(0)
sol = jax.random.normal(key, (G, Km, BS, D, W), jnp.float32)
offs = jnp.asarray(np.arange(L)*13 % (ne - W), jnp.int32)

def t(f, *args, n=10):
    r = f(*args); float(jnp.sum(r))
    t0=time.time()
    for _ in range(n):
        r = f(*args)
    float(jnp.sum(r)); return (time.time()-t0)/n*1000

# A: minor-axis DUS into (Km,BS,D,ne) carry (current scheme)
@jax.jit
def minor_dus(sol, offs):
    def grp(sg):
        u = jnp.zeros((Km, BS, D, ne), jnp.float32)
        def body(u, off):
            return lax.dynamic_update_slice_in_dim(u, sg, off, axis=-1), None
        u, _ = lax.scan(body, u, offs)
        return u
    return jax.vmap(grp)(sol)
print("minor-axis DUS scan: %.1f ms" % t(minor_dus, sol, offs))

# B: leading-axis DUS into (L,Km,BS,D,W) carry
@jax.jit
def lead_dus(sol):
    def grp(sg):
        buf = jnp.zeros((L, Km, BS, D, W), jnp.float32)
        def body(buf, l):
            return lax.dynamic_update_index_in_dim(buf, sg, l, axis=0), None
        buf, _ = lax.scan(body, buf, jnp.arange(L))
        return buf
    return jax.vmap(grp)(sol)
print("leading-axis DUS scan: %.1f ms" % t(lead_dus, sol))

# C: scan ys output (ideal)
@jax.jit
def ys_out(sol):
    def grp(sg):
        def body(c, l):
            return c, sg
        _, ys = lax.scan(body, 0.0, jnp.arange(L))
        return ys
    return jax.vmap(grp)(sol)
print("scan ys accumulate: %.1f ms" % t(ys_out, sol))

# D: neighbor gather from (L,Km,BS,D,W) via 2-axis indexing
buf = jax.random.normal(key, (G, L, Km, BS, D, W), jnp.float32)
lev = jnp.asarray(np.random.randint(0, L, (G, 6, W)), jnp.int32)
slt = jnp.asarray(np.random.randint(0, W, (G, 6, W)), jnp.int32)
@jax.jit
def two_axis_gather(buf, lev, slt):
    def grp(bg, lv, sl):
        out = bg[lv, :, :, :, sl]  # (6, W, Km, BS, D)
        return out.sum()
    return jax.vmap(grp)(buf, lev, slt).sum()
print("2-axis nbr gather x16 would be ~16x: one call: %.2f ms" % t(two_axis_gather, buf, lev, slt))
