"""Primitive costs for the level-sweep body redesign (hex-16^3 shapes)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
from jax import lax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

Km, BS, D, NE, W, L, nf = 10, 40, 27, 4096, 192, 16, 6
dt = jnp.float32
key = jax.random.PRNGKey(0)

def timeit(f, *args, n=10):
    def sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf[(0,) * leaf.ndim])  # scalar fetch: big device->host
        # transfers ride a slow tunnel here and would dominate the timing
    r = f(*args); sync(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    sync(r)
    return (time.time() - t0) / n

u = jax.random.normal(key, (Km, BS, D, NE), dt)
rhs = jax.random.normal(key, (Km, BS, D, NE), dt)
offs_un = jnp.arange(L, dtype=jnp.int32) * ((NE - W) // max(L - 1, 1))
offs_al = (jnp.arange(L, dtype=jnp.int32) * 256) % (NE - 256)

# 1) DUS aligned vs unaligned offsets
def make_dus(offs, Wd):
    @jax.jit
    def f(u, rhs):
        def body(c, off):
            w = lax.dynamic_slice_in_dim(rhs, off, Wd, axis=-1)
            return lax.dynamic_update_slice_in_dim(c, w * 1.0001, off, axis=-1), None
        return lax.scan(body, u, offs)[0]
    return f

print(f"dus unaligned W={W}: {timeit(make_dus(offs_un, W), u, rhs)/L*1e6:8.1f} us/level", flush=True)
print(f"dus aligned   W=256: {timeit(make_dus(offs_al, 256), u, rhs)/L*1e6:8.1f} us/level", flush=True)

# 2) ys-emission instead of carry DUS (ring carry, stack output)
@jax.jit
def ring_ys(rhs):
    prev0 = jnp.zeros((Km, BS, D, W), dt)
    def body(prev, off):
        w = lax.dynamic_slice_in_dim(rhs, off, W, axis=-1)
        sol = w + 0.0001 * prev
        return sol, sol
    _, ys = lax.scan(body, prev0, offs_un)
    return ys
print(f"ring+ys:            {timeit(ring_ys, rhs)/L*1e6:8.1f} us/level", flush=True)

# 3) gather from ring (W source) vs from full (NE source)
nbr_w = jax.random.randint(key, (L, nf, W), 0, W, jnp.int32)
@jax.jit
def ring_gather(rhs, nbr_w):
    prev0 = jnp.zeros((Km, BS, D, W), dt)
    def body(prev, lo):
        l, off = lo
        w = lax.dynamic_slice_in_dim(rhs, off, W, axis=-1)
        un = prev[:, :, :, nbr_w[l]]  # (Km,BS,D,nf,W)
        sol = w - 0.001 * un.sum(3)
        return sol, sol
    _, ys = lax.scan(body, prev0, (jnp.arange(L), offs_un))
    return ys
print(f"ring-gather:        {timeit(ring_gather, rhs, nbr_w)/L*1e6:8.1f} us/level", flush=True)

# 4) one-hot neighbor matmul from ring
oh = jax.random.normal(key, (L, W, nf * W), dt) * 0.01
@jax.jit
def ring_onehot(rhs, oh):
    prev0 = jnp.zeros((Km, BS, D, W), dt)
    def body(prev, lo):
        l, off = lo
        w = lax.dynamic_slice_in_dim(rhs, off, W, axis=-1)
        un = jnp.einsum("kbdv,vx->kbdx", prev, oh[l]).reshape(Km, BS, D, nf, W)
        sol = w - 0.001 * un.sum(3)
        return sol, sol
    _, ys = lax.scan(body, prev0, (jnp.arange(L), offs_un))
    return ys
print(f"ring-onehot:        {timeit(ring_onehot, rhs, oh)/L*1e6:8.1f} us/level", flush=True)

# 5) full realistic body: ring + onehot + coupling + class-eigen apply (HIGHEST)
Cf = jax.random.normal(key, (nf, D, D), dt)
cin = jax.random.normal(key, (L, Km, nf, W), dt)
Pr = jax.random.normal(key, (Km, 2, D, D, 6), dt)
ohc = jnp.abs(jax.random.normal(key, (L, 6, W), dt))
lamr = jax.random.normal(key, (Km, 2, D, 6), dt)
vg = jnp.abs(jax.random.normal(key, (BS,), dt))
hi = jax.lax.Precision.HIGHEST
@jax.jit
def full_body(rhs, oh, cin, Cf, Pr, lamr, ohc, vg):
    prev0 = jnp.zeros((Km, BS, D, W), dt)
    def body(prev, lo):
        l, off = lo
        w = lax.dynamic_slice_in_dim(rhs, off, W, axis=-1)
        un = jnp.einsum("kbdv,vx->kbdx", prev, oh[l]).reshape(Km, BS, D, nf, W)
        term = jnp.einsum("fij,kfw,kbjfw->kbiw", Cf, cin[l], un)
        w = w - term
        P_l = jnp.einsum("kzijc,cw->kzijw", Pr, ohc[l], precision=hi)
        lam_l = jnp.einsum("kzic,cw->kziw", lamr, ohc[l], precision=hi)
        t_re = jnp.einsum("kijw,kbjw->kbiw", P_l[:, 0], w, precision=hi)
        t_im = jnp.einsum("kijw,kbjw->kbiw", P_l[:, 1], w, precision=hi)
        vgb = vg[None, :, None, None]
        d_re = 1.0 + vgb * lam_l[:, None, 0]
        d_im = vgb * lam_l[:, None, 1]
        inv_mag = 1.0 / (d_re * d_re + d_im * d_im)
        s_re = (t_re * d_re + t_im * d_im) * inv_mag
        s_im = (t_im * d_re - t_re * d_im) * inv_mag
        sol = (jnp.einsum("kijw,kbjw->kbiw", P_l[:, 0], s_re, precision=hi)
               - jnp.einsum("kijw,kbjw->kbiw", P_l[:, 1], s_im, precision=hi))
        return sol, sol
    _, ys = lax.scan(body, prev0, (jnp.arange(L), offs_un))
    return ys
print(f"full-body(HIGHEST): {timeit(full_body, rhs, oh, cin, Cf, Pr, lamr, ohc, vg)/L*1e6:8.1f} us/level", flush=True)
