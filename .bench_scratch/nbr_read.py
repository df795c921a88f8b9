"""Neighbor-read strategies for the level sweep, measured standalone.

All variants process L=46 levels of width W=256 at hex-16^3 flagship shape
(Km=12, BS=40, D=27, G=8 vmapped), using explicit dynamic_slice windows on
arg arrays (scan xs/ys measured pathological on this platform).
"""
import time
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

def timeit(f, *args, n=10):
    r = f(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], r)
    return (time.time() - t0) / n

rhsb = jax.random.normal(key, (G, Km, BS, D, NE), dt)   # 6.8 GB? no: 8*12*40*27*4096*4 = 1.7GB
Ac = jax.random.normal(key, (G, Km, BS, D, D), dt)      # class A^-1
Cf = jax.random.normal(key, (G, nf, D, D), dt)
cin = jax.random.normal(key, (G, Km, nf, NE), dt)
nbr = jax.random.randint(key, (G, nf, NE), 0, NE, jnp.int32)
oh_prev = jax.random.normal(key, (L, W, nf * W), dt) * 0.01  # stand-in one-hot vs prev level

# A) current pattern: minor-axis gather from full u_g
@jax.jit
def full_gather(rhsb, Ac, Cf, cin, nbr):
    def group(rhs_g, A_g, C_g, ci_g, nb_g):
        u0 = jnp.zeros((Km, BS, D, NE), dt)
        def body(u_g, off):
            rhs = lax.dynamic_slice_in_dim(rhs_g, off, W, axis=-1)
            npos = lax.dynamic_slice_in_dim(nb_g, off, W, axis=-1)  # (nf,W)
            ci = lax.dynamic_slice_in_dim(ci_g, off, W, axis=-1)
            un = u_g[:, :, :, npos]  # (Km,BS,D,nf,W)
            term = jnp.einsum("fij,kfw,kbjfw->kbiw", C_g, ci, un)
            sol = jnp.einsum("kbij,kbjw->kbiw", A_g, rhs - term)
            return lax.dynamic_update_slice_in_dim(u_g, sol, off, axis=-1), None
        u_g, _ = lax.scan(body, u0, offs)
        return u_g
    return jax.vmap(group)(rhsb, Ac, Cf, cin, nbr)

# B) one-hot matmul against the previous level only (H=1), ys via DUS into out
@jax.jit
def prev_onehot(rhsb, Ac, Cf, cin, oh_prev):
    def group(rhs_g, A_g, C_g, ci_g):
        out0 = jnp.zeros((Km, BS, D, NE), dt)
        prev0 = jnp.zeros((Km, BS, D, W), dt)
        def body(carry, lo):
            out_g, prev = carry
            l, off = lo
            rhs = lax.dynamic_slice_in_dim(rhs_g, off, W, axis=-1)
            ci = lax.dynamic_slice_in_dim(ci_g, off, W, axis=-1)
            oh = oh_prev[l]  # (W, nf*W)
            un = jnp.einsum("kbdv,vx->kbdx", prev, oh).reshape(Km, BS, D, nf, W)
            term = jnp.einsum("fij,kfw,kbjfw->kbiw", C_g, ci, un)
            sol = jnp.einsum("kbij,kbjw->kbiw", A_g, rhs - term)
            out_g = lax.dynamic_update_slice_in_dim(out_g, sol, off, axis=-1)
            return (out_g, sol), None
        (out_g, _), _ = lax.scan(body, (out0, prev0), (jnp.arange(L), offs))
        return out_g
    return jax.vmap(group, in_axes=(0, 0, 0, 0))(rhsb, Ac, Cf, cin)

# C) fold coupling into one one-hot-weighted matmul: term = (C_f-weighted prev) @ oh
@jax.jit
def prev_onehot_fused(rhsb, Ac, Cf, cin, oh_prev):
    def group(rhs_g, A_g, C_g, ci_g):
        out0 = jnp.zeros((Km, BS, D, NE), dt)
        prev0 = jnp.zeros((Km, BS, D, W), dt)
        def body(carry, lo):
            out_g, prev = carry
            l, off = lo
            rhs = lax.dynamic_slice_in_dim(rhs_g, off, W, axis=-1)
            ci = lax.dynamic_slice_in_dim(ci_g, off, W, axis=-1)
            oh = oh_prev[l].reshape(W, nf, W)
            # cpre[f,kbi,v] = C_f[i,j] prev[kbjv]  (nf small matmuls, big N)
            cpre = jnp.einsum("fij,kbjv->fkbiv", C_g, prev)
            # term[kbiw] = sum_f ci[kfw] * (cpre[f] @ oh[:,f,:])[kbiw]
            t = jnp.einsum("fkbiv,vfw->fkbiw", cpre, oh)
            term = jnp.einsum("kfw,fkbiw->kbiw", ci, t)
            sol = jnp.einsum("kbij,kbjw->kbiw", A_g, rhs - term)
            out_g = lax.dynamic_update_slice_in_dim(out_g, sol, off, axis=-1)
            return (out_g, sol), None
        (out_g, _), _ = lax.scan(body, (out0, prev0), (jnp.arange(L), offs))
        return out_g
    return jax.vmap(group, in_axes=(0, 0, 0, 0))(rhsb, Ac, Cf, cin)

# D) row gather, element-major layout u (ne, Km*BS*D)
rhsb_em = jax.random.normal(key, (G, NE, Km * BS * D), dt)
@jax.jit
def row_gather(rhsb_em, Ac, Cf, cin, nbr):
    def group(rhs_g, A_g, C_g, ci_g, nb_g):
        u0 = jnp.zeros((NE, Km * BS * D), dt)
        def body(u_g, off):
            rhs = lax.dynamic_slice_in_dim(rhs_g, off, W, axis=0)
            npos = lax.dynamic_slice_in_dim(nb_g, off, W, axis=-1)  # (nf,W)
            ci = lax.dynamic_slice_in_dim(ci_g, off, W, axis=-1)
            un = u_g[npos.reshape(-1)].reshape(nf, W, Km, BS, D)
            term = jnp.einsum("fij,kfw,fwkbj->wkbi", C_g, ci, un)
            sol = jnp.einsum("kbij,wkbj->wkbi", A_g,
                             rhs.reshape(W, Km, BS, D) - term)
            return lax.dynamic_update_slice_in_dim(
                u_g, sol.reshape(W, -1), off, axis=0), None
        u_g, _ = lax.scan(body, u0, offs)
        return u_g
    return jax.vmap(group)(rhsb_em, Ac, Cf, cin, nbr)

import sys
which = sys.argv[1:] or ["A", "B", "C", "D"]
for name, f, args in [
    ("A full-minor-gather", full_gather, (rhsb, Ac, Cf, cin, nbr)),
    ("B prev-onehot", prev_onehot, (rhsb, Ac, Cf, cin, oh_prev)),
    ("C prev-onehot-fused", prev_onehot_fused, (rhsb, Ac, Cf, cin, oh_prev)),
    ("D row-gather", row_gather, (rhsb_em, Ac, Cf, cin, nbr)),
]:
    if name[0] not in which:
        continue
    try:
        d = timeit(f, *args)
        print(f"{name:22s} {d*1e3:8.2f} ms/{L}-levels  {d/L*1e6:8.1f} us/level")
    except Exception as e:
        print(f"{name:22s} FAILED: {type(e).__name__}: {str(e)[:200]}")
