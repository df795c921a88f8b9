"""Ring-buffer sweep scan: carry = last H levels only, ys = per-level sols.

Compare neighbor-read strategies on the ring:
  a) minor-axis gather from (Km,BS,D,H*W)
  b) leading-axis (row) gather from (H*W, D, Km*BS) element-major layout
  c) one-hot matmul (flops explosion, for reference)
Plus the full level body candidate at hex-16^3 shapes.
"""
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
nbr_ring = jax.random.randint(key, (L, nf, W), 0, H * W, jnp.int32)
Ac = jax.random.normal(key, (Km, D, D), dt)       # class A^-1 (ncls=1)
Cf = jax.random.normal(key, (nf, D, D), dt)       # class coupling
cin = jax.random.normal(key, (L, Km, nf, W), dt)  # per-level inflow coeffs

# a) ordinate-major ring, minor-axis gather
@jax.jit
def ring_minor(rhsb, nbr_ring, Ac, Cf, cin):
    ring0 = jnp.zeros((Km, BS, D, H * W), dt)
    def body(ring, xs):
        rhs, idx, ci = xs  # (Km,BS,D,W), (nf,W), (Km,nf,W)
        un = ring[:, :, :, idx]  # (Km,BS,D,nf,W)
        term = jnp.einsum("fij,kfw,kbjfw->kbiw", Cf, ci, un)
        sol = jnp.einsum("kij,kbjw->kbiw", Ac, rhs - term)
        ring = jnp.concatenate([ring[:, :, :, W:], sol], axis=-1)
        return ring, sol
    _, ys = lax.scan(body, ring0, (rhsb, nbr_ring, cin))
    return ys

# b) element-major ring, row gather
rhsb_em = jax.random.normal(key, (L, W, D, Km * BS), dt)
cin_em = jax.random.normal(key, (L, Km, nf, W), dt)
@jax.jit
def ring_rowgather(rhsb_em, nbr_ring, Ac, Cf, cin_em):
    ring0 = jnp.zeros((H * W, D, Km * BS), dt)
    def body(ring, xs):
        rhs, idx, ci = xs  # (W,D,KmBS), (nf,W), (Km,nf,W)
        un = ring[idx.reshape(-1)]  # (nf*W, D, KmBS) row gather
        un = un.reshape(nf, W, D, Km, BS)
        term = jnp.einsum("fij,kfw,fwjkb->wikb", Cf, ci, un)
        rhs2 = rhs.reshape(W, D, Km, BS) - term
        sol = jnp.einsum("kij,wjkb->wikb", Ac, rhs2).reshape(W, D, Km * BS)
        ring = jnp.concatenate([ring[W:], sol], axis=0)
        return ring, sol
    _, ys = lax.scan(body, ring0, (rhsb_em, nbr_ring, cin_em))
    return ys

# c) ordinate-major ring, neighbor read via one-hot (H*W x nf*W) matmul
oneh = jax.nn.one_hot(nbr_ring.reshape(L, -1), H * W, axis=1, dtype=dt)  # (L, H*W, nf*W)
@jax.jit
def ring_onehot(rhsb, oneh, Ac, Cf, cin):
    ring0 = jnp.zeros((Km, BS, D, H * W), dt)
    def body(ring, xs):
        rhs, oh, ci = xs
        un = jnp.einsum("kbdr,rx->kbdx", ring, oh).reshape(Km, BS, D, nf, W)
        term = jnp.einsum("fij,kfw,kbjfw->kbiw", Cf, ci, un)
        sol = jnp.einsum("kij,kbjw->kbiw", Ac, rhs - term)
        ring = jnp.concatenate([ring[:, :, :, W:], sol], axis=-1)
        return ring, sol
    _, ys = lax.scan(body, ring0, (rhsb, oneh, cin))
    return ys

# d) H=1 special case: neighbor read gathers only the PREVIOUS level (W cols)
nbr1 = jax.random.randint(key, (L, nf, W), 0, W, jnp.int32)
@jax.jit
def ring_prev_only(rhsb, nbr1, Ac, Cf, cin):
    prev0 = jnp.zeros((Km, BS, D, W), dt)
    def body(prev, xs):
        rhs, idx, ci = xs
        un = prev[:, :, :, idx]  # gather from (Km,BS,D,W) only
        term = jnp.einsum("fij,kfw,kbjfw->kbiw", Cf, ci, un)
        sol = jnp.einsum("kij,kbjw->kbiw", Ac, rhs - term)
        return sol, sol
    _, ys = lax.scan(body, prev0, (rhsb, nbr1, cin))
    return ys

for name, f, args in [
    ("ring-minor-gather", ring_minor, (rhsb, nbr_ring, Ac, Cf, cin)),
    ("ring-row-gather", ring_rowgather, (rhsb_em, nbr_ring, Ac, Cf, cin_em)),
    ("ring-onehot", ring_onehot, (rhsb, oneh, Ac, Cf, cin)),
    ("prev-only(H=1)", ring_prev_only, (rhsb, nbr1, Ac, Cf, cin)),
]:
    d = timeit(f, *args)
    print(f"{name:20s} {d*1e3:8.2f} ms/scan  {d/L*1e6:8.1f} us/level")
