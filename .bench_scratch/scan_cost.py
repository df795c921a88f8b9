"""What does one lax.scan level-iteration cost on this TPU?

Hypotheses for the round-1 ~1.3ms/level fixed cost:
  a) DUS carry copy is O(carry), not O(window)
  b) dynamic_slice reads of big (minor-axis) operator tensors
  c) platform per-iteration overhead
"""
import os, sys, time
import jax, jax.numpy as jnp
from jax import lax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

Km, BS, D, NE, W, L = 12, 40, 27, 4096, 256, 46
dt = jnp.float32

def timeit(f, *args, n=20):
    r = f(*args); jax.tree_util.tree_map(lambda x: np.asarray(x[..., :1]), r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x[..., :1]), r)
    return (time.time() - t0) / n

key = jax.random.PRNGKey(0)
u = jax.random.normal(key, (Km, BS, D, NE), dt)
rhs = jax.random.normal(key, (Km, BS, D, NE), dt)
offs = jnp.arange(L, dtype=jnp.int32) * ((NE - W) // max(L - 1, 1))

# a) pure DUS carry: read window, write window
@jax.jit
def scan_dus(u, rhs):
    def body(c, off):
        w = lax.dynamic_slice_in_dim(rhs, off, W, axis=-1)
        c = lax.dynamic_update_slice_in_dim(c, w * 1.0001, off, axis=-1)
        return c, None
    c, _ = lax.scan(body, u, offs)
    return c

# b) DUS + a solve-like einsum on the window with per-element A (streamed)
A = jax.random.normal(key, (Km, BS, D, D, NE), dt)  # 45 GB/oops no: 12*40*729*4096*4 = 5.7GB
# too big; use Km only
A2 = jax.random.normal(key, (Km, D, D, NE), dt)  # 143 MB

@jax.jit
def scan_stream(u, rhs, A2):
    def body(c, off):
        w = lax.dynamic_slice_in_dim(rhs, off, W, axis=-1)
        a = lax.dynamic_slice_in_dim(A2, off, W, axis=-1)
        sol = jnp.einsum("kijw,kbjw->kbiw", a, w)
        c = lax.dynamic_update_slice_in_dim(c, sol, off, axis=-1)
        return c, None
    c, _ = lax.scan(body, u, offs)
    return c

# c) class-based A (no per-element stream)
Ac = jax.random.normal(key, (Km, D, D), dt)
@jax.jit
def scan_class(u, rhs, Ac):
    def body(c, off):
        w = lax.dynamic_slice_in_dim(rhs, off, W, axis=-1)
        sol = jnp.einsum("kij,kbjw->kbiw", Ac, w)
        c = lax.dynamic_update_slice_in_dim(c, sol, off, axis=-1)
        return c, None
    c, _ = lax.scan(body, u, offs)
    return c

# d) trivial scan (fixed-overhead floor)
@jax.jit
def scan_nop(u):
    def body(c, off):
        return c, off
    c, ys = lax.scan(body, u, offs)
    return ys

# e) neighbor-style gather from carry + class solve + DUS
nbr = jax.random.randint(key, (6, NE), 0, NE, jnp.int32)
@jax.jit
def scan_gather(u, rhs, Ac, nbr):
    def body(c, off):
        w = lax.dynamic_slice_in_dim(rhs, off, W, axis=-1)
        np_ = lax.dynamic_slice_in_dim(nbr, off, W, axis=-1)  # (6, W)
        un = c[:, :, :, np_]  # (Km,BS,D,6,W)
        w = w - 0.001 * un.sum(3)
        sol = jnp.einsum("kij,kbjw->kbiw", Ac, w)
        c = lax.dynamic_update_slice_in_dim(c, sol, off, axis=-1)
        return c, None
    c, _ = lax.scan(body, u, offs)
    return c

for name, f, args in [
    ("nop", scan_nop, (u,)),
    ("dus-only", scan_dus, (u, rhs)),
    ("dus+class-einsum", scan_class, (u, rhs, Ac)),
    ("dus+stream-einsum", scan_stream, (u, rhs, A2)),
    ("gather+class+dus", scan_gather, (u, rhs, Ac, nbr)),
]:
    dt_s = timeit(f, *args)
    print(f"{name:24s} {dt_s*1e3:8.2f} ms/scan  {dt_s/L*1e6:8.1f} us/level")
