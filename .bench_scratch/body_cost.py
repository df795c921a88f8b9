"""E1: overhead per-op or per-iteration?  E2: unroll.  E3: full candidate body."""
import time, sys
import jax, jax.numpy as jnp
from jax import lax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

G, Km, BS, D, NE, W, L, nf = 8, 12, 40, 27, 4096, 256, 46, 6
dt = jnp.float32
key = jax.random.PRNGKey(0)

def timeit(f, *args, n=10):
    r = f(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], r)
    return (time.time() - t0) / n

# E1: k chained GEMMs per iteration (same data)
A = jax.random.normal(key, (D, D), dt)
x0 = jax.random.normal(key, (D, Km * BS * W), dt)
def make_kops(k):
    @jax.jit
    def run(A, x):
        def body(c, _):
            y = c
            for _ in range(k):
                y = A @ y
            return y, None
        c, _ = lax.scan(body, x, None, length=L)
        return c
    return run
for k in (1, 2, 4, 8):
    d = timeit(make_kops(k), A, x0)
    print(f"E1 {k} GEMMs/iter: {d/L*1e6:8.1f} us/iter", flush=True)

# E2/E3: full candidate class-mode body (eigen, ncls=1), unroll sweep
rhsb = jax.random.normal(key, (G, Km, BS, D, NE), dt)   # 1.7 GB
Pre = jax.random.normal(key, (G, Km, D, D), dt)
Pim = jax.random.normal(key, (G, Km, D, D), dt)
Qre = jax.random.normal(key, (G, Km, D, D), dt)
Qim = jax.random.normal(key, (G, Km, D, D), dt)
lre = jax.random.normal(key, (G, Km, D), dt)
lim = jax.random.normal(key, (G, Km, D), dt) * 0.1
vg = jnp.abs(jax.random.normal(key, (BS,), dt)) + 0.1
Cf = jax.random.normal(key, (G, D, nf * D), dt)         # class coupling, flattened
cin = jax.random.normal(key, (G, Km, nf, NE), dt)       # inflow coeffs per elem
# one-hot neighbor matrices vs previous level: (L, W, nf*W) would be G-dep;
# use shared for timing purposes
oh = (jax.random.normal(key, (L, W, nf * W), dt) * 0.01)
offs = jnp.arange(L, dtype=jnp.int32) * ((NE - W) // max(L - 1, 1))

def make_sweep(unroll):
    @jax.jit
    def run(rhsb, Pre, Pim, Qre, Qim, lre, lim, vg, Cf, cin, oh):
        def group(rhs_g, pre, pim, qre, qim, lr, li, cf, ci_g):
            out0 = jnp.zeros((Km, BS, D, NE), dt)
            prev0 = jnp.zeros((Km, BS, D, W), dt)
            def body(carry, lo):
                out_g, prev = carry
                l, off = lo
                rhs = lax.dynamic_slice_in_dim(rhs_g, off, W, axis=-1)
                ci = lax.dynamic_slice_in_dim(ci_g, off, W, axis=-1)  # (Km,nf,W)
                # neighbor values of all faces via one one-hot matmul
                un = (prev.reshape(Km * BS * D, W) @ oh[l]).reshape(
                    Km, BS, D, nf, W)
                # inflow weight + fold faces into one coupling GEMM
                uw = un * ci[:, None, None, :, :]  # (Km,BS,D,nf,W)
                uw = jnp.moveaxis(uw, 3, 2).reshape(Km, BS, nf * D, W)
                term = jnp.einsum("ix,kbxw->kbiw", cf.reshape(D, nf * D), uw)
                r2 = rhs - term
                # eigen solve: t = Q r2 (complex), s = t/(1+vg lam), sol = Re(P s)
                t_re = jnp.einsum("kij,kbjw->kbiw", qre, r2)
                t_im = jnp.einsum("kij,kbjw->kbiw", qim, r2)
                d_re = 1.0 + vg[None, :, None, None] * lr[:, None, :, None]
                d_im = vg[None, :, None, None] * li[:, None, :, None]
                m = 1.0 / (d_re * d_re + d_im * d_im)
                s_re = (t_re * d_re + t_im * d_im) * m
                s_im = (t_im * d_re - t_re * d_im) * m
                sol = (jnp.einsum("kij,kbjw->kbiw", pre, s_re)
                       - jnp.einsum("kij,kbjw->kbiw", pim, s_im))
                out_g = lax.dynamic_update_slice_in_dim(out_g, sol, off, axis=-1)
                return (out_g, sol), None
            (out_g, _), _ = lax.scan(body, (out0, prev0),
                                     (jnp.arange(L), offs), unroll=unroll)
            return out_g
        return jax.vmap(group)(rhsb, Pre, Pim, Qre, Qim, lre, lim, Cf, cin)
    return run

for unroll in [int(a) for a in (sys.argv[1:] or [1])]:
    f = make_sweep(unroll)
    d = timeit(f, rhsb, Pre, Pim, Qre, Qim, lre, lim, vg, Cf, cin, oh, n=5)
    dofs = 64 * BS * NE * D / d
    print(f"E3 full body unroll={unroll}: {d*1e3:8.2f} ms/sweep "
          f"({d/L*1e6:7.1f} us/level) -> {dofs:.3g} DOF/s/step", flush=True)
