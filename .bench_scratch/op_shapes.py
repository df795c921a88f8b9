"""Which contraction shapes does this TPU lower well?

Candidates for the class-mode level body at hex-16^3 (Km=12, BS=40, D=27,
W=256, nf=6). Each op is chained inside one jit (scan over a dummy axis,
carry = output reduced back to input shape) to avoid dispatch noise.
"""
import time, sys
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

Km, BS, D, W, nf = 12, 40, 27, 256, 6
dt = jnp.float32
key = jax.random.PRNGKey(0)

def bench(name, f, flops, *args, n=50):
    @jax.jit
    def chain(*args):
        def body(c, _):
            out = f(*args)
            # fold output into a scalar-ish carry so iterations are ordered
            return c + out.ravel()[0] * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.zeros((), dt), None, length=n)
        return c
    out = chain(*args); _ = float(out)
    t0 = time.time()
    out = chain(*args)
    _ = float(out)
    d = (time.time() - t0) / n
    print(f"{name:44s} {d*1e6:9.0f} us  {flops/d/1e12:7.2f} TF/s", flush=True)

A_kb = jax.random.normal(key, (Km, BS, D, D), dt)
A_k = jax.random.normal(key, (Km, D, D), dt)
A_1 = jax.random.normal(key, (D, D), dt)
r_kb = jax.random.normal(key, (Km, BS, D, W), dt)
r_k2 = jax.random.normal(key, (Km, D, BS * W), dt)
r_flat = jax.random.normal(key, (D, Km * BS * W), dt)
Cf = jax.random.normal(key, (D, nf * D), dt)
uw = jax.random.normal(key, (nf * D, Km * BS * W), dt)
prev = jax.random.normal(key, (Km * BS * D, W), dt)
oh = jax.random.normal(key, (W, nf * W), dt)
u_ne = jax.random.normal(key, (Km, BS, D, 4096), dt)
mt = jax.random.normal(key, (D, D), dt)

fl = lambda b, m, k, n_: 2 * b * m * k * n_

bench("full: kbij,kbjw->kbiw (batch 480)",
      lambda A, r: jnp.einsum("kbij,kbjw->kbiw", A, r),
      fl(Km * BS, D, D, W), A_kb, r_kb)
bench("eigen: kij,kbjw->kbiw (batch 12)",
      lambda A, r: jnp.einsum("kij,kbjw->kbiw", A, r),
      fl(Km, D, D, BS * W), A_k, r_kb)
bench("eigen2: kij,kjn->kin (batch 12, pre-reshaped)",
      lambda A, r: jnp.einsum("kij,kjn->kin", A, r),
      fl(Km, D, D, BS * W), A_k, r_k2)
bench("shared: ij,jn->in (one GEMM)",
      lambda A, r: A @ r,
      fl(1, D, D, Km * BS * W), A_1, r_flat)
bench("coupling: i(fj),(fj)n->in",
      lambda C, u: C @ u,
      fl(1, D, nf * D, Km * BS * W), Cf, uw)
bench("onehot-nbr: (kbd)v,vx->(kbd)x",
      lambda p, o: p @ o,
      fl(1, Km * BS * D, W, nf * W), prev, oh)
bench("rhsbase: ij,kbjE->kbiE (full-width)",
      lambda m, u: jnp.einsum("ij,kbjE->kbiE", m, u),
      fl(1, D, D, Km * BS * 4096), mt, u_ne)
# gather candidates at level width
idx = jax.random.randint(key, (nf, W), 0, 4096, jnp.int32)
bench("gather: u[:,:,:,idx] minor from 202MB",
      lambda u, i: u[:, :, :, i],
      1, u_ne, idx, n=10)
u_row = jax.random.normal(key, (4096, Km * BS * D), dt)
bench("gather: row u[idx] from 202MB elem-major",
      lambda u, i: u[i.reshape(-1)],
      1, u_row, idx, n=10)
prev_small = jax.random.normal(key, (Km, BS, D, W), dt)
idxw = jax.random.randint(key, (nf, W), 0, W, jnp.int32)
bench("gather: prev[:,:,:,idxW] minor from 13MB",
      lambda p, i: p[:, :, :, i],
      1, prev_small, idxw, n=10)
prev_row = jax.random.normal(key, (W, Km * BS * D), dt)
bench("gather: row prev[idxW] from 13MB elem-major",
      lambda p, i: p[i.reshape(-1)],
      1, prev_row, idxw, n=10)
