"""Ring-carry + ys-output sweep vs big-carry DUS sweep. Device-time only
(fetch 1 element; np.asarray on a slice of the result, never the full array).
Profile-verified numbers.
"""
import sys, time, glob, gzip, json
import jax, jax.numpy as jnp
from jax import lax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

G, Km, BS, D, NE, W, L, nf = 2, 12, 40, 27, 4096, 256, 46, 6
dt = jnp.float32
key = jax.random.PRNGKey(0)

def sync1(x):
    # fetch exactly ONE scalar through the tunnel
    return float(jnp.ravel(x)[0])

def timeit(f, *args, n=10):
    r = f(*args)
    sync1(r if not isinstance(r, tuple) else r[0])
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    sync1(r if not isinstance(r, tuple) else r[0])
    return (time.time() - t0) / n

rhsb_l = jax.random.normal(key, (G, L, Km, BS, D, W), dt)  # padded (L,W) layout
Pre = jax.random.normal(key, (G, Km, D, D), dt)
Qre = jax.random.normal(key, (G, Km, D, D), dt)
Cf = jax.random.normal(key, (G, D, nf * D), dt)
cin_l = jax.random.normal(key, (G, L, Km, nf, W), dt)
oh = (jax.random.normal(key, (G, L, W, nf * W), dt) * 0.01)  # 2.9 GB! too big?
# (G,L,W,nf*W) f32 = 8*46*256*1536*4 = 578 MB ok

def body_ops(rhs, ci, ohl, prev, pre, qre, cf):
    un = (prev.reshape(Km * BS * D, W) @ ohl).reshape(Km, BS, D, nf, W)
    uw = un * ci[:, None, None, :, :]
    uw = jnp.moveaxis(uw, 3, 2).reshape(Km, BS, nf * D, W)
    term = jnp.einsum("ix,kbxw->kbiw", cf, uw)
    r2 = rhs - term
    t_re = jnp.einsum("kij,kbjw->kbiw", qre, r2)
    sol = jnp.einsum("kij,kbjw->kbiw", pre, t_re)
    return sol

# A) ring carry + ys output, xs = rhs_base/cin/oh slabs
@jax.jit
def ring_ys(rhsb_l, Pre, Qre, Cf, cin_l, oh):
    def group(rhs_g, pre, qre, cf, ci_g, oh_g):
        prev0 = jnp.zeros((Km, BS, D, W), dt)
        def body(prev, xs):
            rhs, ci, ohl = xs
            sol = body_ops(rhs, ci, ohl, prev, pre, qre, cf)
            return sol, sol
        _, ys = lax.scan(body, prev0, (rhs_g, ci_g, oh_g))
        return ys  # (L, Km, BS, D, W)
    return jax.vmap(group)(rhsb_l, Pre, Qre, Cf, cin_l, oh)

# B) same but xs via explicit dynamic_slice on index (avoid xs streaming)
@jax.jit
def ring_ys_slice(rhsb_l, Pre, Qre, Cf, cin_l, oh):
    def group(rhs_g, pre, qre, cf, ci_g, oh_g):
        prev0 = jnp.zeros((Km, BS, D, W), dt)
        def body(prev, l):
            rhs = lax.dynamic_index_in_dim(rhs_g, l, 0, keepdims=False)
            ci = lax.dynamic_index_in_dim(ci_g, l, 0, keepdims=False)
            ohl = lax.dynamic_index_in_dim(oh_g, l, 0, keepdims=False)
            sol = body_ops(rhs, ci, ohl, prev, pre, qre, cf)
            return sol, sol
        _, ys = lax.scan(body, prev0, jnp.arange(L))
        return ys
    return jax.vmap(group)(rhsb_l, Pre, Qre, Cf, cin_l, oh)

for name, f in [("A ring+ys(xs)", ring_ys), ("B ring+ys(slice)", ring_ys_slice)]:
    d = timeit(f, rhsb_l, Pre, Qre, Cf, cin_l, oh, n=10)
    dofs = 64 * BS * NE * D / d
    print(f"{name:18s} {d*1e3:8.2f} ms/sweep ({d/L*1e6:7.1f} us/level) "
          f"-> {dofs:.3g} DOF/s", flush=True)

# profile variant A
with jax.profiler.trace("/tmp/jaxtrace_ring"):
    r = ring_ys(rhsb_l, Pre, Qre, Cf, cin_l, oh)
    sync1(r)
files = glob.glob("/tmp/jaxtrace_ring/**/*.trace.json.gz", recursive=True)
if files:
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    from collections import defaultdict
    tot = defaultdict(float); cnt = defaultdict(int)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            tot[ev.get("name", "?")] += ev["dur"]
            cnt[ev.get("name", "?")] += 1
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:18]:
        print(f"{us/1000:9.2f} ms  x{cnt[name]:5d}  {name[:100]}")
