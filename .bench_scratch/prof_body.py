"""Profile the E3 candidate body to find the pathological op."""
import sys, time, glob, gzip, json
import jax, jax.numpy as jnp
from jax import lax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

G, Km, BS, D, NE, W, L, nf = 8, 12, 40, 27, 4096, 256, 46, 6
dt = jnp.float32
key = jax.random.PRNGKey(0)

rhsb = jax.random.normal(key, (G, Km, BS, D, NE), dt)
Pre = jax.random.normal(key, (G, Km, D, D), dt)
Qre = jax.random.normal(key, (G, Km, D, D), dt)
vg = jnp.abs(jax.random.normal(key, (BS,), dt)) + 0.1
Cf = jax.random.normal(key, (G, D, nf * D), dt)
cin = jax.random.normal(key, (G, Km, nf, NE), dt)
oh = (jax.random.normal(key, (L, W, nf * W), dt) * 0.01)
offs = jnp.arange(L, dtype=jnp.int32) * ((NE - W) // max(L - 1, 1))

@jax.jit
def run(rhsb, Pre, Qre, vg, Cf, cin, oh):
    def group(rhs_g, pre, qre, cf, ci_g):
        out0 = jnp.zeros((Km, BS, D, NE), dt)
        prev0 = jnp.zeros((Km, BS, D, W), dt)
        def body(carry, lo):
            out_g, prev = carry
            l, off = lo
            rhs = lax.dynamic_slice_in_dim(rhs_g, off, W, axis=-1)
            ci = lax.dynamic_slice_in_dim(ci_g, off, W, axis=-1)
            un = (prev.reshape(Km * BS * D, W) @ oh[l]).reshape(
                Km, BS, D, nf, W)
            uw = un * ci[:, None, None, :, :]
            uw = jnp.moveaxis(uw, 3, 2).reshape(Km, BS, nf * D, W)
            term = jnp.einsum("ix,kbxw->kbiw", cf.reshape(D, nf * D), uw)
            r2 = rhs - term
            t_re = jnp.einsum("kij,kbjw->kbiw", qre, r2)
            sol = jnp.einsum("kij,kbjw->kbiw", pre, t_re)
            out_g = lax.dynamic_update_slice_in_dim(out_g, sol, off, axis=-1)
            return (out_g, sol), None
        (out_g, _), _ = lax.scan(body, (out0, prev0), (jnp.arange(L), offs))
        return out_g
    return jax.vmap(group)(rhsb, Pre, Qre, Cf, cin)

r = run(rhsb, Pre, Qre, vg, Cf, cin, oh)
_ = np.asarray(r).ravel()[:1]
t0 = time.time()
r = run(rhsb, Pre, Qre, vg, Cf, cin, oh)
_ = np.asarray(r).ravel()[:1]
print(f"plain: {time.time()-t0:.2f} s/sweep", flush=True)

with jax.profiler.trace("/tmp/jaxtrace_body"):
    r = run(rhsb, Pre, Qre, vg, Cf, cin, oh)
    _ = np.asarray(r).ravel()[:1]
print("trace done", flush=True)

files = glob.glob("/tmp/jaxtrace_body/**/*.trace.json.gz", recursive=True)
if files:
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    from collections import defaultdict
    tot = defaultdict(float); cnt = defaultdict(int)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            tot[ev.get("name", "?")] += ev["dur"]
            cnt[ev.get("name", "?")] += 1
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{us/1000:9.2f} ms  x{cnt[name]:5d}  {name[:100]}")
