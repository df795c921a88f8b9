import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
key = jax.random.PRNGKey(0)
# aligned big array: copy bandwidth
for shape, name in [((64, 1024, 1024), "aligned (64,1024,1024)"),
                    ((12,40,27,27,216), "a_inv-like (12,40,27,27,216)"),
                    ((12,40,27,27,256), "lane-padded (...,256)")]:
    x = jax.random.normal(key, shape, jnp.float32)
    f = jax.jit(lambda a: a * 1.000001 + 0.5)
    float(f(x).ravel()[0])
    t0=time.time(); n=10
    y = x
    for _ in range(n):
        y = f(y)
    float(y.ravel()[0])
    dt = (time.time()-t0)/n
    gb = x.size*4*2/1e9
    print(f"{name}: {dt*1000:.1f} ms -> {gb/dt:.0f} GB/s", flush=True)
# matmul peak check
a = jax.random.normal(key, (8192, 8192), jnp.float32)
mm = jax.jit(lambda a: a @ a)
float(mm(a)[0,0])
t0=time.time()
b = a
for _ in range(5):
    b = mm(b)
float(b[0,0]); dt=(time.time()-t0)/5
print(f"8192^3 matmul: {dt*1000:.1f} ms -> {2*8192**3/dt/1e12:.0f} TFLOP/s f32", flush=True)
