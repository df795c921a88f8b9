import sys, time
sys.path.insert(0, "/root/repo")
import jax, numpy as np
a = np.random.rand(64, 1024, 1024).astype(np.float32)  # 256MB
t0=time.time()
d = jax.device_put(a)
v = float(d[0,0,0])  # force
print("device_put 256MB: %.1fs -> %.0f MB/s" % (time.time()-t0, 256/(time.time()-t0)))
