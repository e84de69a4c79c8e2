import os, sys, time
repo = "/root/repo"; sys.path.insert(0, repo)
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
print("devices:", jax.devices(), flush=True)
A = jnp.asarray(np.eye(512, dtype=np.float32) * 2.0)
t0 = time.perf_counter()
L = jax.jit(jax.lax.linalg.cholesky)(A)
L.block_until_ready()
print("stock 512 first call:", time.perf_counter() - t0, "s", flush=True)
t0 = time.perf_counter()
for _ in range(10): L = jax.jit(jax.lax.linalg.cholesky)(A)
L.block_until_ready()
print("stock 512 steady:", (time.perf_counter() - t0)/10*1e3, "ms", flush=True)
