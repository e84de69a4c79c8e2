import os, sys, time
repo = "/root/repo"; sys.path.insert(0, repo)
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
from functools import partial
from mogp_tpu.ops.blocked import cholesky_with_inverse

def make_spd(n, d=8, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.uniform(size=(n, d))
    r2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    return (np.exp(-0.5 * r2 / 0.3**2) + 1e-4 * np.eye(n)).astype(np.float64)

cwi = jax.jit(partial(cholesky_with_inverse, leaf=256))
stock = jax.jit(jax.lax.linalg.cholesky)

def bench(fn, *args, iters=10):
    t0 = time.perf_counter()
    out = fn(*args); jax.block_until_ready(out)
    print("  first call", time.perf_counter()-t0, "s", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out

for n in (1024, 2048):
    A = jnp.asarray(make_spd(n), dtype=jnp.float32)
    flops = n**3/3
    dt, _ = bench(stock, A)
    print(f"n={n} stock {dt*1e3:.3f} ms {flops/dt/1e12:.3f} TF/s", flush=True)
    dt, (L, Linv) = bench(cwi, A)
    err = np.abs(np.asarray(Linv,np.float64) @ np.asarray(L,np.float64) - np.eye(n)).max()
    print(f"n={n} cwi256 {dt*1e3:.3f} ms ({2*flops/dt/1e12:.3f} TF/s at 2x work) inv_err={err:.2e}", flush=True)
