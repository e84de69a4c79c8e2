"""Experiment: stock XLA vs recursive blocked Cholesky at large n on TPU."""
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
from functools import partial
from mogp_tpu.ops.blocked import recursive_cholesky, trsm_left_lower

def make_spd(n, d=8, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.uniform(size=(n, d))
    r2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    return (np.exp(-0.5 * r2 / 0.3**2) + 1e-4 * np.eye(n)).astype(np.float64)

stock = jax.jit(jax.lax.linalg.cholesky)
blocked = {leaf: jax.jit(partial(recursive_cholesky, leaf=leaf)) for leaf in (128, 256, 512)}

def bench(fn, A, iters=10):
    L = fn(A); L.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        L = fn(A)
    L.block_until_ready()
    return (time.perf_counter() - t0) / iters, L

print("backend:", jax.devices()[0].platform, jax.devices()[0].device_kind, flush=True)
import scipy.linalg
for n in (512, 1024, 2048, 4096):
    K64 = make_spd(n)
    L64 = scipy.linalg.cholesky(K64, lower=True)
    logdet64 = 2 * np.sum(np.log(np.diag(L64)))
    A = jnp.asarray(K64, dtype=jnp.float32)
    flops = n**3 / 3
    rows = [("stock", stock)] + [(f"blk{leaf}", fn) for leaf, fn in blocked.items()]
    for name, fn in rows:
        dt, L = bench(fn, A)
        L32 = np.asarray(L, dtype=np.float64)
        ld = 2 * np.sum(np.log(np.diag(L32)))
        recon = np.max(np.abs(L32 @ np.tril(L32).T - K64)) / np.max(np.abs(K64))
        print(f"n={n:5d} {name:7s} t={dt*1e3:9.3f} ms  {flops/dt/1e12:7.3f} TFLOP/s  "
              f"logdet_rel={abs(ld-logdet64)/max(abs(logdet64),1e-9):.2e}  recon={recon:.2e}", flush=True)
    # batched ladder shape (6 candidates) for the adaptive path
    Ab = jnp.broadcast_to(A, (6, n, n))
    for name, fn in rows:
        dt, L = bench(fn, Ab, iters=5)
        print(f"n={n:5d} {name:7s} batch6 t={dt*1e3:9.3f} ms  {6*flops/dt/1e12:7.3f} TFLOP/s", flush=True)
