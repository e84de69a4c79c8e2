"""Experiment: XLA stock Cholesky throughput/accuracy at large n on TPU."""
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))

def make_spd(n, d=8, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.uniform(size=(n, d))
    r2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    K = np.exp(-0.5 * r2 / 0.3**2) + 1e-6 * np.eye(n)
    return K.astype(np.float64)

chol = jax.jit(jax.lax.linalg.cholesky)

def bench(fn, A, iters=20):
    fn(A).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        L = fn(A)
    L.block_until_ready()
    return (time.perf_counter() - t0) / iters, L

print("backend:", jax.devices()[0].platform, jax.devices()[0].device_kind)
for n in (512, 1024, 2048, 4096):
    K64 = make_spd(n)
    import scipy.linalg
    L64 = scipy.linalg.cholesky(K64, lower=True)
    logdet64 = 2 * np.sum(np.log(np.diag(L64)))
    A = jnp.asarray(K64, dtype=jnp.float32)
    dt, L = bench(chol, A)
    L32 = np.asarray(L, dtype=np.float64)
    logdet32 = 2 * np.sum(np.log(np.diag(L32)))
    # reconstruction + logdet error
    recon_err = np.max(np.abs(L32 @ L32.T - K64)) / np.max(np.abs(K64))
    tflops = (n**3 / 3) / dt / 1e12
    print(f"n={n:5d}  t={dt*1e3:8.3f} ms  {tflops:6.3f} TFLOP/s  "
          f"logdet_relerr={abs(logdet32-logdet64)/abs(logdet64):.2e}  recon={recon_err:.2e}")
