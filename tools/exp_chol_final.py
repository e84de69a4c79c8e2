"""Final Cholesky threshold measurement: long single measurements,
median of 3 repeats (tunnel RPC noise swamps short measurements)."""
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
from functools import partial
from mogp_tpu.ops.blocked import recursive_cholesky

def make_spd(n, d=8, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.uniform(size=(n, d))
    r2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    return (np.exp(-0.5 * r2 / 0.3**2) + 1e-4 * np.eye(n)).astype(np.float32)

def chain_chol(fn):
    @partial(jax.jit, static_argnames=("iters",))
    def run(A, iters):
        def body(i, carry):
            L = fn(A + carry * jnp.eye(A.shape[-1], dtype=A.dtype))
            return jnp.sum(jnp.log(jnp.abs(jnp.diagonal(L, axis1=-2, axis2=-1)))) * jnp.float32(1e-30)
        return lax.fori_loop(0, iters, body, jnp.float32(0.0))
    return run

def measure(run, A, iters, reps=3):
    float(run(A, iters))  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(A, iters)); ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / iters

stock = chain_chol(jax.lax.linalg.cholesky)
blk256 = chain_chol(partial(recursive_cholesky, leaf=256))
blk128 = chain_chol(partial(recursive_cholesky, leaf=128))

print("device:", jax.devices()[0].device_kind, flush=True)
# target ~1.5 s per measurement using rough per-call estimates
EST = {256: 5e-5, 512: 1e-4, 1024: 2e-4, 2048: 8e-4, 4096: 3e-3}
for n in (256, 512, 1024, 2048, 4096):
    A = jnp.asarray(make_spd(n))
    Ab = jnp.asarray(np.broadcast_to(np.asarray(A), (6, n, n)).copy())
    fl = n**3/3
    for name, run, arr, mult in (("stock", stock, A, 1), ("blk256", blk256, A, 1),
                                 ("blk128", blk128, A, 1),
                                 ("stockB6", stock, Ab, 6), ("blk256B6", blk256, Ab, 6),
                                 ("blk128B6", blk128, Ab, 6)):
        iters = max(4, int(1.5 / (EST[n] * mult)))
        dt = measure(run, arr, iters)
        print(f"CHOL n={n:5d} {name:9s} t={dt*1e3:9.4f} ms  {mult*fl/dt/1e12:7.3f} TF/s  (iters={iters})", flush=True)
print("DONE", flush=True)
time.sleep(2)
