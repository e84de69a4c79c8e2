"""Clean stock-vs-blocked Cholesky measurement using a chained fori_loop
harness (plain per-call timing is unreliable over the axon tunnel:
block_until_ready returns early, giving physically impossible rates)."""
import os, sys, time
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
from functools import partial
from mogp_tpu.ops.blocked import recursive_cholesky, trsm_left_lower

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
            return jnp.sum(jnp.log(jnp.abs(jnp.diagonal(L, axis1=-2, axis2=-1)))) * 1e-30
        return lax.fori_loop(0, iters, body, jnp.float32(0.0))
    return run

def timeit(run, A, iters):
    # warm both iteration counts, then slope: t(2k) - t(k) over k calls
    float(run(A, iters))
    float(run(A, 2 * iters))
    t0 = time.perf_counter(); float(run(A, iters)); t1 = time.perf_counter()
    float(run(A, 2 * iters)); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters

stock = chain_chol(jax.lax.linalg.cholesky)
blk = chain_chol(partial(recursive_cholesky, leaf=256))
blk128 = chain_chol(partial(recursive_cholesky, leaf=128))

print("device:", jax.devices()[0].device_kind, flush=True)
for n in (256, 512, 1024, 2048, 4096):
    A = jnp.asarray(make_spd(n))
    Ab = jnp.asarray(np.broadcast_to(np.asarray(A), (6, n, n)).copy())
    fl = n**3/3
    iters = max(4, int(2e9 / fl))
    for name, run, arr, mult in (("stock", stock, A, 1), ("blk256", blk, A, 1),
                                 ("blk128", blk128, A, 1),
                                 ("stockB6", stock, Ab, 6), ("blk256B6", blk, Ab, 6)):
        it = max(2, iters // mult)
        dt = timeit(run, arr, it)
        print(f"n={n:5d} {name:9s} t={dt*1e3:9.3f} ms  {mult*fl/dt/1e12:7.3f} TF/s", flush=True)
    print(flush=True)
