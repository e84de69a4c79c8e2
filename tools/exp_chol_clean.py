"""Clean stock-vs-blocked Cholesky measurement (healthy device, one process)."""
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
    return (np.exp(-0.5 * r2 / 0.3**2) + 1e-4 * np.eye(n)).astype(np.float32)

stock = jax.jit(jax.lax.linalg.cholesky)
blk = jax.jit(partial(recursive_cholesky, leaf=256))

@jax.jit
def stock_solve(A, b):
    L = jax.lax.linalg.cholesky(A)
    return jax.lax.linalg.triangular_solve(L, b, left_side=True, lower=True)

@jax.jit
def blk_solve(A, b):
    L = recursive_cholesky(A, leaf=256)
    return trsm_left_lower(L, b, leaf=256)

def bench(fn, *args, iters=30):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

print("device:", jax.devices()[0].device_kind, flush=True)
for n in (256, 512, 1024, 2048, 4096):
    A = jnp.asarray(make_spd(n))
    b = jnp.asarray(np.random.RandomState(1).randn(n, 16).astype(np.float32))
    Ab = jnp.broadcast_to(A, (6, n, n))
    fl = n**3/3
    r = {}
    for name, fn, args, mult in (
        ("stock", stock, (A,), 1), ("blk256", blk, (A,), 1),
        ("stockB6", stock, (Ab,), 6), ("blk256B6", blk, (Ab,), 6),
        ("stock+solve", stock_solve, (A, b), 1), ("blk+solve", blk_solve, (A, b), 1),
    ):
        dt = bench(fn, *args)
        r[name] = dt
        print(f"n={n:5d} {name:12s} t={dt*1e3:9.3f} ms  {mult*fl/dt/1e12:7.3f} TF/s", flush=True)
    print(flush=True)
