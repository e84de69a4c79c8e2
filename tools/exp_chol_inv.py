"""Experiment: cholesky_with_inverse (all-GEMM) vs stock on TPU, plus the
full GP artifact pattern (chol + solves) both ways."""
import os, sys, time
repo = "/root/repo"; sys.path.insert(0, repo)
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
from functools import partial
from mogp_tpu.ops.blocked import cholesky_with_inverse, recursive_cholesky

def make_spd(n, d=8, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.uniform(size=(n, d))
    r2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    return (np.exp(-0.5 * r2 / 0.3**2) + 1e-4 * np.eye(n)).astype(np.float64)

def bench(fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out

stock = jax.jit(jax.lax.linalg.cholesky)
cwi = {leaf: jax.jit(partial(cholesky_with_inverse, leaf=leaf)) for leaf in (128, 256)}

# GP-artifact pattern: chol + half solve of [H | y] + full solve
@jax.jit
def gp_arts_stock(A, rhs):
    L = jax.lax.linalg.cholesky(A)
    W = jax.lax.linalg.triangular_solve(L, rhs, left_side=True, lower=True)
    full = jax.lax.linalg.triangular_solve(L, W, left_side=True, lower=True, transpose_a=True)
    return jnp.sum(jnp.log(jnp.diagonal(L))), W, full

def gp_arts_inv(A, rhs, leaf):
    L, Linv = cholesky_with_inverse(A, leaf=leaf)
    W = jnp.matmul(Linv, rhs, precision=jax.lax.Precision.HIGHEST)
    full = jnp.matmul(Linv.T, W, precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(jnp.log(jnp.diagonal(L))), W, full
gp_inv = {leaf: jax.jit(partial(gp_arts_inv, leaf=leaf)) for leaf in (128, 256)}

import scipy.linalg
print("backend:", jax.devices()[0].device_kind, flush=True)
for n in (512, 1024, 2048, 4096):
    K64 = make_spd(n)
    L64 = scipy.linalg.cholesky(K64, lower=True)
    A = jnp.asarray(K64, dtype=jnp.float32)
    rhs = jnp.asarray(np.random.RandomState(1).randn(n, 8), dtype=jnp.float32)
    flops = n**3 / 3
    dt, _ = bench(stock, A)
    print(f"n={n:5d} stock-chol   t={dt*1e3:9.3f} ms  {flops/dt/1e12:7.3f} TF/s", flush=True)
    for leaf, fn in cwi.items():
        dt, (L, Linv) = bench(fn, A)
        err = np.abs(np.asarray(Linv, np.float64) @ np.asarray(L, np.float64) - np.eye(n)).max()
        print(f"n={n:5d} cwi{leaf:<4d}     t={dt*1e3:9.3f} ms  {2*flops/dt/1e12:7.3f} TF/s(x2 work)  inv_err={err:.2e}", flush=True)
    dt, (ld_s, W_s, F_s) = bench(gp_arts_stock, A, rhs)
    print(f"n={n:5d} arts-stock   t={dt*1e3:9.3f} ms", flush=True)
    for leaf, fn in gp_inv.items():
        dt, (ld_i, W_i, F_i) = bench(fn, A, rhs)
        solve_err = np.abs(np.asarray(F_i,np.float64) - np.asarray(F_s,np.float64)).max() / max(1e-9, np.abs(np.asarray(F_s)).max())
        ld_err = abs(float(ld_i) - float(ld_s)) / abs(float(ld_s))
        print(f"n={n:5d} arts-inv{leaf:<4d} t={dt*1e3:9.3f} ms  solve_rel={solve_err:.2e} logdet_rel={ld_err:.2e}", flush=True)
