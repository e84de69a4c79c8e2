"""Consolidated TPU measurement campaign — ONE process, clean exit.

Measures, with chained-dependency fori_loop harnesses and host pulls
(the only honest timing over the axon tunnel):

1. stock vs blocked Cholesky at n=256..4096 (single + ladder batch)
2. jnp vs Pallas kernel-matrix build for prediction-sweep shapes
3. the gp_predict sweep end-to-end with each K* path

Prints one line per measurement; exits only after draining the device
queue (device_get on everything) to avoid wedging the tunnel.
"""
import os
import sys
import time
from functools import partial

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))

from mogp_tpu.ops.blocked import recursive_cholesky
from mogp_tpu.ops.kernels import SquaredExponential, squared_distance, _BASE_FNS
from mogp_tpu.ops.pallas_kernels import pallas_kernel_matrix


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
            return jnp.sum(
                jnp.log(jnp.abs(jnp.diagonal(L, axis1=-2, axis2=-1)))
            ) * jnp.float32(1e-30)
        return lax.fori_loop(0, iters, body, jnp.float32(0.0))
    return run


def slope_time(run, A, iters):
    float(run(A, iters))          # compile + warm
    float(run(A, 2 * iters))      # compile second count
    t0 = time.perf_counter(); float(run(A, iters)); t1 = time.perf_counter()
    float(run(A, 2 * iters)); t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / iters


def part1():
    stock = chain_chol(jax.lax.linalg.cholesky)
    blk = chain_chol(partial(recursive_cholesky, leaf=256))
    for n in (256, 512, 1024, 2048, 4096):
        A = jnp.asarray(make_spd(n))
        Ab = jnp.asarray(np.broadcast_to(np.asarray(A), (6, n, n)).copy())
        fl = n ** 3 / 3
        iters = int(min(64, max(4, 2e9 / fl)))
        for name, run, arr, mult in (
            ("stock", stock, A, 1), ("blk256", blk, A, 1),
            ("stockB6", stock, Ab, 6), ("blk256B6", blk, Ab, 6),
        ):
            it = max(2, iters // mult)
            dt = slope_time(run, arr, it)
            print(f"CHOL n={n:5d} {name:9s} t={dt*1e3:9.3f} ms "
                  f"{mult*fl/dt/1e12:7.3f} TF/s", flush=True)


def chain_kmat(fn):
    """fn(z1, z2) -> K; chained over iterations via a scalar carry."""
    @partial(jax.jit, static_argnames=("iters",))
    def run(z1, z2, iters):
        def body(i, carry):
            K = fn(z1 + carry, z2)
            return jnp.sum(K[0, :8]) * jnp.float32(1e-30)
        return lax.fori_loop(0, iters, body, jnp.float32(0.0))
    return run


def part2():
    n, D = 210, 14
    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.uniform(size=(n, D)).astype(np.float32))
    for m in (8192, 65536, 262144):
        x2 = jnp.asarray(rng.uniform(size=(m, D)).astype(np.float32))
        exp_theta = jnp.asarray(np.exp(rng.uniform(-1, 1, D)).astype(np.float32))
        scale = jnp.sqrt(exp_theta)
        for base in ("sqexp", "mat52"):
            jnp_fn = chain_kmat(
                lambda a, b, base=base: _BASE_FNS[base](
                    squared_distance(a, b, exp_theta))
            )
            pal_fn = chain_kmat(
                lambda a, b, base=base: pallas_kernel_matrix(
                    a * scale, b * scale, base=base)
            )
            gb = (n * m * 4) / 1e9  # output bytes
            for name, fn in (("jnp", jnp_fn), ("pallas", pal_fn)):
                dt = slope_time_k(fn, x1, x2, 8)
                print(f"KMAT {base} m={m:7d} {name:7s} t={dt*1e3:9.3f} ms "
                      f"({gb/dt:6.1f} GB/s out)", flush=True)
        del x2


def slope_time_k(run, a, b, iters):
    float(run(a, b, iters))
    float(run(a, b, 2 * iters))
    t0 = time.perf_counter(); float(run(a, b, iters)); t1 = time.perf_counter()
    float(run(a, b, 2 * iters)); t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / iters


def part3():
    """gp_predict sweep end-to-end, pallas vs jnp dispatch."""
    import mogp_tpu

    rng = np.random.RandomState(0)
    n, D = 210, 14
    x = rng.uniform(size=(n, D))
    y = np.sin(3 * x[:, 0]) + x[:, 1]
    gp = mogp_tpu.fit_GP_MAP(
        mogp_tpu.GaussianProcess(x, y, nugget="adaptive"), n_tries=3,
        maxiter=30)
    for m in (65536, 262144):
        q = rng.uniform(size=(m, D))
        for mode, env in (("pallas", "0"), ("jnp", "1")):
            os.environ["MOGP_TPU_DISABLE_PALLAS"] = env
            # unique query count per mode to force a fresh trace
            qq = q if mode == "pallas" else q[:-1]
            mu, var, _ = gp.predict(qq)  # warm
            t0 = time.perf_counter()
            mu, var, _ = gp.predict(qq)
            dt = time.perf_counter() - t0
            print(f"PREDICT m={qq.shape[0]:7d} {mode:7s} t={dt*1e3:9.2f} ms "
                  f"({qq.shape[0]/dt/1e6:6.2f} Mpts/s)", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind, flush=True)
    parts = sys.argv[1:] or ["1", "2", "3"]
    if "1" in parts:
        part1()
    if "2" in parts:
        part2()
    if "3" in parts:
        part3()
    print("DONE", flush=True)
    time.sleep(2)  # drain before exit; avoid wedging the tunnel
