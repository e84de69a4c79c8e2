"""On-device breakdown of the batched MAP-fit objective (loop-slope method).

Measures per-evaluation cost of each stage of the lean objective at the
headline bench shape (240 lanes, n=210, D=14) by timing an on-device
``lax.fori_loop`` over ITERS dependent evaluations and reporting the
slope, which excludes dispatch overhead (~21 ms/RPC via the axon
tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "MOGP_TPU_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mogp_tpu.models.gp import gp_nlp, make_gp_data
from mogp_tpu.models.priors import GPPriors
from mogp_tpu.ops.kernels import get_kernel

LANES = int(os.environ.get("PROF_LANES", "240"))
N = int(os.environ.get("PROF_N", "210"))
D = int(os.environ.get("PROF_D", "14"))
ITERS = int(os.environ.get("PROF_ITERS", "30"))


def loop_time(fn, *args, iters=ITERS):
    """Time `iters` dependent applications of fn inside one jitted loop."""

    @jax.jit
    def run(args):
        def body(i, carry):
            out = fn(*carry[1:], salt=carry[0])
            return (out, *carry[1:])

        final = lax.fori_loop(0, iters, body, (jnp.zeros((), args[0].dtype), *args))
        return final[0]

    r = run(args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(args)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    return dt / iters


def main():
    print("devices:", jax.devices())
    dtype = jnp.float32
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.uniform(size=(N, D)), dtype)
    kernel = get_kernel("SquaredExponential")
    n_corr = D

    # lane-stacked data
    y = jnp.asarray(rng.randn(LANES, N), dtype)
    theta = jnp.asarray(rng.randn(LANES, n_corr + 1) * 0.1, dtype)

    priors = GPPriors.default_priors(np.asarray(X), n_corr, nugget_type="adaptive")
    data1 = make_gp_data(np.asarray(X), np.asarray(y[0]), np.ones((N, 1)), priors)
    datas = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (LANES,) + a.shape), data1
    )
    # per-lane targets
    datas = datas._replace(targets=y)

    def kbuild(theta, X, salt=0.0):
        def one(th):
            corr = th[:n_corr] + salt * 1e-20
            return jnp.exp(th[n_corr]) * kernel.kernel_f(X, X, corr)
        Ks = jax.vmap(one)(theta)
        return jnp.sum(Ks) * 1e-20

    t = loop_time(kbuild, theta, X)
    print(f"K build (vmapped, {LANES} lanes): {t*1e3:.2f} ms  ({t/LANES*1e6:.1f} us/lane)")

    # materialize a PSD batch for chol/solve timing
    def one_k(th):
        K = jnp.exp(th[n_corr]) * kernel.kernel_f(X, X, th[:n_corr])
        return K + 1e-4 * jnp.eye(N, dtype=dtype)
    Ks = jax.jit(jax.vmap(one_k))(theta)
    Ks = jax.block_until_ready(Ks)

    def chol(Ks, salt=0.0):
        L = lax.linalg.cholesky(Ks + salt * 1e-20)
        return jnp.sum(L) * 1e-20

    t = loop_time(chol, Ks)
    print(f"XLA batched Cholesky: {t*1e3:.2f} ms  ({t/LANES*1e6:.1f} us/matrix)")

    Ls = jax.block_until_ready(jax.jit(lax.linalg.cholesky)(Ks))
    rhs = jnp.asarray(rng.randn(LANES, N, 2), dtype)

    def trisolve(Ls, rhs, salt=0.0):
        W = lax.linalg.triangular_solve(
            Ls, rhs + salt * 1e-20, left_side=True, lower=True
        )
        return jnp.sum(W) * 1e-20

    t = loop_time(trisolve, Ls, rhs)
    print(f"batched solve_L (rhs 2 cols): {t*1e3:.2f} ms  ({t/LANES*1e6:.1f} us/lane)")

    def trisolve_wide(Ls, salt=0.0):
        eye = jnp.eye(N, dtype=dtype)
        W = lax.linalg.triangular_solve(
            Ls + salt * 1e-20, jnp.broadcast_to(eye, Ls.shape),
            left_side=True, lower=True,
        )
        return jnp.sum(W) * 1e-20

    t = loop_time(trisolve_wide, Ls)
    print(f"batched solve_L (rhs N cols, = L^-1): {t*1e3:.2f} ms  ({t/LANES*1e6:.1f} us/lane)")

    # lean objective value only
    def nlp_val(theta, salt=0.0):
        def one(th, d):
            return gp_nlp(th + salt * 1e-20, d, kernel, "adaptive",
                          True, "single")
        return jnp.sum(jax.vmap(one)(theta, datas)) * 1e-20

    t = loop_time(nlp_val, theta)
    print(f"lean gp_nlp value: {t*1e3:.2f} ms  ({t/LANES*1e6:.1f} us/lane)")

    # value and grad
    def nlp_vg(theta, salt=0.0):
        def one(th, d):
            return gp_nlp(th + salt * 1e-20, d, kernel, "adaptive",
                          True, "single")
        v, g = jax.vmap(jax.value_and_grad(one))(theta, datas)
        return (jnp.sum(v) + jnp.sum(g)) * 1e-20

    t = loop_time(nlp_vg, theta)
    print(f"lean value_and_grad: {t*1e3:.2f} ms  ({t/LANES*1e6:.1f} us/lane)")

    # pallas batched cholesky for comparison
    if os.environ.get("PROF_PALLAS", "1") == "1":
        try:
            from pallas_cholesky_experiment import cholesky_batched

            def pchol(Ks, salt=0.0):
                L = cholesky_batched(Ks + salt * 1e-20)
                return jnp.sum(L) * 1e-20

            t = loop_time(pchol, Ks, iters=ITERS)
            print(f"Pallas batched Cholesky: {t*1e3:.2f} ms  ({t/LANES*1e6:.1f} us/matrix)")
        except Exception as e:
            print("pallas chol failed:", type(e).__name__, e)




def batch_scaling():
    """Per-matrix cost of chol + value_and_grad at different lane counts."""
    print("devices:", jax.devices())
    dtype = jnp.float32
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.uniform(size=(N, D)), dtype)
    kernel = get_kernel("SquaredExponential")
    n_corr = D
    priors = GPPriors.default_priors(np.asarray(X), n_corr, nugget_type="adaptive")

    bs = tuple(int(b) for b in os.environ.get(
        "PROF_BATCHES", "60,240,480,960").split(","))
    skip_vg = os.environ.get("PROF_SKIP_VG", "0") == "1"
    for B in bs:
        y = jnp.asarray(rng.randn(B, N), dtype)
        theta = jnp.asarray(rng.randn(B, n_corr + 1) * 0.1, dtype)
        data1 = make_gp_data(np.asarray(X), np.asarray(y[0]), np.ones((N, 1)), priors)
        datas = jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), data1
        )
        datas = datas._replace(targets=y)

        def one_k(th):
            K = jnp.exp(th[n_corr]) * kernel.kernel_f(X, X, th[:n_corr])
            return K + 1e-4 * jnp.eye(N, dtype=dtype)
        Ks = jax.block_until_ready(jax.jit(jax.vmap(one_k))(theta))

        def chol(Ks, salt=0.0):
            L = lax.linalg.cholesky(Ks + salt * 1e-20)
            return jnp.sum(L) * 1e-20

        tc = loop_time(chol, Ks, iters=ITERS)
        if skip_vg:
            print(f"B={B:4d}: chol {tc*1e3:7.2f} ms ({tc/B*1e6:5.1f} us/mat)")
            continue

        def nlp_vg(theta, salt=0.0):
            def one(th, d):
                return gp_nlp(th + salt * 1e-20, d, kernel, "adaptive",
                              True, "single")
            v, g = jax.vmap(jax.value_and_grad(one))(theta, datas)
            return (jnp.sum(v) + jnp.sum(g)) * 1e-20

        tv = loop_time(nlp_vg, theta, iters=ITERS)
        print(f"B={B:4d}: chol {tc*1e3:7.2f} ms ({tc/B*1e6:5.1f} us/mat)   "
              f"vg {tv*1e3:7.2f} ms ({tv/B*1e6:5.1f} us/lane)")


if __name__ == "__main__":
    if os.environ.get("PROF_MODE") == "scaling":
        batch_scaling()
    else:
        main()
