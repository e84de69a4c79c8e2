"""Loop-slope: stock vs blocked UPPER-sweep TRSM (L^T x = b) and small
leaf variants for both sweeps at the headline batched shape."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "MOGP_TPU_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from mogp_tpu.ops import blocked

B, N, M = 240, 210, 2
ITERS = 30


def loop_time(fn, *arrs, iters=ITERS):
    @jax.jit
    def run(arrs):
        def body(i, carry):
            salt, arrs = carry
            out = fn(*arrs, salt)
            return (jnp.sum(out) * 0.0, arrs)

        return lax.fori_loop(0, iters, body, (jnp.zeros((), arrs[0].dtype), arrs))[0]

    np.asarray(run(arrs))
    t0 = time.perf_counter()
    np.asarray(run(arrs))
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), "B", B, "N", N, "M", M)
    rng = np.random.RandomState(0)
    X = rng.randn(B, N, N).astype(np.float32)
    A = jnp.asarray(X @ np.transpose(X, (0, 2, 1)) + N * np.eye(N, dtype=np.float32))
    L = lax.linalg.cholesky(A)
    rhs = jnp.asarray(rng.randn(B, N, M).astype(np.float32))

    def stock_lt(l, b, s):
        return solve_triangular(l, b + s, lower=True, trans=1)[..., -1, :]

    t = loop_time(stock_lt, L, rhs)
    print(f"stock upper TRSM (trans):      {t*1e3:7.2f} ms")
    for leaf in (32, 64):
        t = loop_time(
            lambda l, b, s, leaf=leaf: blocked.trsm_left_lt(l, b + s, leaf=leaf)[..., -1, :],
            L, rhs,
        )
        print(f"blocked upper TRSM leaf={leaf:3d}:   {t*1e3:7.2f} ms")
    for leaf in (32, 48):
        t = loop_time(
            lambda l, b, s, leaf=leaf: blocked.trsm_left_lower(l, b + s, leaf=leaf)[..., -1, :],
            L, rhs,
        )
        print(f"blocked lower TRSM leaf={leaf:3d}:   {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
