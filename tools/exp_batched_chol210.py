"""Loop-slope comparison: stock vs recursive-blocked Cholesky at the
headline batched shape (240 lanes, n=210, f32).

The lean objective spends ~42% of its time in the batched Cholesky
(profile_fit.py: 9.15 ms / 38 us/matrix at 240 lanes); this experiment
checks whether the recursive blocked form (MXU Schur updates, small
lockstep leaves) beats XLA's stock batched factorization at the
SMALL-n, LARGE-batch shape (docs/tpu_performance.md only measured
single large matrices).
"""

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

from mogp_tpu.ops import blocked

B = int(os.environ.get("EXP_B", "240"))
N = int(os.environ.get("EXP_N", "210"))
ITERS = int(os.environ.get("EXP_ITERS", "30"))


def loop_time(fn, A, iters=ITERS):
    @jax.jit
    def run(A):
        def body(i, carry):
            salt, A = carry
            L = fn(A + salt * jnp.eye(A.shape[-1], dtype=A.dtype))
            return (jnp.sum(L[..., -1, -1]) * 0.0, A)

        return lax.fori_loop(0, iters, body, (jnp.zeros((), A.dtype), A))[0]

    np.asarray(run(A))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(A))
    dt = time.perf_counter() - t0
    return dt / iters


def main():
    print("devices:", jax.devices(), "B", B, "N", N)
    rng = np.random.RandomState(0)
    X = rng.randn(B, N, N).astype(np.float32)
    A = jnp.asarray(X @ np.transpose(X, (0, 2, 1)) + N * np.eye(N, dtype=np.float32))

    variants = [
        ("stock lax.linalg.cholesky", lax.linalg.cholesky),
        ("recursive leaf=64", lambda a: blocked.recursive_cholesky(a, leaf=64)),
        ("recursive leaf=128", lambda a: blocked.recursive_cholesky(a, leaf=128)),
    ]
    for name, fn in variants:
        # correctness spot check vs stock on 4 matrices
        L = np.asarray(fn(A[:4]))
        Lref = np.asarray(lax.linalg.cholesky(A[:4]))
        err = np.max(np.abs(L - Lref)) / np.max(np.abs(Lref))
        t = loop_time(fn, A)
        print(f"{name:28s} {t*1e3:8.2f} ms  ({t/B*1e6:6.1f} us/matrix)  relerr {err:.2e}")


if __name__ == "__main__":
    main()
