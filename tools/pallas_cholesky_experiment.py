"""Batch-vectorized Cholesky factorization as a Pallas TPU kernel.

The GP fit loop factorizes thousands of small (n ~ a few hundred)
covariance matrices per batched L-BFGS step -- outputs x restarts x
jitter candidates.  XLA's TPU Cholesky processes a batch with a ~40us
per-matrix throughput floor (sequential panel recursion per matrix),
which makes the whole MAP fit Cholesky-bound (measured: ~83% of a
batched value_and_grad evaluation).

This kernel vectorizes *across the batch* instead: all matrices in a
VMEM-resident chunk advance through the same unblocked right-looking
factorization in lockstep, so each of the n steps is one wide VPU
operation over (chunk, n) / (chunk, n, n) slices:

    step j:  d      = sqrt(A[:, j, j])
             L[:, >=j, j] = A[:, >=j, j] / d      (column scale)
             A      -= u u^T,  u = L[:, >j, j]    (rank-1 update)

The rank-1 update needs no explicit masking: the scaled column is
zeroed at indices <= j, so the outer product vanishes outside the
trailing submatrix.  Non-positive-definite inputs produce NaNs from the
sqrt that propagate through the trailing updates, matching the NaN-fill
contract of ``lax.linalg.cholesky`` that the adaptive-jitter search
relies on.

This is the TPU-native counterpart of the reference GPU backend's
cuSOLVER ``potrf`` usage (``mogp_gpu/src/densegp_gpu.hpp:451-470``).

Status: RETIRED EXPERIMENT (moved out of the package in round 4 so
``mogp_tpu/`` contains only load-bearing code).  On a single-core v5e
the kernel is VMEM-capacity limited (the whole (chunk, n, n) block must
be resident, which caps the lane utilization of the batch-vectorized
steps).  Measured at the production fit shape (240 lanes, n=210, f32,
same-session A/B, round 4): 117.5 us/matrix vs 46.8 for stock XLA and
36.9 for the production recursive blocked dispatch
(``ops/blocked.py`` at leaf=32) -- ~3x off, consistent across rounds
2-4.  The production path stays on the blocked/XLA factorizations; this
file is kept as the starting point for parts with larger VMEM.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["cholesky_batched"]

# VMEM budget per block: chunk * n_pad^2 * 4 bytes (plus pipeline copies).
_VMEM_BUDGET = 6 * 1024 * 1024


def _chol_kernel(n, a_ref, out_ref):
    """Factor a (chunk, n, n) block in VMEM, vectorized over the chunk.

    Mosaic cannot prove alignment for dynamic indices in the lane (last)
    dimension, so column extraction/writeback is expressed as masked
    reductions/selects over the full block -- the n steps are then pure
    wide VPU operations with no dynamic lane indexing.
    """
    out_ref[:] = a_ref[:]
    chunk = a_ref.shape[0]

    row_iota = lax.broadcasted_iota(jnp.int32, (chunk, n, n), 1)
    col_iota = lax.broadcasted_iota(jnp.int32, (chunk, n, n), 2)
    rvec_iota = lax.broadcasted_iota(jnp.int32, (chunk, n), 1)

    def step(j, _):
        W = out_ref[:]
        onehot = col_iota == j                       # (chunk, n, n)
        colj = jnp.sum(jnp.where(onehot, W, 0.0), axis=2)  # (chunk, n)
        piv = jnp.sum(
            jnp.where(rvec_iota == j, colj, 0.0), axis=1
        )                                            # (chunk,)
        d = jnp.sqrt(piv)[:, None]
        col_scaled = jnp.where(
            rvec_iota > j,
            colj / d,
            jnp.where(rvec_iota == j, jnp.broadcast_to(d, colj.shape), 0.0),
        )                                            # (chunk, n)
        u = jnp.where(rvec_iota > j, col_scaled, 0.0)
        # fused writeback: column j gets the scaled values, the trailing
        # submatrix gets the rank-1 update (u is zero at indices <= j)
        W_new = jnp.where(
            onehot,
            col_scaled[:, :, None],
            W - u[:, :, None] * u[:, None, :],
        )
        out_ref[:] = W_new
        return 0

    lax.fori_loop(0, n, step, 0)

    # keep only the lower triangle
    out_ref[:] = jnp.where(row_iota >= col_iota, out_ref[:], 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_batched(A, interpret=False):
    """Lower Cholesky of a batch of SPD matrices, ``(B, n, n) -> (B, n, n)``.

    Pads n to a lane multiple (identity-extended, so the factor of the
    padding block is the identity) and the batch to a chunk multiple.
    NaN-fills (from the padded matrices' perspective, only genuinely
    non-PD inputs produce NaNs).
    """
    from jax.experimental import pallas as pl

    B, n, n2 = A.shape
    assert n == n2, "cholesky_batched requires square matrices"
    dtype = A.dtype

    n_pad = max(-(-n // 128) * 128, 128)
    # chunk size under the VMEM budget, at least 1, multiple of 8 when possible
    chunk = max(1, _VMEM_BUDGET // (n_pad * n_pad * 4))
    if chunk >= 8:
        chunk = (chunk // 8) * 8
    b_pad = -(-B // chunk) * chunk

    eye = jnp.eye(n_pad, dtype=dtype)
    Ap = jnp.tile(eye[None], (b_pad, 1, 1))
    Ap = Ap.at[:B, :n, :n].set(A)

    out = pl.pallas_call(
        functools.partial(_chol_kernel, n_pad),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, n_pad), dtype),
        grid=(b_pad // chunk,),
        in_specs=[pl.BlockSpec((chunk, n_pad, n_pad), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((chunk, n_pad, n_pad), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(Ap)

    return out[:B, :n, :n]
