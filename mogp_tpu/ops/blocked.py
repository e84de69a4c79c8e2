"""Blocked (divide-and-conquer) Cholesky and triangular solves for large n.

The reference handles multi-thousand-point training sets through LAPACK
``dpotrf`` in float64 (``mogp_emulator/linalg/cholesky.py:234-327``); on TPU
the equivalent scaling axis needs a factorization whose work lands on the
MXU.  XLA's stock ``lax.linalg.cholesky`` is a blocked algorithm too, but
its panel factorization/solve scheduling leaves the MXU idle for much of
the run at large n.  This module implements the classic recursive
formulation instead:

    A = [[A11, A21^T],      L = [[L11,   0 ],
         [A21, A22  ]]           [L21,  L22]]

    L11 = chol(A11)                       (recursive)
    L21 = A21 L11^{-T}                    (triangular solve, recursive TRSM)
    L22 = chol(A22 - L21 L21^T)           (recursive; Schur update = GEMM)

The recursion unrolls **at trace time** (all shapes static), so the entire
factorization is one XLA program dominated by large matmuls -- no masking
waste, no dynamic shapes, exact n^3/3 FLOPs.  The same recursion gives the
two TRSMs, turning XLA's slow row-by-row triangular solves into matmuls
with small leaf solves.

Failure semantics match ``lax.linalg.cholesky``: a non-positive-definite
leaf yields NaNs that propagate through every downstream block, so the
adaptive-jitter ladder in :mod:`.cholesky` detects failure exactly as it
does for the stock kernel.

All functions support leading batch dimensions (the jitter ladder
factorizes its whole candidate batch in one call) and are differentiable
by construction (chol/triangular_solve/matmul primitives only).
"""

import math

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "recursive_cholesky",
    "cholesky_with_inverse",
    "trsm_right_lt",
    "trsm_left_lower",
    "trsm_left_lt",
    "DEFAULT_LEAF",
]

# Leaf sizes are MXU-tile multiples; 256 keeps leaf factorizations cheap
# while the matmuls above them are large enough to saturate the MXU.
DEFAULT_LEAF = 256
_MXU_TILE = 128

# Schur updates must accumulate in full f32 on the MXU: the default
# (bf16-input) precision loses ~3 decimal digits per update, which at
# n >= 2048 is the difference between passing and failing the f64-oracle
# parity tolerance.
_PRECISION = lax.Precision.HIGHEST


def _split_point(n, leaf):
    """Split n into (m, n-m) with m a tile multiple, roughly balanced.

    Tile granularity is the MXU tile (128) in production; smaller leaves
    (used by tests to exercise deep recursion on tiny matrices) round to
    the leaf size instead.
    """
    tile = _MXU_TILE if leaf >= _MXU_TILE else leaf
    half = (n + 1) // 2
    m = ((half + tile - 1) // tile) * tile
    return min(max(m, 1), n - 1)


def _matmul(a, b):
    return jnp.matmul(a, b, precision=_PRECISION)


def trsm_right_lt(L, B, leaf=DEFAULT_LEAF):
    """Solve ``X @ L^T = B`` for X, with L lower-triangular.

    This is the panel step of the right-looking factorization
    (``L21 = A21 L11^{-T}``).  Recursion over the columns of L:

        [X1 X2] [[L11^T, L21^T], [0, L22^T]] = [B1 B2]
        X1 L11^T = B1
        X2 L22^T = B2 - X1 L21^T
    """
    n = L.shape[-1]
    if n <= leaf:
        return lax.linalg.triangular_solve(
            L, B, left_side=False, lower=True, transpose_a=True
        )
    m = _split_point(n, leaf)
    L11 = L[..., :m, :m]
    L21 = L[..., m:, :m]
    L22 = L[..., m:, m:]
    X1 = trsm_right_lt(L11, B[..., :, :m], leaf)
    X2 = trsm_right_lt(L22, B[..., :, m:] - _matmul(X1, _t(L21)), leaf)
    return jnp.concatenate([X1, X2], axis=-1)


def trsm_left_lower(L, B, leaf=DEFAULT_LEAF):
    """Solve ``L @ X = B`` for X, with L lower-triangular (the forward
    half-solve used by :meth:`ChoFactor.solve_L`).

        [[L11, 0], [L21, L22]] [X1; X2] = [B1; B2]
        L11 X1 = B1
        L22 X2 = B2 - L21 X1
    """
    n = L.shape[-1]
    if n <= leaf:
        return lax.linalg.triangular_solve(L, B, left_side=True, lower=True)
    m = _split_point(n, leaf)
    L11 = L[..., :m, :m]
    L21 = L[..., m:, :m]
    L22 = L[..., m:, m:]
    X1 = trsm_left_lower(L11, B[..., :m, :], leaf)
    X2 = trsm_left_lower(L22, B[..., m:, :] - _matmul(L21, X1), leaf)
    return jnp.concatenate([X1, X2], axis=-2)


def trsm_left_lt(L, B, leaf=DEFAULT_LEAF):
    """Solve ``L^T @ X = B`` for X, with L lower-triangular (the backward
    half of a full A-solve, completing :meth:`ChoFactor.solve`).

        [[L11^T, L21^T], [0, L22^T]] [X1; X2] = [B1; B2]
        L22^T X2 = B2
        L11^T X1 = B1 - L21^T X2
    """
    n = L.shape[-1]
    if n <= leaf:
        return lax.linalg.triangular_solve(
            L, B, left_side=True, lower=True, transpose_a=True
        )
    m = _split_point(n, leaf)
    L11 = L[..., :m, :m]
    L21 = L[..., m:, :m]
    L22 = L[..., m:, m:]
    X2 = trsm_left_lt(L22, B[..., m:, :], leaf)
    X1 = trsm_left_lt(L11, B[..., :m, :] - _matmul(_t(L21), X2), leaf)
    return jnp.concatenate([X1, X2], axis=-2)


def _t(x):
    return jnp.swapaxes(x, -1, -2)


def cholesky_with_inverse(A, leaf=DEFAULT_LEAF):
    """Lower Cholesky factor L of ``A`` AND its explicit inverse ``L^-1``.

    The recursion carries the inverse along:

        L    = [[L11,  0 ],     L^-1 = [[   L11^-1,       0   ],
                [L21, L22]]             [-L22^-1 L21 L11^-1, L22^-1]]

    so every panel solve becomes a GEMM against an already-available
    inverse block (``L21 = A21 (L11^-1)^T``) -- the only non-matmul work
    is one leaf-size Cholesky + one leaf-size triangular inversion per
    leaf.  Triangular solves are the latency bottleneck of the factor-
    then-solve formulation on TPU; this trades ~2x the FLOPs (all on the
    MXU) for their removal.  The explicit inverse mirrors the reference
    GPU backend, which also materializes ``invQ`` by ``potrs`` against
    the identity (``mogp_gpu/src/densegp_gpu.hpp:576-580``); with the
    adaptive jitter bounding the condition number, the accuracy loss vs
    backward-stable solves is within the f32 parity tolerance (asserted
    by the oracle tests).

    :returns: ``(L, Linv)``.
    """
    n = A.shape[-1]
    if n <= leaf:
        L = lax.linalg.cholesky(A)
        eye = jnp.eye(n, dtype=A.dtype)
        eye = jnp.broadcast_to(eye, A.shape)
        Linv = lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)
        return L, Linv
    m = _split_point(n, leaf)
    A11 = A[..., :m, :m]
    A21 = A[..., m:, :m]
    A22 = A[..., m:, m:]
    L11, L11inv = cholesky_with_inverse(A11, leaf)
    L21 = _matmul(A21, _t(L11inv))
    S22 = A22 - _matmul(L21, _t(L21))
    L22, L22inv = cholesky_with_inverse(S22, leaf)
    inv21 = -_matmul(L22inv, _matmul(L21, L11inv))
    z_top = jnp.zeros_like(_t(A21))
    L = jnp.concatenate(
        [jnp.concatenate([L11, z_top], axis=-1),
         jnp.concatenate([L21, L22], axis=-1)], axis=-2)
    Linv = jnp.concatenate(
        [jnp.concatenate([L11inv, z_top], axis=-1),
         jnp.concatenate([inv21, L22inv], axis=-1)], axis=-2)
    return L, Linv


def recursive_cholesky(A, leaf=DEFAULT_LEAF):
    """Lower Cholesky factor of ``A`` by static divide-and-conquer.

    Equivalent to ``lax.linalg.cholesky`` (including NaN fill on non-PD
    input) but with the O(n^3) work expressed as large MXU matmuls.
    Supports leading batch dims.  Replaces LAPACK ``dpotrf`` for the
    large-n axis (reference ``linalg/cholesky.py:264``).
    """
    n = A.shape[-1]
    if n <= leaf:
        return lax.linalg.cholesky(A)
    m = _split_point(n, leaf)
    A11 = A[..., :m, :m]
    A21 = A[..., m:, :m]
    A22 = A[..., m:, m:]
    L11 = recursive_cholesky(A11, leaf)
    L21 = trsm_right_lt(L11, A21, leaf)
    S22 = A22 - _matmul(L21, _t(L21))
    L22 = recursive_cholesky(S22, leaf)
    top = jnp.concatenate([L11, jnp.zeros_like(_t(A21))], axis=-1)
    bot = jnp.concatenate([L21, L22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
