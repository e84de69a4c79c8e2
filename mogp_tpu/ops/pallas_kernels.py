"""Pallas TPU kernels for the hot covariance ops.

TPU-native replacement for the reference's CUDA covariance kernels
(``mogp_gpu/src/kernel.cu:170-178``: hand-tiled thread grids for
``cov_batch_gpu``).  The kernel matrix build is the O(n*m*D) hot op of
every GP fit iteration and every prediction sweep; here it is a single
fused Pallas kernel:

* inputs are pre-scaled on the host side of the call (``z = x *
  exp(theta/2)``), so the kernel computes ``r2 = |z1|^2 + |z2|^2 -
  2 z1 z2^T`` with one MXU matmul per tile and applies the kernel
  function (SqExp / Matern-5/2) on the VPU before the tile ever leaves
  VMEM -- no (n, m) intermediate in HBM.
* tiles are (128, 128) MXU-aligned; ragged edges are handled by padding
  to tile multiples and slicing the result.

A jnp reference path with identical semantics backs the same API off-TPU
(``kernel_matrix`` dispatches on ``config.use_pallas()``), mirroring the
reference's CPU/GPU duality without a second math implementation.
"""

import functools

import jax
import jax.numpy as jnp

from ..config import use_pallas

__all__ = ["pallas_kernel_matrix", "kernel_matrix"]

_TILE_M = 128
_TILE_N = 128


def _kernel_body(base, z1_ref, sq1_ref, z2_ref, sq2_ref, out_ref):
    """One (TILE_M, TILE_N) tile: fused distance + kernel function."""
    z1 = z1_ref[:]          # (TILE_M, D)
    z2 = z2_ref[:]          # (TILE_N, D)
    acc_dtype = jnp.float32 if z1.dtype != jnp.float64 else jnp.float64
    cross = jax.lax.dot_general(
        z1, z2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc_dtype,
    )
    r2 = sq1_ref[:] + sq2_ref[:].T - 2.0 * cross
    r2 = jnp.maximum(r2, 0.0)
    if base == "sqexp":
        k = jnp.exp(-0.5 * r2)
    else:  # mat52
        pos = r2 > 0.0
        safe = jnp.where(pos, r2, 1.0)
        r = jnp.sqrt(5.0 * safe)
        k = jnp.where(pos, (1.0 + r + (5.0 / 3.0) * safe) * jnp.exp(-r), 1.0)
    out_ref[:] = k.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("base", "interpret"))
def pallas_kernel_matrix(z1, z2, base="sqexp", interpret=False):
    """Fused kernel matrix for pre-scaled inputs.

    :param z1: ``(n, D)`` scaled inputs (``x * exp(theta/2)``).
    :param z2: ``(m, D)`` scaled inputs.
    :param base: ``"sqexp"`` or ``"mat52"``.
    :returns: ``(n, m)`` kernel matrix.
    """
    from jax.experimental import pallas as pl

    n, D = z1.shape
    m = z2.shape[0]
    dtype = z1.dtype

    def round_up(x, t):
        return -(-x // t) * t

    n_pad = round_up(max(n, 8), _TILE_M)
    m_pad = round_up(max(m, 8), _TILE_N)
    d_pad = round_up(max(D, 1), 128)

    z1p = jnp.zeros((n_pad, d_pad), dtype=dtype).at[:n, :D].set(z1)
    z2p = jnp.zeros((m_pad, d_pad), dtype=dtype).at[:m, :D].set(z2)
    # padded rows have z = 0 -> r2 vs other pad rows is 0 -> K=1 in the
    # pad region, which is sliced away below.
    sq1 = jnp.sum(z1p * z1p, axis=1, keepdims=True)  # (n_pad, 1)
    sq2 = jnp.sum(z2p * z2p, axis=1, keepdims=True)  # (m_pad, 1)

    grid = (n_pad // _TILE_M, m_pad // _TILE_N)

    out = pl.pallas_call(
        functools.partial(_kernel_body, base),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_M, d_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((_TILE_M, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((_TILE_N, d_pad), lambda i, j: (j, 0)),
            pl.BlockSpec((_TILE_N, 1), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((_TILE_M, _TILE_N), lambda i, j: (i, j)),
        interpret=interpret,
    )(z1p, sq1, z2p, sq2)

    return out[:n, :m]


def kernel_matrix(x1, x2, exp_theta, base="sqexp"):
    """Kernel matrix with automatic Pallas dispatch.

    Same semantics as ``kernels.squared_distance`` + base function; uses
    the fused Pallas kernel on TPU and the jnp path elsewhere.
    """
    from .kernels import _BASE_FNS, squared_distance

    scale = jnp.sqrt(exp_theta)
    z1 = x1 * scale
    z2 = x2 * scale
    if use_pallas():
        return pallas_kernel_matrix(z1, z2, base=base)
    return _BASE_FNS[base](squared_distance(x1, x2, exp_theta))
