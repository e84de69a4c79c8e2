"""Experiment: blocked batch-vectorized Cholesky Pallas kernel.

Compares XLA's batched Cholesky against a Pallas kernel that advances a
VMEM-resident chunk of matrices in lockstep through a BLOCKED right-
looking factorization: 128-column panels factored by rank-1 VPU steps
(with a symmetry trick so no per-step transpose is needed), trailing
Schur complements updated on the MXU.
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128


def _chol_blocked_kernel(n_pad, chunk, a_ref, out_ref):
    """Blocked right-looking Cholesky over a (chunk, n_pad, n_pad) block.

    Invariant: before panel kb, the trailing submatrix (rows/cols >=
    kb*BLK) of out_ref holds the full SYMMETRIC Schur complement; columns
    < kb*BLK hold final L columns (zeros above the diagonal).
    """
    out_ref[:] = a_ref[:]
    n_blocks = n_pad // BLK

    for kb in range(n_blocks):
        base = kb * BLK
        R = n_pad - base  # rows in this panel (static)

        row_iota = lax.broadcasted_iota(jnp.int32, (chunk, R), 1)
        lane_iota = lax.broadcasted_iota(jnp.int32, (chunk, BLK), 1)

        def panel_step(j, _, base=base, R=R, row_iota=row_iota,
                       lane_iota=lane_iota):
            panel = out_ref[:, base:, base:base + BLK]  # (chunk, R, BLK)
            # row j of the block (lane layout) == column j restricted to
            # block rows, by the maintained symmetry of the trailing part.
            # Mosaic requires aligned dynamic sublane loads: load the
            # 8-aligned tile containing row j, then mask-reduce within it.
            j8 = pl.multiple_of((j // 8) * 8, 8)
            tile = out_ref[:, pl.ds(base + j8, 8), base:base + BLK]
            sub_iota = lax.broadcasted_iota(jnp.int32, (chunk, 8, BLK), 1)
            rowj = jnp.sum(
                jnp.where(sub_iota == (j % 8), tile, 0.0), axis=1
            )  # (chunk, BLK)
            pivot = jnp.sum(jnp.where(lane_iota == j, rowj, 0.0), axis=1)
            inv_d = lax.rsqrt(pivot)[:, None]  # (chunk, 1)
            # column j over all panel rows (sublane layout): masked reduce
            colj = jnp.sum(
                jnp.where(
                    lax.broadcasted_iota(jnp.int32, (chunk, R, BLK), 2) == j,
                    panel, 0.0),
                axis=2)  # (chunk, R)
            u = jnp.where(row_iota > j, colj * inv_d, 0.0)       # (chunk, R)
            v = jnp.where(lane_iota > j, rowj * inv_d, 0.0)      # (chunk, BLK)
            newcol = jnp.where(
                row_iota == j, pivot[:, None] * inv_d, u)        # (chunk, R)
            # v is zero at lane j, so the FMA leaves lane j unchanged;
            # then overwrite lane j with the scaled column
            upd = panel - u[:, :, None] * v[:, None, :]
            upd = jnp.where(
                lax.broadcasted_iota(jnp.int32, (chunk, R, BLK), 2) == j,
                newcol[:, :, None], upd)
            out_ref[:, base:, base:base + BLK] = upd
            return 0

        lax.fori_loop(0, BLK, panel_step, 0, unroll=False)

        # Schur update of the trailing symmetric block on the MXU
        if base + BLK < n_pad:
            L21 = out_ref[:, base + BLK:, base:base + BLK]  # (chunk, R2, BLK)
            for c in range(chunk):
                lc = L21[c]
                out_ref[c, base + BLK:, base + BLK:] = (
                    out_ref[c, base + BLK:, base + BLK:]
                    - jnp.dot(lc, lc.T, preferred_element_type=jnp.float32)
                )

    # zero the strictly-upper part
    ri = lax.broadcasted_iota(jnp.int32, (chunk, n_pad, n_pad), 1)
    ci = lax.broadcasted_iota(jnp.int32, (chunk, n_pad, n_pad), 2)
    out_ref[:] = jnp.where(ri >= ci, out_ref[:], 0.0)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def chol_blocked(A, chunk=8, interpret=False):
    B, n, _ = A.shape
    dtype = A.dtype
    n_pad = max(-(-n // BLK) * BLK, BLK)
    b_pad = -(-B // chunk) * chunk

    eye = jnp.eye(n_pad, dtype=dtype)
    Ap = jnp.tile(eye[None], (b_pad, 1, 1))
    Ap = Ap.at[:B, :n, :n].set(A)

    out = pl.pallas_call(
        functools.partial(_chol_blocked_kernel, n_pad, chunk),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, n_pad), dtype),
        grid=(b_pad // chunk,),
        in_specs=[pl.BlockSpec((chunk, n_pad, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, n_pad, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Ap)
    return out[:B, :n, :n]


def loop_time(fn, *args, iters=20):
    assert len(args) == 1, "loop_time threads exactly one positional arg through the carry"
    @jax.jit
    def run(args):
        def body(i, carry):
            out = fn(carry[1] + carry[0] * 1e-20)
            return (jnp.sum(out) * 1e-20, carry[1])
        return lax.fori_loop(0, iters, body,
                             (jnp.zeros((), args[0].dtype), args[0]))[0]

    r = jax.block_until_ready(run(args))
    t0 = time.perf_counter()
    r = jax.block_until_ready(run(args))
    return (time.perf_counter() - t0) / iters


def main():
    n = int(os.environ.get("EXP_N", "210"))
    B = int(os.environ.get("EXP_B", "240"))
    chunk = int(os.environ.get("EXP_CHUNK", "8"))
    rng = np.random.RandomState(0)
    X = rng.randn(B, n, n + 8).astype(np.float32)
    A = jnp.asarray(X @ np.transpose(X, (0, 2, 1)) + n * np.eye(n)[None],
                    jnp.float32)

    # correctness (on whatever backend we're on)
    L = jax.block_until_ready(chol_blocked(A[:8], chunk=chunk))
    Lref = jax.block_until_ready(jax.vmap(jnp.linalg.cholesky)(A[:8]))
    err = float(jnp.max(jnp.abs(L - Lref) / (1.0 + jnp.abs(Lref))))
    print(f"max rel err vs XLA: {err:.2e}")

    t_xla = loop_time(lambda a: lax.linalg.cholesky(a), A)
    print(f"XLA   : {t_xla*1e3:7.2f} ms ({t_xla/B*1e6:5.1f} us/mat)")
    t_pal = loop_time(lambda a: chol_blocked(a, chunk=chunk), A)
    print(f"Pallas: {t_pal*1e3:7.2f} ms ({t_pal/B*1e6:5.1f} us/mat)  "
          f"chunk={chunk}")




# ---------------------------------------------------------------------------
# v2: two-level blocking (rank-8 micro-panels in transposed layout)
# ---------------------------------------------------------------------------

MICRO = int(os.environ.get("EXP_MICRO", "8"))
# Ablation flags are read ONCE at import: reading os.environ inside the
# jitted kernel would bake the value into the first trace and silently
# ignore later changes within the same process.
EXP_ABLATE = os.environ.get("EXP_ABLATE")
EXP_BATCHED_DOT = os.environ.get("EXP_BATCHED_DOT", "0") == "1"


def _chol_v2_kernel(n_pad, chunk, a_ref, out_ref):
    """Blocked Cholesky: 128-col panels; inside each panel, rank-8
    micro-panels factored in a (chunk, 8, R) transposed layout, applied
    back with one rank-8 panel FMA; trailing Schur on the MXU."""
    out_ref[:] = a_ref[:]
    n_blocks = n_pad // BLK

    for kb in range(n_blocks):
        base = kb * BLK
        R = n_pad - base

        laneR = lax.broadcasted_iota(jnp.int32, (chunk, R), 1)
        lane8 = lax.broadcasted_iota(jnp.int32, (chunk, MICRO, MICRO), 2)
        sub8 = lax.broadcasted_iota(jnp.int32, (chunk, MICRO), 1)

        for mb in range(BLK // MICRO):
            j0 = mb * MICRO
            # extract micro-panel transposed: Mt[c,k,r] = P[c,r,j0+k]
            P = out_ref[:, base:, base:base + BLK]           # (C, R, BLK)
            if EXP_ABLATE == "noextract":
                Mt = jnp.broadcast_to(
                    P[:, :1, :1], (chunk, MICRO, R)) * 1.0 + 1.0
            else:
                Mt = jnp.swapaxes(P[:, :, j0:j0 + MICRO], 1, 2)  # (C, 8, R)

            newrows = []
            _steps = 1 if EXP_ABLATE == "steps" else MICRO
            for k in range(_steps):
                jg = j0 + k
                rowk = Mt[:, k, :]                            # (C, R)
                pivot = rowk[:, jg]                           # (C,)
                inv_d = lax.rsqrt(pivot)[:, None]
                u = jnp.where(laneR > jg, rowk * inv_d, 0.0)  # (C, R)
                newrow = jnp.where(
                    laneR == jg, pivot[:, None] * inv_d, u)
                newrows.append(newrow)
                # w8[c,kk] = u[c, j0+kk] via the symmetric diag tile
                tile = Mt[:, :, j0:j0 + MICRO]                # (C, 8, 8)
                w8 = jnp.sum(jnp.where(lane8 == k, tile, 0.0), axis=2)
                w8 = jnp.where(sub8 > k, w8 * inv_d, 0.0)     # (C, 8)
                Mt = Mt - w8[:, :, None] * u[:, None, :]

            while len(newrows) < MICRO:
                newrows.append(newrows[-1])
            Lt = jnp.stack(newrows, axis=1)                   # (C, 8, R)
            # write the 8 finished columns back (transposed store)
            out_ref[:, base:, base + j0:base + j0 + MICRO] = (
                jnp.swapaxes(Lt, 1, 2))
            # rank-8 update of the remaining panel columns:
            # P[c,r,l] -= sum_k Lt[c,k,r] * V8[c,k,l],  V8 = Lt[:, :, :BLK]
            # masked to lanes l > j0+7
            laneB = lax.broadcasted_iota(jnp.int32, (chunk, MICRO, BLK), 2)
            V8 = jnp.where(laneB > j0 + MICRO - 1, Lt[:, :, :BLK], 0.0)
            if EXP_ABLATE == "nodot":
                pass
            elif EXP_BATCHED_DOT:
                upd = lax.dot_general(
                    Lt, V8, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                out_ref[:, base:, base:base + BLK] = (
                    out_ref[:, base:, base:base + BLK] - upd)
            else:
                for c in range(chunk):
                    upd = jnp.dot(Lt[c].T, V8[c],
                                  preferred_element_type=jnp.float32)
                    out_ref[c, base:, base:base + BLK] = (
                        out_ref[c, base:, base:base + BLK] - upd)

        # Schur update of the trailing block on the MXU
        if base + BLK < n_pad:
            L21 = out_ref[:, base + BLK:, base:base + BLK]
            for c in range(chunk):
                lc = L21[c]
                out_ref[c, base + BLK:, base + BLK:] = (
                    out_ref[c, base + BLK:, base + BLK:]
                    - jnp.dot(lc, lc.T, preferred_element_type=jnp.float32))

    ri = lax.broadcasted_iota(jnp.int32, (chunk, n_pad, n_pad), 1)
    ci = lax.broadcasted_iota(jnp.int32, (chunk, n_pad, n_pad), 2)
    out_ref[:] = jnp.where(ri >= ci, out_ref[:], 0.0)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def chol_blocked_v2(A, chunk=8, interpret=False):
    B, n, _ = A.shape
    dtype = A.dtype
    n_pad = max(-(-n // BLK) * BLK, BLK)
    b_pad = -(-B // chunk) * chunk

    eye = jnp.eye(n_pad, dtype=dtype)
    Ap = jnp.tile(eye[None], (b_pad, 1, 1))
    Ap = Ap.at[:B, :n, :n].set(A)

    out = pl.pallas_call(
        functools.partial(_chol_v2_kernel, n_pad, chunk),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, n_pad), dtype),
        grid=(b_pad // chunk,),
        in_specs=[pl.BlockSpec((chunk, n_pad, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, n_pad, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Ap)
    return out[:B, :n, :n]


def main_v2():
    print("ablation:", EXP_ABLATE, "batched_dot:", EXP_BATCHED_DOT)
    n = int(os.environ.get("EXP_N", "210"))
    B = int(os.environ.get("EXP_B", "240"))
    chunk = int(os.environ.get("EXP_CHUNK", "8"))
    rng = np.random.RandomState(0)
    X = rng.randn(B, n, n + 8).astype(np.float32)
    A = jnp.asarray(X @ np.transpose(X, (0, 2, 1)) + n * np.eye(n)[None],
                    jnp.float32)

    L = jax.block_until_ready(chol_blocked_v2(A[:8], chunk=chunk))
    Lref = jax.block_until_ready(jax.vmap(jnp.linalg.cholesky)(A[:8]))
    err = float(jnp.max(jnp.abs(L - Lref) / (1.0 + jnp.abs(Lref))))
    print(f"v2 max rel err vs XLA: {err:.2e}")

    t_xla = loop_time(lambda a: lax.linalg.cholesky(a), A)
    print(f"XLA    : {t_xla*1e3:7.2f} ms ({t_xla/B*1e6:5.1f} us/mat)")
    t_pal = loop_time(lambda a: chol_blocked_v2(a, chunk=chunk), A)
    print(f"PallasV2: {t_pal*1e3:7.2f} ms ({t_pal/B*1e6:5.1f} us/mat)  "
          f"chunk={chunk}")



# ---------------------------------------------------------------------------
# v3: all O(n^3) on the MXU; VPU only factors 16x16 diagonal tiles.
# Panels processed in TRANSPOSED layout obtained for free via symmetry.
# ---------------------------------------------------------------------------

MB = int(os.environ.get("EXP_MB", "16"))  # micro-block width


def _newton_tri_inv(L, n_iter):
    """Exact inverse of batched lower-triangular (C, m, m) via Newton
    iterations X <- X (2I - L X), X0 = diag(1/diag(L)); exact after
    ceil(log2(m)) iterations for triangular L."""
    C, m, _ = L.shape
    eye = jnp.eye(m, dtype=L.dtype)
    d = jnp.sum(jnp.where(eye[None] > 0, L, 0.0), axis=2)  # (C, m) diag
    X = eye[None] * (1.0 / d)[:, :, None]
    for _ in range(n_iter):
        LX = lax.dot_general(L, X, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
        X = lax.dot_general(X, 2.0 * eye[None] - LX,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    return X


def _factor_tile_t(D, chunk):
    """Factor a symmetric (C, MB, MB) tile; returns Lt = L^T (upper)."""
    lane_m = lax.broadcasted_iota(jnp.int32, (chunk, MB), 1)
    sub_m = lax.broadcasted_iota(jnp.int32, (chunk, MB), 1)
    rows = []
    for k in range(MB):
        rowk = D[:, k, :]                        # (C, MB)
        pivot = rowk[:, k]                       # (C,)
        inv_d = lax.rsqrt(pivot)[:, None]
        u = jnp.where(lane_m > k, rowk * inv_d, 0.0)
        newrow = jnp.where(lane_m == k, pivot[:, None] * inv_d, u)
        rows.append(newrow)
        w = jnp.where(sub_m > k, D[:, :, k] * inv_d[:, 0:1], 0.0)  # (C, MB)
        D = D - w[:, :, None] * u[:, None, :]
    return jnp.stack(rows, axis=1)               # (C, MB, MB) upper = L^T


def _chol_v3_kernel(n_pad, chunk, a_ref, out_ref, pt_ref):
    out_ref[:] = a_ref[:]
    n_blocks = n_pad // BLK
    n_newton = max(1, (MB - 1).bit_length())

    for kb in range(n_blocks):
        base = kb * BLK
        R = n_pad - base

        # transposed panel FOR FREE via symmetry of the trailing block:
        # Pt[c, q, r] = A'[base+r, base+q] = out[c, base+q, base+r]
        pt_ref[:, :, :R] = out_ref[:, base:base + BLK, base:]

        for mb_i in range(BLK // MB):
            j0 = mb_i * MB
            M = pt_ref[:, j0:j0 + MB, :R]         # (C, MB, R)
            D = M[:, :, j0:j0 + MB]               # (C, MB, MB)
            Lt16 = _factor_tile_t(D, chunk)
            L16 = jnp.swapaxes(Lt16, 1, 2)
            X = _newton_tri_inv(L16, n_newton)    # (C, MB, MB)
            Ltm = lax.dot_general(X, M, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
            # lower-triangularity: column j0+k is zero for rows < j0+k
            laneR = lax.broadcasted_iota(jnp.int32, (chunk, MB, R), 2)
            krow = lax.broadcasted_iota(jnp.int32, (chunk, MB, R), 1)
            Ltm = jnp.where(laneR >= j0 + krow, Ltm, 0.0)
            pt_ref[:, j0:j0 + MB, :R] = Ltm
            # rank-MB update of the remaining panel rows (still on MXU)
            if j0 + MB < BLK:
                lhs = Ltm[:, :, j0 + MB:BLK]      # (C, MB, BLK-j0-MB)
                upd = lax.dot_general(
                    lhs, Ltm, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                pt_ref[:, j0 + MB:, :R] = pt_ref[:, j0 + MB:, :R] - upd

        # write the factored panel back (transposed) for the final output
        out_ref[:, base:, base:base + BLK] = jnp.swapaxes(
            pt_ref[:, :, :R], 1, 2)

        # Schur update of the trailing block, fully on the MXU, no transposes
        if base + BLK < n_pad:
            Pt21 = pt_ref[:, :, BLK:R]            # (C, BLK, R2)
            upd = lax.dot_general(
                Pt21, Pt21, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            out_ref[:, base + BLK:, base + BLK:] = (
                out_ref[:, base + BLK:, base + BLK:] - upd)

    ri = lax.broadcasted_iota(jnp.int32, (chunk, n_pad, n_pad), 1)
    ci = lax.broadcasted_iota(jnp.int32, (chunk, n_pad, n_pad), 2)
    out_ref[:] = jnp.where(ri >= ci, out_ref[:], 0.0)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def chol_blocked_v3(A, chunk=8, interpret=False):
    B, n, _ = A.shape
    dtype = A.dtype
    n_pad = max(-(-n // BLK) * BLK, BLK)
    b_pad = -(-B // chunk) * chunk

    eye = jnp.eye(n_pad, dtype=dtype)
    Ap = jnp.tile(eye[None], (b_pad, 1, 1))
    Ap = Ap.at[:B, :n, :n].set(A)

    out = pl.pallas_call(
        functools.partial(_chol_v3_kernel, n_pad, chunk),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, n_pad), dtype),
        grid=(b_pad // chunk,),
        in_specs=[pl.BlockSpec((chunk, n_pad, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, n_pad, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((chunk, BLK, n_pad), dtype)],
        interpret=interpret,
    )(Ap)
    return out[:B, :n, :n]


def main_v3():
    n = int(os.environ.get("EXP_N", "210"))
    B = int(os.environ.get("EXP_B", "240"))
    chunk = int(os.environ.get("EXP_CHUNK", "8"))
    rng = np.random.RandomState(0)
    X = rng.randn(B, n, n + 8).astype(np.float32)
    A = jnp.asarray(X @ np.transpose(X, (0, 2, 1)) + n * np.eye(n)[None],
                    jnp.float32)

    L = jax.block_until_ready(chol_blocked_v3(A[:8], chunk=chunk))
    Lref = jax.block_until_ready(jax.vmap(jnp.linalg.cholesky)(A[:8]))
    err = float(jnp.max(jnp.abs(L - Lref) / (1.0 + jnp.abs(Lref))))
    print(f"v3 max rel err vs XLA: {err:.2e}")

    t_xla = loop_time(lambda a: lax.linalg.cholesky(a), A)
    print(f"XLA    : {t_xla*1e3:7.2f} ms ({t_xla/B*1e6:5.1f} us/mat)")
    t_pal = loop_time(lambda a: chol_blocked_v3(a, chunk=chunk), A)
    print(f"PallasV3: {t_pal*1e3:7.2f} ms ({t_pal/B*1e6:5.1f} us/mat)  "
          f"chunk={chunk}")


if __name__ == "__main__":
    if os.environ.get("EXP_MODE") == "v2":
        main_v2()
    elif os.environ.get("EXP_MODE") == "v3":
        main_v3()
    else:
        main()
