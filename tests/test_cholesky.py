"""Factorization tests against scipy oracles.

Mirrors the reference's ``tests/test_linalg.py`` strategy: small SPD
fixtures, exact comparisons to LAPACK results.
"""

import numpy as np
import pytest
import scipy.linalg
from numpy.testing import assert_allclose
from scipy.linalg import lapack

import jax.numpy as jnp

from mogp_tpu.ops.cholesky import (
    ChoFactor,
    cholesky_factor,
    fixed_cholesky,
    jit_cholesky,
    pivoted_cholesky,
)


def make_spd(n, seed=0, jitter=0.0):
    rng = np.random.RandomState(seed)
    A = rng.randn(n, n)
    A = A @ A.T + n * np.eye(n) * 0.1 + jitter * np.eye(n)
    return A


def test_fixed_cholesky():
    A = make_spd(6)
    L = np.asarray(fixed_cholesky(jnp.asarray(A)))
    assert_allclose(L, scipy.linalg.cholesky(A, lower=True), rtol=1e-10)


def test_chofactor_solve_and_logdet():
    A = make_spd(6, seed=1)
    b = np.random.RandomState(2).randn(6)
    f = ChoFactor(fixed_cholesky(jnp.asarray(A)))
    assert_allclose(np.asarray(f.solve(jnp.asarray(b))), np.linalg.solve(A, b), rtol=1e-9)
    assert_allclose(float(f.logdet()), np.linalg.slogdet(A)[1], rtol=1e-10)
    L = scipy.linalg.cholesky(A, lower=True)
    assert_allclose(
        np.asarray(f.solve_L(jnp.asarray(b))),
        scipy.linalg.solve_triangular(L, b, lower=True),
        rtol=1e-9,
    )


def test_jit_cholesky_no_jitter_needed():
    A = make_spd(5, seed=3)
    f, jitter = jit_cholesky(jnp.asarray(A))
    assert float(jitter) == 0.0
    assert_allclose(np.asarray(f.L), scipy.linalg.cholesky(A, lower=True), rtol=1e-10)


def test_jit_cholesky_adds_jitter():
    """Reference semantics (cholesky.py:234-281): jitter starts at
    1e-6 * mean(diag) and escalates by 10x."""
    # a singular matrix: duplicated row/column
    A = make_spd(5, seed=4)
    A[4] = A[3]
    A[:, 4] = A[:, 3]
    f, jitter = jit_cholesky(jnp.asarray(A))
    assert float(jitter) > 0.0
    assert np.all(np.isfinite(np.asarray(f.L)))
    # factor reproduces A + jitter*I
    rec = np.asarray(f.L) @ np.asarray(f.L).T
    assert_allclose(rec, A + float(jitter) * np.eye(5), rtol=1e-6, atol=1e-8)


def test_jit_cholesky_hopeless_matrix_gives_nan():
    A = -np.eye(4)
    f, jitter = jit_cholesky(jnp.asarray(A))
    assert not np.all(np.isfinite(np.asarray(f.L)))


def test_pivoted_cholesky_full_rank_matches_lapack():
    A = make_spd(7, seed=5)
    f = pivoted_cholesky(jnp.asarray(A))
    L_ref, P_ref, rank_ref, info = lapack.dpstrf(A, lower=1)
    L_ref = np.tril(L_ref)
    assert int(f.rank) == rank_ref == 7
    assert_allclose(np.asarray(f.P), P_ref - 1)
    assert_allclose(np.asarray(f.L), L_ref, rtol=1e-8, atol=1e-10)


def test_pivoted_cholesky_solve():
    A = make_spd(7, seed=6)
    b = np.random.RandomState(7).randn(7)
    f = pivoted_cholesky(jnp.asarray(A))
    assert_allclose(np.asarray(f.solve(jnp.asarray(b))), np.linalg.solve(A, b), rtol=1e-8)


def test_pivoted_cholesky_rank_deficient():
    """Collinear rows are skipped; synthetic decreasing diagonal matches the
    reference construction (cholesky.py:321-325)."""
    A = make_spd(6, seed=8)
    A[5] = A[4]
    A[:, 5] = A[:, 4]
    f = pivoted_cholesky(jnp.asarray(A))
    rank = int(f.rank)
    assert rank == 5
    L = np.asarray(f.L)
    d = np.diag(L)
    # decreasing diagonal within the meaningful block, synthetic tail
    assert np.all(np.diff(d[:rank]) <= 1e-10)
    divs = np.cumprod(np.arange(rank + 1, 7, dtype=np.float64))
    assert_allclose(d[rank:], L[rank - 1, rank - 1] / divs, rtol=1e-6)
    # reconstruction on the meaningful block
    P = np.asarray(f.P)
    rec = L @ L.T
    assert_allclose(rec[:rank][:, :rank], A[P][:, P][:rank][:, :rank], rtol=1e-7, atol=1e-9)
    # solve of a consistent system ignores the collinear direction
    x = np.asarray(f.solve(jnp.asarray(A @ np.ones(6))))
    assert np.all(np.isfinite(x))


def test_cholesky_factor_dispatch():
    A = make_spd(5, seed=9)
    for nugget_type, nugget in [
        ("adaptive", 0.0),
        ("fit", 1e-4),
        ("fixed", 1e-4),
        ("pivot", 0.0),
    ]:
        f, nug = cholesky_factor(jnp.asarray(A), jnp.asarray(nugget), nugget_type)
        b = np.ones(5)
        target = A + (nugget if nugget_type in ("fit", "fixed") else 0.0) * np.eye(5)
        assert_allclose(
            np.asarray(f.solve(jnp.asarray(b))),
            np.linalg.solve(target, b),
            rtol=1e-7,
        )
    with pytest.raises(ValueError):
        cholesky_factor(jnp.asarray(A), 0.0, "bogus")


def test_empty_factor():
    f = ChoFactor(jnp.zeros((0, 0)))
    assert np.asarray(f.solve(jnp.zeros((0,)))).shape == (0,)
    assert float(f.logdet()) == 0.0


def test_progressive_ladder_matches_batched():
    """The large-n progressive (stop-at-first-success) ladder must EQUAL
    the batched all-candidates ladder: same selected jitter, same
    factor, same NaN semantics on hopeless inputs, same gradients
    (custom-VJP factor reuse applies to both paths)."""
    import jax

    import mogp_tpu.ops.cholesky as C

    rng = np.random.RandomState(0)
    n = 30
    X = rng.randn(n, 8)
    cases = {
        "pd": X @ X.T + n * np.eye(n),
        "needs_jitter": X[:, :2] @ X[:, :2].T,  # rank 2
        "hopeless": -np.eye(n),
    }
    saved = C._PROGRESSIVE_LADDER_MIN_N
    try:
        for name, A in cases.items():
            Aj = jnp.asarray(A)
            C._PROGRESSIVE_LADDER_MIN_N = 1
            f_prog, j_prog = C.jit_cholesky(Aj)
            C._PROGRESSIVE_LADDER_MIN_N = 10**9
            f_bat, j_bat = C.jit_cholesky(Aj)
            np.testing.assert_allclose(
                np.asarray(j_prog), np.asarray(j_bat), err_msg=name
            )
            np.testing.assert_allclose(
                np.asarray(f_prog.L), np.asarray(f_bat.L), equal_nan=True,
                err_msg=name,
            )

        def loss(Am, minn):
            C._PROGRESSIVE_LADDER_MIN_N = minn
            f, _ = C.jit_cholesky(Am)
            return f.logdet()

        A = jnp.asarray(cases["pd"])
        g1 = jax.grad(lambda M: loss(M, 1))(A)
        g2 = jax.grad(lambda M: loss(M, 10**9))(A)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2))
    finally:
        C._PROGRESSIVE_LADDER_MIN_N = saved
