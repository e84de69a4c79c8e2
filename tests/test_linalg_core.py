"""Marginalized-mean linalg-core oracles.

Mirrors reference ``tests/test_linalg.py`` coverage of
``linalg_utils.py`` (``calc_Ainv`` / ``calc_mean_params`` / ``calc_R``
at ``linalg_utils.py:5,96,132``) against this framework's fused
stacked-half-solve design (``ops/linalg.py``): every artifact of
``marginal_core`` and the full ``marginal_nlp`` value are checked
against explicit-inverse numpy linear algebra, for both weak and
informative mean priors, plus extra factor-object cases (matrix RHS,
``solve_from_half``, pivoted solve_L/logdet, exact jitter ladder
values).
"""

import numpy as np
import scipy.linalg
from numpy.testing import assert_allclose

import jax.numpy as jnp

from mogp_tpu.ops.cholesky import (
    ChoFactor,
    fixed_cholesky,
    jit_cholesky,
    pivoted_cholesky,
)
from mogp_tpu.ops.linalg import marginal_core, marginal_nlp


def make_spd(n, seed=0, scale=0.1):
    rng = np.random.RandomState(seed)
    A = rng.randn(n, n)
    return A @ A.T + n * scale * np.eye(n)


def make_problem(n=9, M=3, seed=10, weak=True):
    rng = np.random.RandomState(seed)
    K = make_spd(n, seed=seed)
    H = rng.randn(n, M)
    resid = rng.randn(n)
    if weak:
        Binv = np.zeros((M, M))
        logdetB = 0.0
    else:
        B = make_spd(M, seed=seed + 1, scale=0.5)
        Binv = np.linalg.inv(B)
        logdetB = np.linalg.slogdet(B)[1]
    return K, H, resid, Binv, logdetB


def core_for(K, H, resid, Binv):
    Kinv = ChoFactor(fixed_cholesky(jnp.asarray(K)))
    return Kinv, marginal_core(Kinv, jnp.asarray(H), jnp.asarray(resid),
                               jnp.asarray(Binv))


def test_marginal_core_artifacts_weak_prior():
    K, H, resid, Binv, _ = make_problem(weak=True)
    Kinv, core = core_for(K, H, resid, Binv)
    Ki = np.linalg.inv(K)
    # A = H^T K^-1 H + B^-1   (linalg_utils.py:5-40)
    A = H.T @ Ki @ H + Binv
    assert_allclose(np.asarray(core.Ainv.L) @ np.asarray(core.Ainv.L).T, A,
                    rtol=1e-8)
    # H^T K^-1 r
    assert_allclose(np.asarray(core.H_Kinv_t), H.T @ Ki @ resid, rtol=1e-8)
    # half-solves: alpha^T alpha = r^T K^-1 r; Wh^T Wh = H^T K^-1 H
    assert_allclose(float(np.asarray(core.alpha) @ np.asarray(core.alpha)),
                    resid @ Ki @ resid, rtol=1e-8)
    assert_allclose(np.asarray(core.Wh).T @ np.asarray(core.Wh), H.T @ Ki @ H,
                    rtol=1e-8)


def test_marginal_core_artifacts_informative_prior():
    K, H, resid, Binv, _ = make_problem(weak=False)
    _, core = core_for(K, H, resid, Binv)
    Ki = np.linalg.inv(K)
    A = H.T @ Ki @ H + Binv
    assert_allclose(np.asarray(core.Ainv.L) @ np.asarray(core.Ainv.L).T, A,
                    rtol=1e-8)


def test_mean_params_from_core():
    """beta_hat = A^-1 (H^T K^-1 r + B^-1 b)  (linalg_utils.py:96-130)."""
    K, H, resid, Binv, _ = make_problem(weak=False, seed=11)
    rng = np.random.RandomState(12)
    b = rng.randn(3)
    _, core = core_for(K, H, resid, Binv)
    beta = np.asarray(core.Ainv.solve(core.H_Kinv_t + jnp.asarray(Binv @ b)))
    Ki = np.linalg.inv(K)
    A = H.T @ Ki @ H + Binv
    beta_oracle = np.linalg.solve(A, H.T @ Ki @ resid + Binv @ b)
    assert_allclose(beta, beta_oracle, rtol=1e-8)


def test_marginal_nlp_oracle_weak_and_informative():
    for weak, seed in [(True, 13), (False, 14)]:
        K, H, resid, Binv, logdetB = make_problem(weak=weak, seed=seed)
        M = H.shape[1]
        Kinv, core = core_for(K, H, resid, Binv)
        got = float(marginal_nlp(core, Kinv, jnp.asarray(logdetB), M))
        Ki = np.linalg.inv(K)
        A = H.T @ Ki @ H + Binv
        v = H.T @ Ki @ resid
        want = 0.5 * (
            resid @ Ki @ resid
            - v @ np.linalg.solve(A, v)
            + np.linalg.slogdet(K)[1]
            + np.linalg.slogdet(A)[1]
            + logdetB
            + M * np.log(2.0 * np.pi)
        )
        assert_allclose(got, want, rtol=1e-9, err_msg=f"weak={weak}")


def test_marginal_nlp_equals_profiled_gaussian_likelihood():
    """With a weak mean prior, marginal_nlp equals the closed-form
    log-evidence of the conjugate linear-mean model computed a second
    way: via the marginal covariance-inflation identity
    N(r | 0, K) * correction == N with H-marginalized covariance
    (Woodbury/determinant lemma)."""
    K, H, resid, _, _ = make_problem(weak=False, seed=15)
    B = make_spd(3, seed=16, scale=0.5)
    Binv = np.linalg.inv(B)
    logdetB = np.linalg.slogdet(B)[1]
    Kinv, core = core_for(K, H, resid, Binv)
    M = 3
    got = float(marginal_nlp(core, Kinv, jnp.asarray(logdetB), M))
    # marginalizing beta ~ N(0, B): r ~ N(0, K + H B H^T); the Woodbury
    # and determinant lemmas make this equal marginal_nlp's quadratic
    # and logdet terms exactly; marginal_nlp's constant is M log 2pi
    # (the data-space n/2 log 2pi is added by the caller)
    S = K + H @ B @ H.T
    want = 0.5 * (
        resid @ np.linalg.solve(S, resid)
        + np.linalg.slogdet(S)[1]
        + M * np.log(2.0 * np.pi)
    )
    assert_allclose(got, want, rtol=1e-10)


def test_chofactor_matrix_rhs_and_half():
    A = make_spd(8, seed=17)
    Bmat = np.random.RandomState(18).randn(8, 4)
    f = ChoFactor(fixed_cholesky(jnp.asarray(A)))
    assert_allclose(np.asarray(f.solve(jnp.asarray(Bmat))),
                    np.linalg.solve(A, Bmat), rtol=1e-8)
    L = scipy.linalg.cholesky(A, lower=True)
    W = scipy.linalg.solve_triangular(L, Bmat, lower=True)
    assert_allclose(np.asarray(f.solve_L(jnp.asarray(Bmat))), W, rtol=1e-8)
    # solve_from_half completes the upper sweep: A^-1 B from W
    assert_allclose(np.asarray(f.solve_from_half(jnp.asarray(W))),
                    np.linalg.solve(A, Bmat), rtol=1e-8)


def test_pivoted_factor_solve_L_and_logdet():
    A = make_spd(7, seed=19)
    f = pivoted_cholesky(jnp.asarray(A))
    # logdet of the full-rank factor matches slogdet
    assert_allclose(float(f.logdet()), np.linalg.slogdet(A)[1], rtol=1e-8)
    b = np.random.RandomState(20).randn(7)
    w = np.asarray(f.solve_L(jnp.asarray(b)))
    # half-solve then self-inner-product gives the quadratic form
    assert_allclose(w @ w, b @ np.linalg.solve(A, b), rtol=1e-8)


def test_jit_cholesky_exact_ladder_values():
    """The accepted jitter is exactly 1e-6 * mean(diag) * 10^k
    (reference cholesky.py:269-278)."""
    rng = np.random.RandomState(21)
    base = rng.randn(6, 6)
    # nearly-singular: tiny eigenvalue floor
    Q, _ = np.linalg.qr(base)
    # one slightly-negative eigenvalue forces the ladder past its first
    # rungs (first rung is ~1e-6 * mean(diag) ~ 5e-7 here)
    evals = np.array([1.0, 0.9, 0.5, 0.3, 0.1, -1e-5])
    A = Q @ np.diag(evals) @ Q.T
    A = (A + A.T) / 2
    f, jitter = jit_cholesky(jnp.asarray(A))
    jitter = float(jitter)
    assert jitter > 0.0
    mean_diag = float(np.mean(np.diag(A)))
    k = np.log10(jitter / (1e-6 * mean_diag))
    assert_allclose(k, round(k), atol=1e-8)  # an exact rung of the ladder
    assert 0 <= round(k) < 5
    # and it is the SMALLEST rung that factorizes in f64
    if round(k) > 0:
        smaller = 1e-6 * mean_diag * 10.0 ** (round(k) - 1)
        try:
            scipy.linalg.cholesky(A + smaller * np.eye(6))
            ok_smaller = True
        except np.linalg.LinAlgError:
            ok_smaller = False
        except scipy.linalg.LinAlgError:
            ok_smaller = False
        assert not ok_smaller


def test_jit_cholesky_sparse_ladder_consistent():
    """sparse_ladder mode must still return a jitter that factorizes and
    reproduces A + jitter*I."""
    A = make_spd(5, seed=22)
    A[4] = A[3]
    A[:, 4] = A[:, 3]
    f, jitter = jit_cholesky(jnp.asarray(A), sparse_ladder=True)
    L = np.asarray(f.L)
    assert np.all(np.isfinite(L))
    assert_allclose(L @ L.T, A + float(jitter) * np.eye(5), rtol=1e-6,
                    atol=1e-8)
