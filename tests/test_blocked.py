"""Blocked (recursive) Cholesky / TRSM tests vs LAPACK oracles.

Covers the large-n scaling axis (SURVEY §5(a); reference handles it via
f64 LAPACK ``dpotrf``, ``linalg/cholesky.py:234-327``): algorithmic parity
of the divide-and-conquer kernels with deep recursion on small matrices,
batched operation (the jitter-ladder shape), NaN failure propagation,
autodiff, and end-to-end GP parity with the blocked path force-enabled.
"""

import os

import numpy as np
import pytest
import scipy.linalg
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from mogp_tpu.ops.blocked import (
    recursive_cholesky,
    trsm_left_lower,
    trsm_left_lt,
    trsm_right_lt,
)

rng = np.random.RandomState(42)


def make_spd(n, scale=None, seed=None):
    r = np.random.RandomState(seed) if seed is not None else rng
    M = r.randn(n, n)
    return M @ M.T + (scale or n) * np.eye(n)


@pytest.mark.parametrize("n,leaf", [(3, 8), (8, 8), (21, 8), (64, 16),
                                    (130, 32), (300, 64), (517, 128)])
def test_recursive_cholesky_matches_lapack(n, leaf):
    A = make_spd(n)
    L = np.asarray(recursive_cholesky(jnp.asarray(A), leaf=leaf))
    Lref = scipy.linalg.cholesky(A, lower=True)
    assert_allclose(L, Lref, atol=1e-9 * n, rtol=1e-10)
    assert_allclose(np.triu(L, 1), 0.0)


@pytest.mark.parametrize("n,leaf", [(21, 8), (130, 32), (300, 64)])
def test_trsm_variants_match_oracle(n, leaf):
    A = make_spd(n)
    L = scipy.linalg.cholesky(A, lower=True)
    Lj = jnp.asarray(L)

    B = rng.randn(5, n)
    X = np.asarray(trsm_right_lt(Lj, jnp.asarray(B), leaf=leaf))
    assert_allclose(X @ L.T, B, atol=1e-9 * n)

    B2 = rng.randn(n, 4)
    X2 = np.asarray(trsm_left_lower(Lj, jnp.asarray(B2), leaf=leaf))
    assert_allclose(L @ X2, B2, atol=1e-9 * n)

    X3 = np.asarray(trsm_left_lt(Lj, jnp.asarray(B2), leaf=leaf))
    assert_allclose(L.T @ X3, B2, atol=1e-9 * n)


def test_recursive_cholesky_batched():
    """The jitter ladder factorizes a (candidates, n, n) batch in one call."""
    A = np.stack([make_spd(96, scale=96) for _ in range(4)])
    L = np.asarray(recursive_cholesky(jnp.asarray(A), leaf=32))
    for i in range(4):
        assert_allclose(L[i], scipy.linalg.cholesky(A[i], lower=True),
                        atol=1e-8)


def test_recursive_cholesky_nan_on_non_pd():
    """Non-PD input must NaN-fill like lax.linalg.cholesky so the adaptive
    jitter ladder's failure detection keeps working."""
    A = make_spd(96, scale=96) - 1e5 * np.eye(96)
    L = np.asarray(recursive_cholesky(jnp.asarray(A), leaf=32))
    assert np.isnan(L).any()


def test_recursive_cholesky_grad():
    """d/dA [logdet(A)/2] through the recursion equals A^-1 / 2 (sym)."""
    A = jnp.asarray(make_spd(80, scale=80))

    def half_logdet(A):
        L = recursive_cholesky(A, leaf=32)
        return jnp.sum(jnp.log(jnp.diagonal(L)))

    g = np.asarray(jax.grad(half_logdet)(A))
    expect = 0.5 * np.linalg.inv(np.asarray(A))
    assert_allclose((g + g.T) / 2, (expect + expect.T) / 2, atol=1e-8)


def test_gp_parity_with_blocked_path(monkeypatch):
    """Force the blocked dispatch through cholesky_factor/ChoFactor and
    check gp_nlp / gradient / predict parity with the LAPACK path.

    Uses a shape unique to this test (n=157) so jit caches traced with the
    default threshold are not reused.
    """
    from mogp_tpu.models.gp import GaussianProcess

    n, d = 157, 3
    r = np.random.RandomState(7)
    x = r.uniform(size=(n, d))
    y = np.sin(3 * x[:, 0]) + x[:, 1] ** 2 + 0.1 * r.randn(n)
    theta = np.array([0.5, -0.5, 0.2, 1.0])

    def eval_all():
        gp = GaussianProcess(x, y, nugget="adaptive")
        lp = gp.logposterior(theta)
        dlp = gp.logpost_deriv(theta)
        mu, var, _ = gp.predict(x[: 20] + 0.01)
        return np.asarray(lp), np.asarray(dlp), np.asarray(mu), np.asarray(var)

    monkeypatch.setenv("MOGP_TPU_BLOCKED_CHOL_MIN_N", "1")
    lp_b, dlp_b, mu_b, var_b = eval_all()
    monkeypatch.setenv("MOGP_TPU_BLOCKED_CHOL_MIN_N", "0")
    lp_x, dlp_x, mu_x, var_x = eval_all()

    assert_allclose(lp_b, lp_x, rtol=1e-9)
    assert_allclose(dlp_b, dlp_x, rtol=1e-7, atol=1e-9)
    assert_allclose(mu_b, mu_x, rtol=1e-8, atol=1e-10)
    assert_allclose(var_b, var_x, rtol=1e-6, atol=1e-12)


def test_large_n_adaptive_objective_parity(monkeypatch):
    """n=1031 (unique shape, forces fresh traces): the blocked adaptive-
    nugget objective and its gradient match the LAPACK path in f64."""
    from mogp_tpu.models.gp import GaussianProcess

    n, d = 1031, 4
    r = np.random.RandomState(11)
    x = r.uniform(size=(n, d))
    y = np.sin(4 * x[:, 0]) * np.cos(2 * x[:, 1]) + x[:, 2]
    theta = np.array([0.3, 0.1, -0.2, 0.4, 0.5])

    def eval_obj():
        gp = GaussianProcess(x, y, nugget="adaptive")
        return np.asarray(gp.logposterior(theta)), np.asarray(
            gp.logpost_deriv(theta)
        )

    monkeypatch.setenv("MOGP_TPU_BLOCKED_CHOL_MIN_N", "768")
    lp_b, dlp_b = eval_obj()
    monkeypatch.setenv("MOGP_TPU_BLOCKED_CHOL_MIN_N", "0")
    lp_x, dlp_x = eval_obj()

    assert_allclose(lp_b, lp_x, rtol=1e-8)
    assert_allclose(dlp_b, dlp_x, rtol=1e-6, atol=1e-8)


def test_batch_blocked_small_n_parity(monkeypatch):
    """The batched small-n blocked dispatch (production TPU fit path,
    config.batch_blocked_leaf) matches the stock path for a full
    batched fit + predict in f64.

    Uses a shape unique to this test (n=151) so cached traces from the
    default-dispatch suite are not reused.
    """
    from mogp_tpu import MultiOutputGP, fit_GP_MAP

    n, d = 151, 3
    r = np.random.RandomState(19)
    x = r.uniform(size=(n, d))
    ys = np.stack([
        np.sin(3 * x[:, 0]) + 0.05 * r.randn(n),
        x[:, 1] ** 2 - x[:, 2] + 0.05 * r.randn(n),
    ])

    def fit_all():
        np.random.seed(5)
        mgp = fit_GP_MAP(MultiOutputGP(x, ys, nugget="adaptive"),
                         n_tries=2, maxiter=25)
        res = mgp.predict(x[:16] + 0.003)
        return (
            [np.asarray(em.theta.get_data()) for em in mgp.emulators],
            np.asarray(res.mean),
            np.asarray(res.unc),
        )

    monkeypatch.setenv("MOGP_TPU_BATCH_BLOCKED_LEAF", "32")
    t_b, mu_b, var_b = fit_all()
    monkeypatch.setenv("MOGP_TPU_BATCH_BLOCKED_LEAF", "0")
    t_x, mu_x, var_x = fit_all()

    for a, b in zip(t_b, t_x):
        assert_allclose(a, b, rtol=1e-5, atol=1e-7)
    assert_allclose(mu_b, mu_x, rtol=1e-6, atol=1e-8)
    assert_allclose(var_b, var_x, rtol=1e-4, atol=1e-10)
