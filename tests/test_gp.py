"""GP core parity tests.

The log-posterior oracle below re-derives the marginalized-mean math of
the reference ``GaussianProcess.fit`` (``GaussianProcess.py:655-685``) in
plain numpy/scipy, so the jitted core is checked against an independent
implementation.  The docstring example from ``GaussianProcess.py:64-85``
is used as a recorded-output parity check.
"""

import numpy as np
import pytest
import scipy.linalg
from numpy.testing import assert_allclose

from mogp_tpu.models.gp import GaussianProcess
from mogp_tpu.models.priors import GPPriors, MeanPriors

rng = np.random.RandomState(100)
X = rng.uniform(0, 2, size=(15, 2))
Y = np.sin(X[:, 0]) + 2.0 * X[:, 1] + 0.1 * rng.randn(15)


def oracle_nlp(x, y, theta, kernel_f, dm, nugget=0.0, include_prior=0.0):
    """Independent numpy implementation of the negative log posterior
    with weak mean priors (GaussianProcess.py:655-685)."""
    n = len(y)
    M = dm.shape[1]
    n_corr = x.shape[1]
    sigma2 = np.exp(theta[n_corr])
    K = sigma2 * kernel_f(x, x, theta[:n_corr]) + nugget * np.eye(n)
    L = scipy.linalg.cholesky(K, lower=True)
    Kinv_t = scipy.linalg.cho_solve((L, True), y)
    Kinv_H = scipy.linalg.cho_solve((L, True), dm)
    A = dm.T @ Kinv_H
    if M > 0:
        LA = scipy.linalg.cholesky(A, lower=True)
        H_Kinv_t = dm.T @ Kinv_t
        A_sol = scipy.linalg.cho_solve((LA, True), H_Kinv_t)
        quad_corr = H_Kinv_t @ A_sol
        logdet_A = 2 * np.sum(np.log(np.diag(LA)))
    else:
        quad_corr = 0.0
        logdet_A = 0.0
    logdet_K = 2 * np.sum(np.log(np.diag(L)))
    n_coeff = n - M
    return 0.5 * (
        y @ Kinv_t
        - quad_corr
        + logdet_K
        + logdet_A
        + n_coeff * np.log(2 * np.pi)
    ) - include_prior


def np_sqexp(x1, x2, params):
    r2 = np.sum(
        np.exp(params) * (x1[:, None, :] - x2[None, :, :]) ** 2, axis=-1
    )
    return np.exp(-0.5 * r2)


@pytest.mark.parametrize("mean,M", [(None, 0), ("1", 1), ("x[0] + x[1]", 3)])
def test_logposterior_matches_oracle(mean, M):
    theta = np.array([0.3, -0.2, 0.5])
    gp = GaussianProcess(
        X, Y, mean=mean, nugget=1.0e-6,
        priors=GPPriors(n_corr=2, nugget_type="fixed"),
    )
    assert gp.n_mean == M
    dm = gp.get_design_matrix(X)
    expected = oracle_nlp(X, Y, theta, np_sqexp, dm, nugget=1.0e-6)
    assert_allclose(gp.logposterior(theta), expected, rtol=1e-8)


def test_logpost_deriv_matches_fd():
    gp = GaussianProcess(X, Y, mean="x[0]", nugget="fit")
    theta = np.array([0.2, -0.1, 0.4, -8.0])
    deriv = gp.logpost_deriv(theta)
    eps = 1e-6
    fd = np.zeros(gp.n_params)
    for i in range(gp.n_params):
        tp, tm = theta.copy(), theta.copy()
        tp[i] += eps
        tm[i] -= eps
        fd[i] = (gp.logposterior(tp) - gp.logposterior(tm)) / (2 * eps)
    assert_allclose(deriv, fd, rtol=1e-5, atol=1e-6)


def test_logpost_hessian_matches_fd():
    gp = GaussianProcess(X, Y, nugget="adaptive")
    theta = np.array([0.2, -0.1, 0.4])
    hess = gp.logpost_hessian(theta)
    eps = 1e-5
    for i in range(gp.n_params):
        tp, tm = theta.copy(), theta.copy()
        tp[i] += eps
        tm[i] -= eps
        fd = (gp.logpost_deriv(tp) - gp.logpost_deriv(tm)) / (2 * eps)
        assert_allclose(hess[i], fd, rtol=1e-4, atol=1e-5)


def test_reference_docstring_example():
    """Structural parity with the example of GaussianProcess.py:64-85.

    NOTE: the recorded outputs in that docstring (n_params == 5 and the
    prediction values) are stale -- they predate the reference's current
    default ``nugget="adaptive"`` and marginalized-mean math, under which
    n_params is n_corr + 1 = 4 (GPParams.py:293-300).  We assert against
    an inline numpy oracle of the *current* reference math instead.
    """
    x = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    y = np.array([4.0, 6.0])
    gp = GaussianProcess(x, y)
    assert gp.n == 2
    assert gp.D == 3
    assert gp.n_params == 4
    gp.fit(np.zeros(gp.n_params))
    xt = np.array([[2.0, 3.0, 4.0], [7.0, 8.0, 9.0]])
    mu, var, _ = gp.predict(xt)
    K = np_sqexp(x, x, np.zeros(3))
    Ks = np_sqexp(x, xt, np.zeros(3))
    mu_ref = Ks.T @ np.linalg.solve(K, y)
    var_ref = 1.0 - np.sum(Ks * np.linalg.solve(K, Ks), axis=0)
    assert_allclose(mu, mu_ref, rtol=1e-8)
    assert_allclose(var, var_ref, rtol=1e-6)


def test_predict_variance_oracle():
    """Variance vs direct numpy computation for a zero-mean GP."""
    theta = np.array([0.3, -0.2, 0.5])
    nugget = 1e-6
    gp = GaussianProcess(
        X, Y, nugget=nugget, priors=GPPriors(n_corr=2, nugget_type="fixed")
    )
    gp.fit(theta)
    xt = rng.uniform(0, 2, size=(6, 2))
    mu, var, _ = gp.predict(xt)

    sigma2 = np.exp(theta[2])
    K = sigma2 * np_sqexp(X, X, theta[:2]) + nugget * np.eye(len(X))
    Ks = sigma2 * np_sqexp(X, xt, theta[:2])
    Kinv_y = np.linalg.solve(K, Y)
    mu_ref = Ks.T @ Kinv_y
    var_ref = sigma2 + nugget - np.sum(Ks * np.linalg.solve(K, Ks), axis=0)
    assert_allclose(mu, mu_ref, rtol=1e-8)
    assert_allclose(var, var_ref, rtol=1e-6)


def test_predict_full_cov():
    gp = GaussianProcess(X, Y, nugget=1e-6,
                         priors=GPPriors(n_corr=2, nugget_type="fixed"))
    gp.fit(np.array([0.3, -0.2, 0.5]))
    xt = rng.uniform(0, 2, size=(6, 2))
    mu, var, _ = gp.predict(xt)
    mu2, cov, _ = gp.predict(xt, full_cov=True)
    assert cov.shape == (6, 6)
    assert_allclose(np.diag(cov), var, rtol=1e-6, atol=1e-10)
    assert_allclose(mu, mu2, rtol=1e-12)
    # covariance must be symmetric PSD-ish
    assert_allclose(cov, cov.T, atol=1e-10)


def test_predict_unfit_raises():
    gp = GaussianProcess(X, Y)
    with pytest.raises(ValueError):
        gp.predict(X)


def test_adaptive_nugget_on_singular():
    """Duplicated inputs: adaptive mode must auto-jitter and succeed."""
    Xd = np.vstack([X, X[-1]])
    Yd = np.concatenate([Y, Y[-1:]])
    gp = GaussianProcess(Xd, Yd, nugget="adaptive")
    gp.fit(np.zeros(gp.n_params))
    assert np.isfinite(gp.current_logpost)
    assert gp.theta.nugget is not None and gp.theta.nugget > 0.0


def test_pivot_nugget_on_singular():
    Xd = np.vstack([X, X[-1]])
    Yd = np.concatenate([Y, Y[-1:]])
    gp = GaussianProcess(Xd, Yd, nugget="pivot")
    gp.fit(np.zeros(gp.n_params))
    assert np.isfinite(gp.current_logpost)
    mu, var, _ = gp.predict(X[:4])
    assert np.all(np.isfinite(mu))
    assert np.all(np.isfinite(var))


def test_fit_nugget_mode():
    gp = GaussianProcess(X, Y, nugget="fit")
    assert gp.n_params == 4
    theta = np.array([0.2, -0.1, 0.4, np.log(1e-4)])
    gp.fit(theta)
    assert_allclose(gp.theta.nugget, 1e-4, rtol=1e-10)


def test_theta_roundtrip_and_shapes():
    gp = GaussianProcess(X, Y, mean="x[0]")
    assert gp.n_mean == 2
    gp.fit(np.zeros(gp.n_params))
    assert gp.theta.mean.shape == (2,)
    assert gp.theta.corr.shape == (2,)
    # setting theta = None resets
    gp.theta = None
    assert gp.theta.get_data() is None
    with pytest.raises(ValueError):
        gp.predict(X)


def test_call_returns_mean():
    gp = GaussianProcess(X, Y)
    gp.fit(np.zeros(gp.n_params))
    out = gp(X[:3])
    mu, _, _ = gp.predict(X[:3])
    assert_allclose(out, mu)


def test_str():
    gp = GaussianProcess(X, Y)
    assert "15 training examples" in str(gp)
    assert "2 input variables" in str(gp)


def test_standardize_option():
    """standardize=True is equivalent to manually standardizing the
    targets and mapping predictions back."""
    ys = Y * 1e6 + 3e7  # badly scaled targets
    theta = np.array([0.3, -0.2, 0.5])
    scale = float(np.std(ys))
    offset = float(np.mean(ys))

    gp_std = GaussianProcess(X, ys, nugget=1e-6,
                             priors=GPPriors(n_corr=2, nugget_type="fixed"),
                             standardize=True)
    gp_manual = GaussianProcess(X, (ys - offset) / scale, nugget=1e-6,
                                priors=GPPriors(n_corr=2, nugget_type="fixed"))
    gp_std.fit(theta)
    gp_manual.fit(theta)

    xt = rng.uniform(0, 2, size=(6, 2))
    mu_s, var_s, _ = gp_std.predict(xt)
    mu_m, var_m, _ = gp_manual.predict(xt)
    assert_allclose(mu_s, mu_m * scale + offset, rtol=1e-10)
    assert_allclose(var_s, var_m * scale**2, rtol=1e-10)
    # original-unit targets preserved; pickling keeps the flag
    assert_allclose(gp_std.targets, ys)
    import pickle

    gp2 = pickle.loads(pickle.dumps(gp_std))
    assert_allclose(gp2.predict(xt)[0], mu_s, rtol=1e-8)


def test_mogp_full_cov_predict():
    from mogp_tpu import MultiOutputGP, fit_GP_MAP

    ys = np.stack([Y, -Y])
    mgp = fit_GP_MAP(MultiOutputGP(X, ys), n_tries=2)
    xt = rng.uniform(0, 2, size=(5, 2))
    res = mgp.predict(xt, full_cov=True)
    assert res.unc.shape == (2, 5, 5)
    res_var = mgp.predict(xt)
    for k in range(2):
        assert_allclose(np.diag(res.unc[k]), res_var.unc[k], rtol=1e-6,
                        atol=1e-10)


def test_fit_with_gpparams_object():
    from mogp_tpu import GPParams as GPParamsCls

    gp = GaussianProcess(X, Y)
    p = GPParamsCls(n_mean=0, n_corr=2, nugget="adaptive")
    p.set_data(np.array([0.1, -0.2, 0.3]))
    gp.fit(p)
    assert_allclose(gp.theta.get_data(), [0.1, -0.2, 0.3])
    # mismatched shape GPParams rejected
    p_bad = GPParamsCls(n_mean=0, n_corr=3, nugget="adaptive")
    p_bad.set_data(np.zeros(4))
    with pytest.raises(AssertionError):
        gp.fit(p_bad)
