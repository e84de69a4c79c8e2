"""Additional GP-core oracle tests: informative mean priors, nugget
semantics, interpolation, and input validation (reference scope:
``tests/test_GaussianProcess.py``)."""

import numpy as np
import pytest
import scipy.linalg
from numpy.testing import assert_allclose

from mogp_tpu import GaussianProcess, fit_GP_MAP
from mogp_tpu.models.priors import GPPriors, MeanPriors, WeakPrior

rng = np.random.RandomState(31)
X = rng.uniform(size=(18, 2))
Y = np.sin(4 * X[:, 0]) + X[:, 1]


def np_nlp_meanpriors(x, y, dm, theta, b, B):
    """Independent numpy NLP oracle with an informative N(b, B) mean
    prior (the marginalized-mean math of GaussianProcess.py:655-685
    rederived here in plain numpy)."""
    n, M = dm.shape
    exp_theta = np.exp(theta[:2])
    r2 = np.sum(exp_theta * (x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    K = np.exp(theta[2]) * np.exp(-0.5 * r2)
    # adaptive mode, well-conditioned case: no jitter needed
    L = scipy.linalg.cholesky(K, lower=True)
    Binv = np.linalg.inv(B)
    resid = y - dm @ b
    Kinv_r = scipy.linalg.cho_solve((L, True), resid)
    Kinv_H = scipy.linalg.cho_solve((L, True), dm)
    A = dm.T @ Kinv_H + Binv
    LA = scipy.linalg.cholesky(A, lower=True)
    c = dm.T @ Kinv_r
    quad_corr = c @ scipy.linalg.cho_solve((LA, True), c)
    return 0.5 * (
        resid @ Kinv_r
        - quad_corr
        + 2 * np.sum(np.log(np.diag(L)))
        + 2 * np.sum(np.log(np.diag(LA)))
        + np.linalg.slogdet(B)[1]
        + n * np.log(2 * np.pi)
    )


def test_informative_mean_prior_nlp_oracle():
    b = np.array([0.5, -1.0])
    B = np.array([[2.0, 0.2], [0.2, 1.0]])
    priors = GPPriors(
        mean=MeanPriors(mean=b, cov=B),
        corr=[WeakPrior(), WeakPrior()],
        cov=WeakPrior(),
        nugget_type="adaptive",
    )
    gp = GaussianProcess(X, Y, mean="x[0]", priors=priors, nugget="adaptive")
    theta = np.array([0.4, -0.3, 0.2])
    dm = gp.get_design_matrix(X)
    assert dm.shape == (18, 2)
    expect = np_nlp_meanpriors(X, Y, dm, theta, b, B)
    assert_allclose(float(gp.logposterior(theta)), expect, rtol=1e-7)


def test_informative_mean_prior_pulls_coefficients():
    """A tight mean prior pins beta_hat near b."""
    b = np.array([3.0])
    priors_tight = GPPriors(
        mean=MeanPriors(mean=b, cov=1e-8),
        corr=[WeakPrior(), WeakPrior()],
        cov=WeakPrior(),
        nugget_type="adaptive",
    )
    gp = GaussianProcess(X, Y, mean="1", priors=priors_tight,
                         nugget="adaptive")
    gp.fit(np.zeros(3))
    assert_allclose(float(gp.theta.mean[0]), 3.0, atol=1e-4)


def test_interpolation_at_training_points():
    """Near-noiseless GP at its MAP point reproduces training targets."""
    gp = fit_GP_MAP(GaussianProcess(X, Y, nugget=1e-10), n_tries=3,
                    maxiter=100)
    mu, var, _ = gp.predict(X)
    assert_allclose(mu, Y, atol=1e-4)
    assert np.all(np.asarray(var) < 1e-4)


def test_include_nugget_variance_semantics():
    """predict(include_nugget=True) - predict(False) == fitted nugget."""
    gp = fit_GP_MAP(GaussianProcess(X, Y, nugget="fit"), n_tries=3,
                    maxiter=60)
    xq = rng.uniform(size=(7, 2))
    _, var_with, _ = gp.predict(xq, include_nugget=True)
    _, var_without, _ = gp.predict(xq, include_nugget=False)
    assert_allclose(np.asarray(var_with) - np.asarray(var_without),
                    gp.nugget, rtol=1e-6)


def test_constructor_validation():
    with pytest.raises(AssertionError):
        GaussianProcess(X, Y[:-1])          # length mismatch
    with pytest.raises(AssertionError):
        GaussianProcess(np.zeros((3, 2, 2)), np.zeros(3))  # 3-D inputs
    with pytest.raises(ValueError):
        GaussianProcess(X, Y, kernel="NotAKernel")
    with pytest.raises(ValueError):
        GaussianProcess(X, Y, nugget="bogus")
    with pytest.raises(ValueError):
        GaussianProcess(X, Y, nugget=-1.0)


def test_predict_shape_validation():
    gp = fit_GP_MAP(GaussianProcess(X, Y), n_tries=2, maxiter=30)
    with pytest.raises(AssertionError):
        gp.predict(np.zeros((4, 5)))  # wrong D
    # single point as 1-D vector of length D is accepted
    mu, var, _ = gp.predict(np.array([0.5, 0.5]))
    assert np.asarray(mu).shape == (1,)


def test_1d_input_gp():
    x1 = np.linspace(0, 1, 15)
    y1 = np.sin(6 * x1)
    gp = fit_GP_MAP(GaussianProcess(x1, y1), n_tries=3, maxiter=60)
    xq = np.linspace(0.1, 0.9, 5)
    mu, var, _ = gp.predict(xq)
    assert_allclose(mu, np.sin(6 * xq), atol=0.1)
