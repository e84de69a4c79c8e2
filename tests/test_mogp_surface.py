"""Deep MultiOutputGP surface tests.

Mirrors reference ``tests/test_MultiOutputGP.py`` (242 LoC): constructor
broadcast conventions and shape validation, explicit-inverse numpy
prediction oracles per output (zero and fixed nugget,
``include_nugget`` semantics), fit/fit_emulator/reset_fit_status
bookkeeping, and the unfit-prediction contract.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from mogp_tpu import GaussianProcess, MultiOutputGP
from mogp_tpu.models.priors import GPPriors

X = np.array([[1.0, 2.0, 3.0],
              [4.0, 5.0, 6.0],
              [7.0, 8.0, 1.0],
              [2.0, 6.0, 3.0]])
Y = np.array([[2.0, 3.0, 4.0, 5.0],
              [6.0, 7.0, 8.0, 9.0]])
XT = np.array([[2.0, 3.0, 4.0], [6.0, 1.0, 2.0]])


# -- constructor --------------------------------------------------------------


def test_init_shapes_and_properties():
    mgp = MultiOutputGP(X, Y)
    assert mgp.n_emulators == 2
    assert mgp.n == 4
    assert mgp.D == 3
    assert len(mgp.emulators) == 2
    assert all(isinstance(em, GaussianProcess) for em in mgp.emulators)
    assert_allclose(mgp.inputs, X)
    assert_allclose(mgp.targets, Y)
    assert mgp.n_params == [em.n_params for em in mgp.emulators]


def test_init_1d_conventions():
    # 1D targets -> one emulator; 1D inputs -> single input dimension
    mgp = MultiOutputGP(X, Y[0])
    assert mgp.n_emulators == 1
    mgp = MultiOutputGP(np.arange(5.0), np.zeros((2, 5)))
    assert mgp.D == 1 and mgp.n == 5


def test_init_shape_failures():
    with pytest.raises(ValueError):
        MultiOutputGP(X, np.zeros((2, 3)))  # n mismatch
    with pytest.raises(ValueError):
        MultiOutputGP(X, np.zeros((2, 2, 2)))  # 3D targets
    with pytest.raises(ValueError):
        MultiOutputGP(np.zeros((2, 2, 2)), np.zeros((1, 2)))  # 3D inputs


def test_init_broadcast_scalar_configs():
    mgp = MultiOutputGP(X, Y, mean="1", kernel="Matern52", nugget=1e-4)
    for em in mgp.emulators:
        assert type(em.kernel).__name__ == "Matern52"
        assert em.nugget_type == "fixed"
        assert em.nugget == pytest.approx(1e-4)


def test_init_per_output_lists():
    mgp = MultiOutputGP(
        X, Y,
        mean=[None, "x[0]"],
        kernel=["SquaredExponential", "Matern52"],
        nugget=["adaptive", 1e-5],
    )
    assert type(mgp.emulators[0].kernel).__name__ == "SquaredExponential"
    assert type(mgp.emulators[1].kernel).__name__ == "Matern52"
    assert mgp.emulators[0].nugget_type == "adaptive"
    assert mgp.emulators[1].nugget_type == "fixed"
    assert mgp.emulators[0].n_mean == 0
    assert mgp.emulators[1].n_mean == 2  # intercept + slope


def test_init_bad_list_lengths():
    with pytest.raises(AssertionError):
        MultiOutputGP(X, Y, kernel=["Matern52"])
    with pytest.raises(AssertionError):
        MultiOutputGP(X, Y, nugget=["adaptive"])
    with pytest.raises(AssertionError):
        MultiOutputGP(X, Y, mean=[None, None, None])
    with pytest.raises(AssertionError):
        MultiOutputGP(X, Y, priors=[None])


# -- prediction oracles -------------------------------------------------------


def zero_mean_priors(nugget_type):
    return GPPriors(n_corr=3, nugget_type=nugget_type)


def test_predict_oracle_zero_nugget():
    """Explicit numpy GP prediction oracle per output (zero-mean GPs,
    fixed theta)."""
    mgp = MultiOutputGP(X, Y, nugget=0.0,
                        priors=[zero_mean_priors("fixed")] * 2)
    thetas = [np.linspace(-0.2, 0.4, em.n_params) for em in mgp.emulators]
    mgp.fit(np.stack(thetas))
    res = mgp.predict(XT)
    for i, em in enumerate(mgp.emulators):
        theta = thetas[i]
        sig2 = np.exp(theta[-1])
        K = sig2 * np.asarray(em.kernel.kernel_f(X, X, theta[:-1]))
        Ks = sig2 * np.asarray(em.kernel.kernel_f(X, XT, theta[:-1]))
        mu_exp = Ks.T @ np.linalg.solve(K, Y[i])
        var_exp = sig2 - np.sum(Ks * np.linalg.solve(K, Ks), axis=0)
        assert_allclose(res.mean[i], mu_exp, rtol=1e-6, atol=1e-8)
        assert_allclose(res.unc[i], var_exp, rtol=1e-6, atol=1e-8)


def test_predict_oracle_fixed_nugget_include_semantics():
    nugget = 0.5
    mgp = MultiOutputGP(X, Y, nugget=nugget,
                        priors=[zero_mean_priors("fixed")] * 2)
    thetas = np.stack([np.zeros(em.n_params) for em in mgp.emulators])
    mgp.fit(thetas)
    res_with = mgp.predict(XT, include_nugget=True)
    res_without = mgp.predict(XT, include_nugget=False)
    for i, em in enumerate(mgp.emulators):
        sig2 = 1.0
        K = sig2 * np.asarray(em.kernel.kernel_f(X, X, np.zeros(3))) \
            + nugget * np.eye(4)
        Ks = sig2 * np.asarray(em.kernel.kernel_f(X, XT, np.zeros(3)))
        base = sig2 - np.sum(Ks * np.linalg.solve(K, Ks), axis=0)
        assert_allclose(res_with.unc[i], base + nugget, rtol=1e-6, atol=1e-8)
        assert_allclose(res_without.unc[i], base, rtol=1e-6, atol=1e-8)


def test_predict_unc_false():
    mgp = MultiOutputGP(X, Y, nugget=0.1)
    mgp.fit(np.stack([np.zeros(em.n_params) for em in mgp.emulators]))
    res = mgp.predict(XT, unc=False)
    assert res.mean.shape == (2, 2)
    assert res.unc is None


def test_call_returns_means():
    mgp = MultiOutputGP(X, Y, nugget=0.1)
    mgp.fit(np.stack([np.zeros(em.n_params) for em in mgp.emulators]))
    assert_allclose(np.asarray(mgp(XT)), np.asarray(mgp.predict(XT).mean))


# -- fit bookkeeping ----------------------------------------------------------


def test_fit_emulator_and_status():
    mgp = MultiOutputGP(X, Y, nugget=0.1)
    assert mgp.get_indices_fit() == []
    assert mgp.get_indices_not_fit() == [0, 1]
    theta = np.zeros(mgp.emulators[0].n_params)
    mgp.fit_emulator(1, theta)
    assert mgp.get_indices_fit() == [1]
    assert mgp.get_indices_not_fit() == [0]
    assert mgp.get_emulators_fit() == [mgp.emulators[1]]
    assert mgp.get_emulators_not_fit() == [mgp.emulators[0]]
    mgp.reset_fit_status()
    assert mgp.get_indices_fit() == []


def test_partial_fit_predictions():
    mgp = MultiOutputGP(X, Y, nugget=0.1)
    mgp.fit_emulator(0, np.zeros(mgp.emulators[0].n_params))
    res = mgp.predict(XT, allow_not_fit=True)
    assert np.all(np.isfinite(res.mean[0]))
    assert np.all(np.isnan(res.mean[1]))
    assert np.all(np.isnan(res.unc[1]))
    with pytest.raises(ValueError):
        mgp.predict(XT)  # default allow_not_fit=False


def test_str_contains_counts():
    s = str(MultiOutputGP(X, Y))
    assert "2" in s and "emulator" in s.lower()


def test_heterogeneous_means_predict_correctly():
    """Different mean formulas with the SAME column count must not share
    a prediction batch: grouped predict evaluates one design matrix per
    group, so the mean spec is part of the batch signature (regression:
    mean=["x[0]", "x[1]"] silently predicted output 1 with output 0's
    design matrix)."""
    from mogp_tpu.models.fitting import fit_GP_MAP

    rng = np.random.RandomState(0)
    x = rng.uniform(size=(40, 2))
    y0 = 5.0 * x[:, 0] + 0.05 * np.sin(8 * x[:, 1])
    y1 = 5.0 * x[:, 1] + 0.05 * np.sin(8 * x[:, 0])
    mgp = MultiOutputGP(x, np.stack([y0, y1]), mean=["x[0]", "x[1]"],
                        nugget="adaptive")
    # two groups: equal n_mean but different formulas
    assert len(mgp._groups()) == 2
    np.random.seed(1)
    mgp = fit_GP_MAP(mgp, n_tries=2, maxiter=50)
    xt = rng.uniform(size=(15, 2))
    mu = np.asarray(mgp.predict(xt).mean)
    for i in range(2):
        mu_i, _, _ = mgp.emulators[i].predict(xt)
        assert np.allclose(mu[i], mu_i, atol=1e-8)
    # identical formulas still batch into one group
    mgp_same = MultiOutputGP(x, np.stack([y0, y1]), mean="x[0]",
                             nugget="adaptive")
    assert len(mgp_same._groups()) == 1
