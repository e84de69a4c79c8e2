"""MeanFunction AST + formula parser tests (vs reference semantics,
``MeanFunction.py`` / ``formula.py``)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from mogp_tpu.models.formula import mean_from_string
from mogp_tpu.models.meanfunction import (
    Coefficient,
    ConstantMean,
    FixedMean,
    LinearMean,
    MeanFunction,
    MeanPower,
    MeanProduct,
    MeanSum,
    PolynomialMean,
)

rng = np.random.RandomState(0)
X = rng.uniform(-1, 1, size=(8, 3))


def test_constant_and_linear():
    cm = ConstantMean(2.5)
    assert cm.get_n_params(X) == 0
    assert_allclose(cm(X, np.array([])), 2.5)
    lm = LinearMean(1)
    assert_allclose(lm(X, np.array([])), X[:, 1])


def test_coefficient_and_sum():
    mf = Coefficient() + Coefficient() * LinearMean(0)
    assert mf.get_n_params(X) == 2
    params = np.array([1.5, -2.0])
    assert_allclose(mf(X, params), 1.5 - 2.0 * X[:, 0])


def test_mean_deriv_matches_fd():
    mf = Coefficient() * LinearMean(0) + Coefficient() * LinearMean(2) ** 2.0
    params = np.array([0.7, 1.3])
    deriv = mf.mean_deriv(X, params)
    assert deriv.shape == (2, 8)
    eps = 1e-6
    for i in range(2):
        pp, pm = params.copy(), params.copy()
        pp[i] += eps
        pm[i] -= eps
        fd = (mf(X, pp) - mf(X, pm)) / (2 * eps)
        assert_allclose(deriv[i], fd, rtol=1e-6, atol=1e-8)


def test_mean_inputderiv():
    mf = Coefficient() * LinearMean(0)
    params = np.array([3.0])
    dx = mf.mean_inputderiv(X, params)
    assert dx.shape == (3, 8)
    assert_allclose(dx[0], 3.0)
    assert_allclose(dx[1], 0.0)


def test_mean_hessian_shape():
    mf = Coefficient() * Coefficient()
    hess = mf.mean_hessian(X, np.array([1.0, 2.0]))
    assert hess.shape == (2, 2, 8)
    assert_allclose(hess[0, 1], 1.0)


def test_polynomial_mean():
    pm = PolynomialMean(2)
    assert pm.get_n_params(X) == 7
    params = rng.randn(7)
    expected = params[0] + sum(
        params[1 + d * 2] * X[:, d] + params[2 + d * 2] * X[:, d] ** 2
        for d in range(3)
    )
    assert_allclose(pm(X, params), expected, rtol=1e-10)


def test_fixed_mean_callable():
    fm = FixedMean(lambda x: x[:, 0] ** 3)
    assert fm.get_n_params(X) == 0
    assert_allclose(fm(X, np.array([])), X[:, 0] ** 3)


def test_formula_reference_examples():
    """Examples from formula.py:119-126."""
    mf1 = mean_from_string("y = a + b*x[0]")
    assert mf1.get_n_params(X) == 2
    assert_allclose(
        mf1(X, np.array([2.0, 3.0])), 2.0 + 3.0 * X[:, 0], rtol=1e-12
    )
    mf2 = mean_from_string("c*a*b", {"a": 0, "b": 1})
    assert mf2.get_n_params(X) == 1
    assert_allclose(
        mf2(X, np.array([2.0])), 2.0 * X[:, 0] * X[:, 1], rtol=1e-12
    )


def test_formula_operations():
    mf = mean_from_string("1 + x[0]^2")
    assert_allclose(mf(X, np.array([])), 1.0 + X[:, 0] ** 2, rtol=1e-12)
    mf = mean_from_string("(x[0] + x[1])*2")
    assert_allclose(mf(X, np.array([])), (X[:, 0] + X[:, 1]) * 2, rtol=1e-12)
    mf = mean_from_string("inputs[2]")
    assert_allclose(mf(X, np.array([])), X[:, 2])
    mf = mean_from_string("x[0]**2")  # ** also accepted
    assert_allclose(mf(X, np.array([])), X[:, 0] ** 2, rtol=1e-12)


def test_formula_identity_call():
    mf = mean_from_string("I(x[0]) + a")
    assert mf.get_n_params(X) == 1
    assert_allclose(mf(X, np.array([4.0])), X[:, 0] + 4.0, rtol=1e-12)


def test_formula_errors():
    with pytest.raises(SyntaxError):
        mean_from_string("a + (b")
    with pytest.raises(SyntaxError):
        mean_from_string("call + x[0]")
    with pytest.raises(SyntaxError):
        mean_from_string("a + + b")


def test_meanfunction_factory():
    mf = MeanFunction("a + b*x[0]")
    assert mf.get_n_params(X) == 2
    mf2 = MeanFunction(mf)
    assert mf2 is mf
    with pytest.raises(ValueError):
        MeanFunction(1.5)


def test_composition():
    inner = Coefficient() * LinearMean(0)
    outer = LinearMean(0) ** 2.0
    comp = outer(inner)
    params = np.array([2.0])
    assert_allclose(comp(X, params), (2.0 * X[:, 0]) ** 2, rtol=1e-10)
