"""Deep GPParams container tests.

Mirrors reference ``tests/test_GPParams.py`` (307 LoC): construction and
shape bookkeeping for every nugget mode, transformed getters/setters
with exact transform oracles (corr ``l = exp(-theta/2)``, cov/nugget
``exp(theta)``), the per-mode nugget setter rules, ``set_data`` reset
semantics, ``same_shape`` across types, and ``__str__``.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from mogp_tpu.models.params import GPParams, _process_nugget


# -- construction -------------------------------------------------------------


def test_init_defaults():
    p = GPParams()
    assert p.n_mean == 0
    assert p.n_corr == 1
    assert p.nugget_type == "fit"
    assert p.n_params == 3  # corr + cov + nugget
    assert p.get_data() is None
    assert p.mean is not None and p.mean.shape == (0,)


@pytest.mark.parametrize(
    "nugget,ntype,value,n_params,cov_index",
    [
        ("fit", "fit", None, 4, -2),
        ("adaptive", "adaptive", None, 3, -1),
        ("pivot", "pivot", None, 3, -1),
        (1e-4, "fixed", 1e-4, 3, -1),
        (0.0, "fixed", 0.0, 3, -1),
    ],
)
def test_init_nugget_modes(nugget, ntype, value, n_params, cov_index):
    p = GPParams(n_mean=2, n_corr=2, nugget=nugget)
    assert p.nugget_type == ntype
    assert p.n_params == n_params
    assert p.cov_index == cov_index
    if ntype == "fixed":
        assert p.nugget == pytest.approx(value)
    else:
        assert p.nugget is None  # no data set yet


def test_init_failures():
    with pytest.raises(AssertionError):
        GPParams(n_mean=-1)
    with pytest.raises(AssertionError):
        GPParams(n_corr=0)
    with pytest.raises(ValueError):
        GPParams(nugget="bogus")
    with pytest.raises(ValueError):
        GPParams(nugget=-1.0)
    with pytest.raises(TypeError):
        GPParams(nugget=[1.0, 2.0])


def test_process_nugget():
    assert _process_nugget("adaptive") == (None, "adaptive")
    assert _process_nugget("fit") == (None, "fit")
    assert _process_nugget("pivot") == (None, "pivot")
    assert _process_nugget(2.5) == (2.5, "fixed")
    assert _process_nugget(np.float64(0.5)) == (0.5, "fixed")
    with pytest.raises(TypeError):
        _process_nugget(None)


# -- transformed getters ------------------------------------------------------


def test_corr_cov_transform_oracles():
    p = GPParams(n_corr=3, nugget="fit")
    raw = np.array([0.4, -0.8, 1.2, 0.6, -2.0])
    p.set_data(raw)
    assert_allclose(p.corr_raw, raw[:3])
    assert_allclose(p.corr, np.exp(-raw[:3] / 2.0), rtol=1e-12)
    assert_allclose(p.cov, np.exp(raw[3]), rtol=1e-12)
    assert_allclose(p.nugget, np.exp(raw[4]), rtol=1e-12)


def test_getters_none_before_data():
    p = GPParams(n_corr=2, nugget="fit")
    assert p.corr is None
    assert p.corr_raw is None
    assert p.cov is None
    assert p.nugget is None


# -- setters ------------------------------------------------------------------


def test_corr_setter_roundtrip():
    p = GPParams(n_corr=2, nugget="adaptive")
    p.set_data(np.zeros(3))
    p.corr = np.array([0.5, 2.0])
    assert_allclose(p.corr, [0.5, 2.0], rtol=1e-12)
    # raw layout updated: theta = -2 log(l)
    assert_allclose(p.get_data()[:2], -2.0 * np.log([0.5, 2.0]), rtol=1e-12)
    with pytest.raises(AssertionError):
        p.corr = np.array([-1.0, 1.0])  # must be positive
    with pytest.raises(AssertionError):
        p.corr = np.array([1.0])  # wrong length
    with pytest.raises(ValueError):
        p.corr = None


def test_corr_setter_requires_data():
    p = GPParams(n_corr=2)
    with pytest.raises(ValueError):
        p.corr = np.array([1.0, 1.0])


def test_cov_setter_roundtrip():
    p = GPParams(n_corr=1, nugget="fit")
    p.set_data(np.zeros(3))
    p.cov = 4.0
    assert p.cov == pytest.approx(4.0)
    assert p.get_data()[-2] == pytest.approx(np.log(4.0))
    with pytest.raises(AssertionError):
        p.cov = -1.0
    with pytest.raises(ValueError):
        GPParams(n_corr=1).cov = 1.0  # no data


def test_mean_setter():
    p = GPParams(n_mean=2, n_corr=1)
    assert p.mean is None
    p.mean = np.array([1.0, -2.0])
    assert_allclose(p.mean, [1.0, -2.0])
    with pytest.raises(AssertionError):
        p.mean = np.array([1.0, 2.0, 3.0])
    p.mean = None
    assert p.mean is None
    # zero-mean container keeps its empty array
    p0 = GPParams(n_mean=0)
    p0.mean = None
    assert p0.mean.shape == (0,)


# -- nugget setter per mode ---------------------------------------------------


def test_nugget_setter_fit_mode():
    p = GPParams(n_corr=1, nugget="fit")
    p.set_data(np.zeros(3))
    p.nugget = 1e-3
    assert p.nugget == pytest.approx(1e-3)
    assert p.get_data()[-1] == pytest.approx(np.log(1e-3))
    with pytest.raises(ValueError):
        p.nugget = None
    with pytest.raises(AssertionError):
        p.nugget = -1e-3


def test_nugget_setter_fit_mode_requires_data():
    p = GPParams(n_corr=1, nugget="fit")
    with pytest.raises(ValueError):
        p.nugget = 1e-3


def test_nugget_setter_adaptive_mode():
    p = GPParams(n_corr=1, nugget="adaptive")
    p.nugget = 2e-6
    assert p.nugget == pytest.approx(2e-6)
    p.nugget = None
    assert p.nugget is None
    with pytest.raises(AssertionError):
        p.nugget = -1.0


def test_nugget_setter_fixed_mode():
    p = GPParams(n_corr=1, nugget=1e-4)
    p.nugget = 1e-4  # same value allowed
    with pytest.raises(ValueError):
        p.nugget = 2e-4  # changing a fixed nugget is an error


def test_nugget_setter_pivot_mode():
    p = GPParams(n_corr=1, nugget="pivot")
    p.nugget = None  # allowed
    with pytest.raises(ValueError):
        p.nugget = 1e-4


# -- data management ----------------------------------------------------------


def test_set_data_resets_mean_and_adaptive_nugget():
    p = GPParams(n_mean=1, n_corr=1, nugget="adaptive")
    p.set_data(np.zeros(2))
    p.mean = np.array([5.0])
    p.nugget = 1e-5
    p.set_data(np.ones(2))
    assert p.mean is None
    assert p.nugget is None
    assert_allclose(p.get_data(), np.ones(2))


def test_set_data_shape_check():
    p = GPParams(n_corr=2, nugget="fit")
    with pytest.raises(AssertionError):
        p.set_data(np.zeros(3))  # needs 4
    p.set_data(None)
    assert p.get_data() is None


def test_set_data_copies():
    p = GPParams(n_corr=1, nugget="adaptive")
    arr = np.zeros(2)
    p.set_data(arr)
    arr[0] = 99.0
    assert p.get_data()[0] == 0.0


def test_same_shape():
    p = GPParams(n_mean=1, n_corr=2, nugget="fit")
    assert p.same_shape(np.zeros(4))
    assert not p.same_shape(np.zeros(3))
    assert p.same_shape(GPParams(n_mean=1, n_corr=2, nugget="fit"))
    assert not p.same_shape(GPParams(n_mean=2, n_corr=2, nugget="fit"))
    assert not p.same_shape(GPParams(n_mean=1, n_corr=2, nugget="adaptive"))
    assert p.same_shape([0.0, 0.0, 0.0, 0.0])  # array-like
    with pytest.raises(ValueError):
        p.same_shape({"a": 1})


def test_str_forms():
    p = GPParams(n_corr=1, nugget="fit")
    assert "data = None" in str(p)
    p.set_data(np.zeros(3))
    s = str(p)
    for field in ("mean", "correlation", "covariance", "nugget"):
        assert field in s
