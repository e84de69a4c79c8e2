"""GPParams / GPPriors reference-semantics tests.

Checks the transform conventions (``GPParams.py:34-161``), data layout
(``GPParams.py:215-555``), and the default-prior mass guarantees
(``Priors.py:85-152``) against scipy.
"""

import numpy as np
import pytest
import scipy.stats
from numpy.testing import assert_allclose

from mogp_tpu.models.params import GPParams
from mogp_tpu.models.priors import (
    GPPriors,
    GammaPrior,
    InvGammaPrior,
    LogNormalPrior,
    NormalPrior,
    WeakPrior,
)
from mogp_tpu.ops.transforms import CorrTransform, CovTransform


def test_transform_conventions():
    # l = exp(-theta/2)  (GPParams.py:44)
    assert_allclose(np.asarray(CorrTransform.transform(0.0)), 1.0)
    assert_allclose(np.asarray(CorrTransform.transform(2.0)), np.exp(-1.0))
    # sigma2 = exp(theta)  (GPParams.py:125)
    assert_allclose(np.asarray(CovTransform.transform(1.5)), np.exp(1.5))
    for v in [0.1, 1.0, 7.3]:
        assert_allclose(
            np.asarray(CorrTransform.transform(CorrTransform.inv_transform(v))),
            v, rtol=1e-12,
        )
        assert_allclose(
            np.asarray(CovTransform.transform(CovTransform.inv_transform(v))),
            v, rtol=1e-12,
        )


@pytest.mark.parametrize(
    "nugget,n_params,cov_index",
    [("fit", 4, -2), ("adaptive", 3, -1), ("pivot", 3, -1), (1e-6, 3, -1)],
)
def test_gpparams_layout(nugget, n_params, cov_index):
    p = GPParams(n_mean=2, n_corr=2, nugget=nugget)
    assert p.n_params == n_params
    assert p.cov_index == cov_index
    data = np.arange(1.0, n_params + 1)
    p.set_data(data)
    assert_allclose(p.corr_raw, data[:2])
    assert_allclose(p.corr, np.exp(-0.5 * data[:2]))
    assert_allclose(p.cov, np.exp(data[cov_index]))
    if nugget == "fit":
        assert_allclose(p.nugget, np.exp(data[-1]))
    elif isinstance(nugget, float):
        assert p.nugget == nugget


def test_gpparams_setters():
    p = GPParams(n_corr=2, nugget="fit")
    p.set_data(np.zeros(4))
    p.corr = np.array([2.0, 0.5])
    assert_allclose(p.get_data()[:2], -2.0 * np.log([2.0, 0.5]))
    p.cov = 3.0
    assert_allclose(p.get_data()[-2], np.log(3.0))
    p.nugget = 1e-4
    assert_allclose(p.get_data()[-1], np.log(1e-4))
    with pytest.raises(AssertionError):
        p.corr = np.array([-1.0, 1.0])
    p.set_data(None)
    assert p.get_data() is None


def test_gpparams_nugget_mode_restrictions():
    p = GPParams(n_corr=1, nugget="pivot")
    with pytest.raises(ValueError):
        p.nugget = 0.1
    p2 = GPParams(n_corr=1, nugget=0.5)
    with pytest.raises(ValueError):
        p2.nugget = 0.7
    p2.nugget = 0.5  # same value allowed


def test_default_priors_mass():
    """Default InvGamma correlation prior must put ~99% of its mass
    between the min and max input spacing (Priors.py:135-152)."""
    rng = np.random.RandomState(0)
    inputs = rng.uniform(0, 10, size=(25, 2))
    priors = GPPriors.default_priors(inputs, 2, nugget_type="fit")
    from mogp_tpu.models.priors import max_spacing, min_spacing

    for d, dist in enumerate(priors.corr):
        assert isinstance(dist, InvGammaPrior)
        lo = min_spacing(inputs[:, d])
        hi = max_spacing(inputs[:, d])
        frozen = scipy.stats.invgamma(dist.shape, scale=dist.scale)
        mass = frozen.cdf(hi) - frozen.cdf(lo)
        assert mass > 0.98

    # fit nugget gets the small-value default (mode in [1e-8, 1e-6])
    nug = priors.nugget
    assert isinstance(nug, InvGammaPrior)
    mode = nug.scale / (nug.shape + 1.0)
    assert 1e-8 <= mode <= 1e-6


def test_logp_matches_scipy():
    x = 0.73
    cases = [
        (NormalPrior(1.0, 2.0), scipy.stats.norm(loc=1.0, scale=2.0)),
        (LogNormalPrior(0.8, 1.5), scipy.stats.lognorm(s=0.8, scale=1.5)),
        (GammaPrior(2.0, 0.7), scipy.stats.gamma(a=2.0, scale=0.7)),
        (InvGammaPrior(3.0, 1.2), scipy.stats.invgamma(a=3.0, scale=1.2)),
    ]
    for prior, frozen in cases:
        assert_allclose(float(prior.logp(x)), frozen.logpdf(x), rtol=1e-8)


def test_dlogpdtheta_chain_rule():
    """dlogp/dtheta via the API matches finite differences through the
    transform (Priors.py:620-640 semantics)."""
    prior = InvGammaPrior(2.0, 1.0)
    theta = 0.4
    for transform in (CorrTransform, CovTransform):
        x = float(np.asarray(transform.transform(theta)))
        d = prior.dlogpdtheta(x, transform)
        eps = 1e-6
        fd = (
            float(prior.logp(np.asarray(transform.transform(theta + eps))))
            - float(prior.logp(np.asarray(transform.transform(theta - eps))))
        ) / (2 * eps)
        assert_allclose(d, fd, rtol=1e-5)


def test_gppriors_sample_shapes():
    priors = GPPriors(n_corr=3, nugget_type="fit")
    s = priors.sample()
    assert s.shape == (5,)  # 3 corr + cov + nugget
    # weak priors sample uniformly in [-2.5, 2.5]
    samples = np.array([priors.sample() for _ in range(200)])
    assert samples.min() >= -2.5 and samples.max() <= 2.5


def test_gppriors_requires_corr_info():
    with pytest.raises(ValueError):
        GPPriors()


def test_weak_prior_zero():
    w = WeakPrior()
    assert float(w.logp(1.0)) == 0.0
    assert w.dlogpdtheta(1.0, CovTransform) == 0.0
