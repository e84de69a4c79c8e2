"""Prior-distribution oracles: scipy logpdf parity + hand-derived
transform chain-rule first/second derivatives.

Deep L1 coverage in the reference's style (``tests/test_Priors.py``):
each distribution's ``logp`` is checked against scipy, and
``dlogpdtheta`` / ``d2logpdtheta2`` (raw-parameter derivatives through
the Corr/Cov transforms) are checked against closed forms derived here
independently:

  CorrTransform: x(t) = exp(-t/2), x' = -x/2, x'' = x/4
  CovTransform:  x(t) = exp(t),    x' = x,    x'' = x
  d/dt   logp = logp'(x) x'
  d2/dt2 logp = logp''(x) x'^2 + logp'(x) x''
"""

import numpy as np
import pytest
import scipy.stats
from numpy.testing import assert_allclose

import jax.numpy as jnp

from mogp_tpu.models.priors import (
    GPPriors,
    GammaPrior,
    InvGammaPrior,
    LogNormalPrior,
    MeanPriors,
    NormalPrior,
    PriorDist,
    WeakPrior,
    dist_logp,
    max_spacing,
    min_spacing,
)
from mogp_tpu.ops.transforms import CorrTransform, CovTransform

XVALS = [0.2, 0.7, 1.0, 2.5, 6.0]


def cases():
    return [
        (NormalPrior(1.2, 0.8), scipy.stats.norm(1.2, 0.8),
         lambda x: -(x - 1.2) / 0.8**2,
         lambda x: -1.0 / 0.8**2 + 0.0 * x),
        (LogNormalPrior(0.5, 2.0), scipy.stats.lognorm(0.5, scale=2.0),
         lambda x: -np.log(x / 2.0) / (0.5**2 * x) - 1.0 / x,
         lambda x: (np.log(x / 2.0) - 0.5**2 + 1.0 * 0.5**2 * 0.0)
         * 0.0  # filled below
         ),
        (GammaPrior(2.5, 1.5), scipy.stats.gamma(2.5, scale=1.5),
         lambda x: (2.5 - 1.0) / x - 1.0 / 1.5,
         lambda x: -(2.5 - 1.0) / x**2),
        (InvGammaPrior(3.0, 2.0), scipy.stats.invgamma(3.0, scale=2.0),
         lambda x: -(3.0 + 1.0) / x + 2.0 / x**2,
         lambda x: (3.0 + 1.0) / x**2 - 2.0 * 2.0 / x**3),
    ]


def lognorm_d2(x):
    # d/dx [-log(x/m)/(s^2 x) - 1/x] with s=0.5, m=2.0
    s2 = 0.25
    return (np.log(x / 2.0) - 1.0) / (s2 * x**2) + 1.0 / x**2


@pytest.mark.parametrize("x", XVALS)
def test_logp_matches_scipy(x):
    for prior, sp, _, _ in cases():
        assert_allclose(float(prior.logp(x)), sp.logpdf(x), rtol=1e-9)


@pytest.mark.parametrize("x", XVALS)
def test_dlogpdx_matches_closed_form(x):
    for prior, _, d1, d2 in cases():
        assert_allclose(prior.dlogpdx(x), d1(x), rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize("x", XVALS)
def test_d2logpdx2_matches_closed_form(x):
    for prior, _, _, d2 in cases():
        if isinstance(prior, LogNormalPrior):
            expect = lognorm_d2(x)
        else:
            expect = d2(x)
        assert_allclose(prior.d2logpdx2(x), expect, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("transform,xp,xpp", [
    (CorrTransform, lambda x: -x / 2.0, lambda x: x / 4.0),
    (CovTransform, lambda x: x, lambda x: x),
])
@pytest.mark.parametrize("x", XVALS)
def test_dlogpdtheta_chain_rule(transform, xp, xpp, x):
    """Raw-parameter derivatives equal the hand-derived chain rule."""
    for prior, _, d1, _ in cases():
        expect = d1(x) * xp(x)
        assert_allclose(prior.dlogpdtheta(x, transform), expect,
                        rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("transform,xp,xpp", [
    (CorrTransform, lambda x: -x / 2.0, lambda x: x / 4.0),
    (CovTransform, lambda x: x, lambda x: x),
])
@pytest.mark.parametrize("x", [0.7, 1.0, 2.5])
def test_d2logpdtheta2_chain_rule(transform, xp, xpp, x):
    for prior, _, d1, d2 in cases():
        dd = lognorm_d2(x) if isinstance(prior, LogNormalPrior) else d2(x)
        expect = dd * xp(x) ** 2 + d1(x) * xpp(x)
        assert_allclose(prior.d2logpdtheta2(x, transform), expect,
                        rtol=1e-5, atol=1e-8)


def test_weak_prior_is_flat():
    w = WeakPrior()
    for x in XVALS:
        assert float(w.logp(x)) == 0.0
        assert w.dlogpdx(x) == 0.0
        assert w.d2logpdx2(x) == 0.0
        assert w.dlogpdtheta(x, CovTransform) == 0.0
    # weak samples live in [-2.5, 2.5] raw (Priors.py:668)
    np.random.seed(0)
    s = np.array([w.sample() for _ in range(200)])
    assert s.min() >= -2.5 and s.max() <= 2.5


def test_packed_logp_matches_objects():
    """The coded lax.switch path equals the object logp for every family."""
    for prior, sp, _, _ in cases():
        a, b = prior.packed_params
        for x in XVALS:
            got = float(dist_logp(jnp.asarray(prior.code), jnp.asarray(a),
                                  jnp.asarray(b), jnp.asarray(float(x))))
            assert_allclose(got, sp.logpdf(x), rtol=1e-6)


def test_sampling_statistics():
    """Transformed samples follow the target distribution (moment check)."""
    np.random.seed(42)
    n = 4000
    g = GammaPrior(3.0, 2.0)
    xs = np.array([CovTransform.transform(g.sample(CovTransform))
                   for _ in range(n)])
    assert abs(np.mean(xs) - 6.0) < 0.3  # mean = shape*scale
    ln = LogNormalPrior(0.25, 2.0)  # mean = scale * exp(shape^2/2)
    xs = np.array([CovTransform.transform(ln.sample(CovTransform))
                   for _ in range(n)])
    assert abs(np.mean(xs) - 2.0 * np.exp(0.25**2 / 2)) < 0.1


def test_default_prior_mass():
    """default_prior puts 99% of mass in [min, max] (Priors.py:741-752)."""
    for cls, sp in [
        (InvGammaPrior, scipy.stats.invgamma),
        (GammaPrior, scipy.stats.gamma),
        (LogNormalPrior, scipy.stats.lognorm),
    ]:
        prior = cls.default_prior(0.1, 5.0)
        assert isinstance(prior, cls)
        a, b = prior.packed_params
        frozen = sp(a, scale=b)
        assert_allclose(frozen.cdf(0.1), 0.005, atol=1e-5)
        assert_allclose(frozen.cdf(5.0), 0.995, atol=1e-5)


def test_default_prior_bad_inputs():
    with pytest.raises(AssertionError):
        InvGammaPrior.default_prior(-1.0, 5.0)
    with pytest.raises(AssertionError):
        InvGammaPrior.default_prior(5.0, 1.0)
    with pytest.raises(ValueError):
        NormalPrior.default_prior(0.1, 5.0)


def test_invgamma_default_mode():
    """default_prior_mode puts the mode within [min, max]
    (Priors.py:1012-1082)."""
    prior = InvGammaPrior.default_prior_mode(0.5, 3.0)
    a, b = prior.packed_params
    mode = b / (a + 1.0)
    assert 0.5 <= mode <= 3.0


def test_invgamma_default_nugget():
    prior = InvGammaPrior.default_prior_nugget()
    a, b = prior.packed_params
    mode = b / (a + 1.0)
    assert 1e-8 <= mode <= 1e-6


def test_spacing_helpers():
    """min/max spacing over unique sorted per-dim values
    (Priors.py:1151-1188)."""
    x = np.array([[0.0], [1.0], [3.0], [3.0]])
    assert_allclose(max_spacing(x), 3.0)  # total range of uniques
    assert_allclose(min_spacing(x), 1.5)  # median of diffs [1, 2]
    # degenerate: all identical -> zero spacing
    xd = np.zeros((4, 1))
    assert max_spacing(xd) == 0.0
    assert min_spacing(xd) == 0.0


def test_default_priors_fallback_to_weak():
    """Too few unique inputs -> weak corr priors, no crash."""
    x = np.zeros((5, 2))
    priors = GPPriors.default_priors(x, n_corr=2, nugget_type="fit")
    assert priors is not None


def test_mean_priors_math():
    """MeanPriors inv_cov / inv_cov_b / logdet_cov against numpy."""
    mean = np.array([1.0, -2.0])
    cov = np.array([[2.0, 0.3], [0.3, 1.5]])
    mp = MeanPriors(mean=mean, cov=cov)
    assert_allclose(np.asarray(mp.inv_cov()), np.linalg.inv(cov),
                    rtol=1e-10)
    assert_allclose(np.asarray(mp.inv_cov_b()),
                    np.linalg.solve(cov, mean), rtol=1e-10)
    assert_allclose(float(mp.logdet_cov()),
                    np.linalg.slogdet(cov)[1], rtol=1e-10)
    # scalar cov broadcast
    mp2 = MeanPriors(mean=mean, cov=2.5)
    assert_allclose(np.asarray(mp2.inv_cov()), np.eye(2) / 2.5, rtol=1e-12)


def test_mean_priors_validation():
    with pytest.raises(AssertionError):
        MeanPriors(mean=np.array([1.0, 2.0]), cov=-1.0)
    with pytest.raises(AssertionError):
        MeanPriors(mean=np.array([1.0, 2.0]),
                   cov=np.array([[1.0, 0.0], [0.0, -1.0]]))
    weak = MeanPriors()
    assert weak.has_weak_priors
