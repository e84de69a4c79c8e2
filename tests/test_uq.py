"""UQ-toolchain tests: designs, history matching, validation, gKDR, MICE."""

import os

import numpy as np
import pytest
import scipy.stats
from numpy.testing import assert_allclose
from scipy.spatial.distance import pdist

from mogp_tpu import (
    GaussianProcess,
    HistoryMatching,
    LatinHypercubeDesign,
    MaxiMinLHC,
    MICEDesign,
    MonteCarloDesign,
    MultiOutputGP,
    fit_GP_MAP,
    gKDR,
)
from mogp_tpu.models.priors import GPPriors
from mogp_tpu.uq.validation import mahalanobis, pivoted_errors, standard_errors


# -- experimental designs ----------------------------------------------------

def test_monte_carlo_design():
    np.random.seed(0)
    ed = MonteCarloDesign(3)
    s = ed.sample(50)
    assert s.shape == (50, 3)
    assert np.all(s >= 0) and np.all(s <= 1)


def test_lhc_stratification():
    np.random.seed(1)
    ed = LatinHypercubeDesign(2)
    s = ed.sample(10)
    # LHC property: one sample per decile per dimension
    for d in range(2):
        strata = np.floor(s[:, d] * 10).astype(int)
        assert sorted(strata) == list(range(10))


def test_design_bounds_and_ppf():
    np.random.seed(2)
    ed = LatinHypercubeDesign(2, (-5.0, 5.0))
    s = ed.sample(20)
    assert np.all(s >= -5) and np.all(s <= 5)

    ed2 = MonteCarloDesign([(0.0, 1.0), (10.0, 20.0)])
    s2 = ed2.sample(20)
    assert np.all(s2[:, 1] >= 10) and np.all(s2[:, 1] <= 20)

    ed3 = MonteCarloDesign(1, scipy.stats.norm(loc=3.0, scale=0.1).ppf)
    s3 = ed3.sample(200)
    assert abs(np.mean(s3) - 3.0) < 0.1


def test_maximin_beats_lhc():
    np.random.seed(3)
    mm = MaxiMinLHC(2)
    best = mm.sample(8)
    # MaxiMin sample min-distance should beat the typical single LHC draw
    np.random.seed(3)
    lhc = LatinHypercubeDesign(2)
    base_dists = [np.min(pdist(lhc.sample(8))) for _ in range(20)]
    assert np.min(pdist(best)) >= np.mean(base_dists)


def test_design_str():
    assert "Latin Hypercube" in str(LatinHypercubeDesign(2))
    with pytest.raises((TypeError, ValueError)):
        MonteCarloDesign("bogus")


# -- history matching --------------------------------------------------------

def test_history_matching_oracle():
    from mogp_tpu.models.gp import PredictResult

    means = np.array([0.0, 1.0, 2.0, 3.0])
    variances = np.array([0.25, 0.25, 0.25, 0.25])
    exp = PredictResult(mean=means, unc=variances, deriv=None)
    hm = HistoryMatching(obs=[1.0, 0.0], expectations=exp)
    I = hm.get_implausibility()
    assert_allclose(I, np.abs(1.0 - means) / 0.5)
    assert hm.get_NROY() == [0, 1, 2]
    assert hm.get_RO() == [3]


def test_history_matching_with_gp():
    np.random.seed(10)
    x = np.linspace(0, 10, 20).reshape(-1, 1)
    y = np.sin(x[:, 0])
    gp = fit_GP_MAP(GaussianProcess(x, y), n_tries=3)
    coords = np.linspace(0, 10, 40).reshape(-1, 1)
    hm = HistoryMatching(gp=gp, obs=[0.0, 1e-4], coords=coords)
    I = hm.get_implausibility()
    assert I.shape == (40,)
    nroy = hm.get_NROY()
    # points where sin(x) ~ 0 must not be ruled out
    assert np.any(np.isclose(coords[nroy, 0] % np.pi, 0.0, atol=0.5))


def test_history_matching_discrepancy_reduces_I():
    from mogp_tpu.models.gp import PredictResult

    exp = PredictResult(mean=np.array([5.0]), unc=np.array([1.0]), deriv=None)
    hm = HistoryMatching(obs=[0.0, 0.0], expectations=exp)
    I0 = hm.get_implausibility().copy()
    I1 = hm.get_implausibility(discrepancy=3.0)
    assert I1[0] < I0[0]


def test_history_matching_multioutput_rank():
    from mogp_tpu.models.gp import PredictResult

    means = np.array([[0.0, 10.0], [0.0, 0.0], [0.0, 0.0]])
    variances = np.ones((3, 2))
    exp = PredictResult(mean=means, unc=variances, deriv=None)
    hm = HistoryMatching(
        obs=[np.zeros(3), np.zeros(3)], expectations=exp
    )
    I_rank1 = hm.get_implausibility(rank=1)
    I_rank0 = hm.get_implausibility(rank=0)
    # point 1: one output is 10 sigma off; rank=1 ignores the worst
    assert I_rank0[1] == pytest.approx(10.0)
    assert I_rank1[1] == pytest.approx(0.0)


# -- validation --------------------------------------------------------------

@pytest.fixture(scope="module")
def fit_gp():
    np.random.seed(20)
    x = np.random.rand(25, 2) * 3
    y = np.sin(x[:, 0]) + np.cos(2 * x[:, 1])
    gp = GaussianProcess(x, y, nugget=1e-6,
                         priors=GPPriors(n_corr=2, nugget_type="fixed"))
    gp = fit_GP_MAP(gp, n_tries=3)
    return gp


def test_standard_errors(fit_gp):
    np.random.seed(21)
    xv = np.random.rand(10, 2) * 3
    yv = np.sin(xv[:, 0]) + np.cos(2 * xv[:, 1])
    errors, P = standard_errors(fit_gp, xv, yv)
    assert errors.shape == (10,)
    assert sorted(P.tolist()) == list(range(10))
    # manual check: errors match (mean - target)/sqrt(var) ordered by var desc
    mu, var, _ = fit_gp.predict(xv)
    expected = ((mu - yv) / np.sqrt(var))[np.argsort(var)[::-1]]
    assert_allclose(errors, expected, rtol=1e-8)


def test_pivoted_errors_and_mahalanobis(fit_gp):
    np.random.seed(22)
    xv = np.random.rand(10, 2) * 3
    yv = np.sin(xv[:, 0]) + np.cos(2 * xv[:, 1])
    errors, P = pivoted_errors(fit_gp, xv, yv)
    assert errors.shape == (10,)
    M = mahalanobis(fit_gp, xv, yv)
    assert_allclose(M, np.sum(errors**2), rtol=1e-8)
    # Mahalanobis oracle: r^T C^-1 r with full predictive covariance
    mu, cov, _ = fit_gp.predict(xv, full_cov=True)
    M_ref = (mu - yv) @ np.linalg.solve(cov, mu - yv)
    assert_allclose(M, M_ref, rtol=1e-5)
    M_scaled = mahalanobis(fit_gp, xv, yv, scaled=True)
    assert np.isfinite(M_scaled)


def test_validation_multioutput():
    np.random.seed(23)
    x = np.random.rand(20, 2)
    ys = np.stack([np.sin(3 * x[:, 0]), np.cos(3 * x[:, 1])])
    mgp = fit_GP_MAP(MultiOutputGP(x, ys), n_tries=3)
    xv = np.random.rand(6, 2)
    yv = np.stack([np.sin(3 * xv[:, 0]), np.cos(3 * xv[:, 1])])
    errs = standard_errors(mgp, xv, yv)
    assert len(errs) == 2
    M = mahalanobis(mgp, xv, yv)
    assert M.shape == (2,)


# -- gKDR --------------------------------------------------------------------

def test_gkdr_finds_active_dimension():
    """5-D input, response depends on x0 only: first gKDR direction must
    align with e0 (reference benchmark_kdr_GP setup)."""
    np.random.seed(30)
    X = np.random.rand(80, 5)
    Y = np.sin(2 * np.pi * X[:, 0])
    dr = gKDR(X, Y, K=1)
    b = dr.B[:, 0]
    assert abs(b[0]) > 0.9
    red = dr(X)
    assert red.shape == (80, 1)


def test_gkdr_callable_shapes():
    np.random.seed(31)
    X = np.random.rand(30, 4)
    Y = X[:, 1] + 0.1 * np.random.randn(30)
    dr = gKDR(X, Y, K=2)
    assert dr(X).shape == (30, 2)
    assert dr(X[0:1]).shape == (1, 2)


def test_gkdr_tune_parameters():
    np.random.seed(32)
    X = np.random.rand(40, 3)
    Y = 2 * X[:, 0] + 0.01 * np.random.randn(40)

    def train_model(x, y):
        coeffs = np.linalg.lstsq(
            np.hstack([x, np.ones((len(x), 1))]), y, rcond=None
        )[0]
        return lambda xp: np.hstack([xp, np.ones((len(xp), 1))]) @ coeffs

    dr, loss = gKDR.tune_parameters(
        X, Y, train_model, cXs=[1.0], cYs=[1.0], maxK=2,
        cross_validation_folds=3,
    )
    assert loss < 0.1
    assert dr.K in (1, 2)


# -- MICE sequential design --------------------------------------------------

def test_mice_design_runs():
    np.random.seed(40)

    def f(x):
        return np.sin(5 * x[0]) + np.cos(3 * x[1])

    ed = LatinHypercubeDesign(2)
    md = MICEDesign(ed, f, n_samples=2, n_init=6, n_cand=15)
    md.run_sequential_design()
    assert md.get_inputs().shape == (8, 2)
    assert md.get_targets().shape == (8,)
    assert md.get_current_iteration() == 8
    # chosen points must come from the candidate sets
    assert np.all(md.get_inputs() >= 0) and np.all(md.get_inputs() <= 1)


def test_mice_fast_predict_matches_direct():
    """Woodbury-corrected LOO variance vs direct refit oracle."""
    from mogp_tpu.uq.sequential_design import MICEFastGP

    np.random.seed(41)
    X = np.random.rand(12, 2)
    nugget = 0.1
    gp_fast = MICEFastGP(X, np.ones(12), nugget=nugget)
    theta = np.array([0.5, -0.3, 0.2])
    gp_fast.fit(theta)

    all_vars = gp_fast.fast_predict_all()
    for idx in [0, 5, 11]:
        # direct oracle: fit GP on all-but-idx, predict variance at idx
        mask = np.arange(12) != idx
        gp_ref = GaussianProcess(
            X[mask], np.ones(11), nugget=nugget,
            priors=GPPriors(n_corr=2, nugget_type="fixed"),
        )
        gp_ref.fit(theta)
        _, var_ref, _ = gp_ref.predict(X[idx])
        assert_allclose(all_vars[idx], var_ref[0], rtol=1e-6)
        assert_allclose(gp_fast.fast_predict(idx), var_ref[0], rtol=1e-6)


def test_sequential_design_save_load(tmp_path):
    np.random.seed(42)
    ed = LatinHypercubeDesign(2)
    md = MICEDesign(ed, n_init=5, n_cand=10)
    md.generate_initial_design()
    md.set_initial_targets(np.arange(5.0))
    fname = str(tmp_path / "design.npz")
    md.save_design(fname)

    md2 = MICEDesign(LatinHypercubeDesign(2), n_init=5, n_cand=10)
    md2.load_design(fname)
    assert_allclose(md2.get_inputs(), md.get_inputs())
    assert_allclose(md2.get_targets(), md.get_targets())
    assert md2.get_current_iteration() == 5
    assert md2.initialized


def test_batch_points():
    np.random.seed(43)

    def f(x):
        return float(np.sum(x**2))

    ed = LatinHypercubeDesign(2)
    md = MICEDesign(ed, f, n_init=5, n_cand=10)
    md.run_initial_design()
    batch = md.get_batch_points(2)
    assert batch.shape == (2, 2)
    md.set_batch_targets(np.array([f(b) for b in batch]))
    assert md.get_current_iteration() == 7


# -- SMC history matching ----------------------------------------------------

def test_smc_history_match_concentrates_on_nroy():
    """Paraboloid target with obs=1: NROY is the ring r~1; SMC particles
    must concentrate there."""
    from mogp_tpu.uq.smc import smc_history_match

    np.random.seed(11)
    x = np.random.rand(40, 2) * 4 - 2
    y = x[:, 0] ** 2 + x[:, 1] ** 2
    gp = fit_GP_MAP(GaussianProcess(x, y, nugget=1e-6), n_tries=10)

    res = smc_history_match(
        gp, obs=[1.0, 0.01], bounds=[[-2, 2], [-2, 2]],
        n_particles=1024, n_stages=6, n_mcmc=3, seed=0,
    )
    r = np.sqrt(np.sum(res.particles**2, axis=1))
    assert res.nroy_fraction > 0.95
    assert abs(r.mean() - 1.0) < 0.1
    assert r.std() < 0.2
    # thresholds anneal down to the target
    assert res.thresholds[-1] == pytest.approx(3.0)


def test_smc_checkpoint_resume_identity(tmp_path, monkeypatch):
    """Segmented checkpointed SMC == single-program SMC, and a run
    preempted mid-anneal resumes to the identical final population."""
    from mogp_tpu.uq.smc import smc_history_match
    from mogp_tpu.utils import checkpoint as ckpt_mod

    np.random.seed(11)
    x = np.random.rand(40, 2) * 4 - 2
    y = x[:, 0] ** 2 + x[:, 1] ** 2
    gp = fit_GP_MAP(GaussianProcess(x, y, nugget=1e-6), n_tries=10)
    kwargs = dict(
        obs=[1.0, 0.01], bounds=[[-2, 2], [-2, 2]],
        n_particles=256, n_stages=5, n_mcmc=2, seed=3,
    )

    res_single = smc_history_match(gp, **kwargs)
    p = str(tmp_path / "smc.npz")
    res_ckpt = smc_history_match(gp, checkpoint_path=p, **kwargs)
    assert not os.path.exists(p)  # removed on completion
    np.testing.assert_allclose(
        res_ckpt.particles, res_single.particles, rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        res_ckpt.thresholds, res_single.thresholds, rtol=1e-7
    )

    # preempt after stage 2: save_smc raises AFTER persisting stage 2
    real_save = ckpt_mod.save_smc

    def failing_save(filename, state, tag=""):
        real_save(filename, state, tag=tag)
        if int(state["stage"]) == 2:
            raise RuntimeError("preempted")

    monkeypatch.setattr(ckpt_mod, "save_smc", failing_save)
    with pytest.raises(RuntimeError, match="preempted"):
        smc_history_match(gp, checkpoint_path=p, **kwargs)
    monkeypatch.setattr(ckpt_mod, "save_smc", real_save)
    assert os.path.exists(p)
    saved = ckpt_mod.load_smc(p)
    assert saved["stage"] == 2

    res_resumed = smc_history_match(gp, checkpoint_path=p, **kwargs)
    np.testing.assert_allclose(
        res_resumed.particles, res_ckpt.particles, rtol=1e-12, atol=0
    )
    np.testing.assert_allclose(res_resumed.thresholds, res_ckpt.thresholds)

    # a checkpoint from a DIFFERENT run configuration is rejected
    real_save(p, saved, tag="stale-tag")
    with pytest.warns(UserWarning, match="different run"):
        res_fresh = smc_history_match(gp, checkpoint_path=p, **kwargs)
    np.testing.assert_allclose(
        res_fresh.particles, res_ckpt.particles, rtol=1e-7, atol=1e-9
    )


def test_systematic_resample():
    import jax
    import jax.numpy as jnp
    from mogp_tpu.uq.smc import systematic_resample

    w = np.array([0.0, 0.5, 0.5, 0.0])
    idx = np.asarray(
        systematic_resample(jax.random.PRNGKey(0), jnp.asarray(w), 100)
    )
    assert set(idx.tolist()) <= {1, 2}
    counts = np.bincount(idx, minlength=4)
    assert abs(counts[1] - 50) <= 1


def test_history_matching_with_mogp():
    """Multi-output GP + coords: rank-scored implausibility over outputs."""
    np.random.seed(60)
    x = np.random.rand(25, 2)
    ys = np.stack([np.sin(4 * x[:, 0]), np.cos(4 * x[:, 1]), x[:, 0] + x[:, 1]])
    mgp = fit_GP_MAP(MultiOutputGP(x, ys), n_tries=3)
    coords = np.random.rand(50, 2)
    truth = np.array([0.0, 1.0, 1.0])
    hm = HistoryMatching(
        gp=mgp, coords=coords, obs=[truth, np.full(3, 1e-2)]
    )
    I = hm.get_implausibility()
    assert I.shape == (50,)
    assert np.all(np.isfinite(I))
    nroy = hm.get_NROY()
    ro = hm.get_RO()
    assert sorted(nroy + ro) == list(range(50))


def test_sequential_design_custom_metric():
    """Subclassing SequentialDesign with a custom metric (the extension
    point the reference documents, SequentialDesign.py:34-39)."""
    from mogp_tpu.uq.sequential_design import SequentialDesign

    class GreedyFarthest(SequentialDesign):
        def _eval_metric(self):
            from scipy.spatial.distance import cdist

            d = cdist(self.candidates, self.inputs).min(axis=1)
            return int(np.argmax(d))

    np.random.seed(61)
    sd = GreedyFarthest(
        LatinHypercubeDesign(2), lambda x: float(x.sum()), n_init=4, n_cand=20
    )
    sd.run_initial_design()
    for _ in range(3):
        sd.run_next_point()
    assert sd.get_inputs().shape == (7, 2)
    assert sd.get_targets().shape == (7,)


def test_smc_multioutput():
    """Multi-output SMC: two paraboloid-family outputs; the NROY set is
    the intersection ring."""
    from mogp_tpu.uq.smc import smc_history_match

    np.random.seed(12)
    x = np.random.rand(50, 2) * 4 - 2
    ys = np.stack([
        x[:, 0] ** 2 + x[:, 1] ** 2,
        (x[:, 0] - 0.2) ** 2 + x[:, 1] ** 2,
    ])
    mgp = fit_GP_MAP(MultiOutputGP(x, ys, nugget=1e-6), n_tries=8)
    res = smc_history_match(
        mgp, obs=[np.array([1.0, 1.0]), np.array([0.01, 0.01])],
        bounds=[[-2, 2], [-2, 2]], n_particles=512, n_stages=6,
        n_mcmc=2, rank=0, seed=0,
    )
    assert res.particles.shape == (512, 2)
    assert res.nroy_fraction > 0.8
    r = np.sqrt(np.sum(res.particles**2, axis=1))
    assert abs(r.mean() - 1.0) < 0.2


def test_validation_oracles(fit_gp):
    """Validation quantities against direct numpy computation
    (reference semantics, validation.py:8-441)."""
    rng2 = np.random.RandomState(17)
    xv = rng2.uniform(size=(9, 2))
    yv = np.sin(3 * xv[:, 0]) + xv[:, 1] ** 2

    mu, var, _ = fit_gp.predict(xv)
    errors, order = standard_errors(fit_gp, xv, yv)
    # standard errors are (y - mu)/sqrt(var), ordered by decreasing var
    expect_order = np.argsort(-np.asarray(var))
    np.testing.assert_array_equal(order, expect_order)
    # reference sign convention: (mean - target)/sqrt(var),
    # validation.py StandardErrors.__call__
    np.testing.assert_allclose(
        errors, ((mu - yv) / np.sqrt(var))[expect_order], rtol=1e-8
    )

    # mahalanobis == full quadratic form with the predictive covariance
    mu_f, cov, _ = fit_gp.predict(xv, full_cov=True)
    M = mahalanobis(fit_gp, xv, yv)
    expect_M = float((yv - mu_f) @ np.linalg.solve(cov, yv - mu_f))
    np.testing.assert_allclose(M, expect_M, rtol=1e-6)

    # ... and equals the sum of squared pivoted errors
    perr, _ = pivoted_errors(fit_gp, xv, yv)
    np.testing.assert_allclose(np.sum(np.asarray(perr) ** 2), expect_M,
                               rtol=1e-6)


def test_mahal_dist_mean(fit_gp):
    """The reference scaled-F distribution has mean == n_valid points
    (validation.py:98-130)."""
    from mogp_tpu.uq.validation import generate_mahal_dist

    rng2 = np.random.RandomState(23)
    xv = rng2.uniform(size=(11, 2))
    dist = generate_mahal_dist(fit_gp, xv)
    assert abs(dist.mean() - 11.0) / 11.0 < 0.35
