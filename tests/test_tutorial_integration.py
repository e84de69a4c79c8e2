"""End-to-end integration test: the full tutorial UQ workflow.

A fast version of ``demos/tutorial.py`` (design -> simulate -> fit ->
validate -> history-match -> NUTS -> SMC), asserting statistical sanity
at each stage.  This is the framework's minimum end-to-end slice
(SURVEY §7 step 4).
"""

import numpy as np
import pytest

import mogp_tpu
from mogp_tpu.models.inference import sample_GP_MCMC
from mogp_tpu.uq.smc import smc_history_match
from mogp_tpu.uq.validation import mahalanobis, standard_errors


def simulator(x):
    return float(np.exp(-x[0] ** 2) * np.sin(3 * x[1]) + 0.5 * x[1])


def test_full_tutorial_flow():
    np.random.seed(77)
    bounds = [(-2.0, 2.0), (0.0, 3.0)]

    # 1. design + simulate
    lhd = mogp_tpu.LatinHypercubeDesign(bounds)
    inputs = lhd.sample(35)
    targets = np.array([simulator(p) for p in inputs])

    # 2. fit
    gp = mogp_tpu.GaussianProcess(inputs, targets, nugget="fit")
    gp = mogp_tpu.fit_GP_MAP(gp, n_tries=5)
    assert np.isfinite(gp.current_logpost)

    # 3. validate: held-out errors should be mostly within a few sigma
    xv = lhd.sample(12)
    yv = np.array([simulator(p) for p in xv])
    errors, order = standard_errors(gp, xv, yv)
    assert np.mean(np.abs(errors) < 4.0) > 0.7
    M = mahalanobis(gp, xv, yv)
    assert np.isfinite(M) and M >= 0.0

    # 4. history matching: truth points must survive
    obs_point = np.array([0.3, 1.2])
    obs_value = simulator(obs_point)
    query = lhd.sample(2000)
    query = np.vstack([query, obs_point])
    hm = mogp_tpu.HistoryMatching(
        gp=gp, coords=query, obs=[obs_value, 1e-4]
    )
    nroy = hm.get_NROY()
    assert len(nroy) > 0
    assert len(query) - 1 in nroy or hm.I[-1] < 4.0  # the truth survives

    # 5. full posterior: chains mix
    mcmc = sample_GP_MCMC(
        gp, n_samples=100, n_warmup=150, n_chains=2,
        theta0=gp.theta.get_data(), seed=0,
    )
    assert np.all(np.isfinite(mcmc.samples))
    assert np.all(mcmc.rhat < 1.5)

    # 6. SMC concentrates on consistent inputs
    smc = smc_history_match(
        gp, obs=[obs_value, 1e-4], bounds=bounds,
        n_particles=512, n_stages=5, n_mcmc=2, seed=1,
    )
    assert smc.nroy_fraction > 0.8
    # the SMC particles should predict values close to the observation
    mu, _, _ = gp.predict(smc.particles[:200])
    assert np.mean(np.abs(mu - obs_value) < 0.3) > 0.8
