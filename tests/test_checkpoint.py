"""Serialization round-trip tests: pickle + npz checkpoints."""

import pickle

import numpy as np
from numpy.testing import assert_allclose

from mogp_tpu import GaussianProcess, MultiOutputGP, fit_GP_MAP
from mogp_tpu.utils.checkpoint import load_gp, load_mogp, save_gp, save_mogp

rng = np.random.RandomState(0)
X = rng.rand(20, 2)
Y = np.sin(3 * X[:, 0]) + X[:, 1]


def test_gp_pickle_roundtrip():
    gp = fit_GP_MAP(GaussianProcess(X, Y, mean="x[0]", nugget="fit"), n_tries=3)
    xt = rng.rand(5, 2)
    mu, var, _ = gp.predict(xt)

    gp2 = pickle.loads(pickle.dumps(gp))
    mu2, var2, _ = gp2.predict(xt)
    assert_allclose(mu2, mu, rtol=1e-8)
    assert_allclose(var2, var, rtol=1e-7)
    assert gp2.nugget_type == "fit"


def test_gp_pickle_unfit():
    gp = GaussianProcess(X, Y)
    gp2 = pickle.loads(pickle.dumps(gp))
    assert gp2.theta.get_data() is None


def test_gp_npz_roundtrip(tmp_path):
    gp = fit_GP_MAP(GaussianProcess(X, Y, kernel="Matern52", nugget=1e-6), n_tries=3)
    path = str(tmp_path / "gp.npz")
    save_gp(gp, path)
    gp2 = load_gp(path)
    xt = rng.rand(5, 2)
    assert_allclose(gp2.predict(xt)[0], gp.predict(xt)[0], rtol=1e-8)
    assert type(gp2.kernel).__name__ == "Matern52"


def test_mogp_npz_roundtrip(tmp_path):
    mgp = fit_GP_MAP(MultiOutputGP(X, np.stack([Y, -Y])), n_tries=2)
    path = str(tmp_path / "mogp.npz")
    save_mogp(mgp, path)
    mgp2 = load_mogp(path)
    xt = rng.rand(4, 2)
    assert_allclose(mgp2.predict(xt).mean, mgp.predict(xt).mean, rtol=1e-8)


def test_mcmc_checkpoint(tmp_path):
    from mogp_tpu.models.inference import MCMCResult
    from mogp_tpu.utils.checkpoint import load_mcmc, save_mcmc

    res = MCMCResult(
        samples=rng.randn(2, 10, 3),
        accept_prob=rng.rand(2, 10),
        diverging=np.zeros((2, 10), dtype=bool),
        rhat=np.ones(3),
        ess=np.full(3, 20.0),
    )
    path = str(tmp_path / "mcmc.npz")
    save_mcmc(res, path)
    res2 = load_mcmc(path)
    assert_allclose(res2.samples, res.samples)
    assert_allclose(res2.ess, res.ess)
