"""Full-posterior inference demos (beyond the reference).

NUTS hyperparameter posteriors with cross-chain diagnostics, mean-field
VI, and posterior-predictive moments -- the capability upgrade over the
reference's MAP-only fitting.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import mogp_tpu
from mogp_tpu.models.inference import (
    fit_GP_VI,
    predict_MCMC,
    sample_GP_MCMC,
)


def main():
    np.random.seed(8)
    x = np.random.rand(30, 2) * 2
    y = np.sin(3 * x[:, 0]) * np.cos(2 * x[:, 1])

    gp = mogp_tpu.fit_GP_MAP(
        mogp_tpu.GaussianProcess(x, y, nugget="fit"), n_tries=10
    )
    print("MAP raw theta:", np.round(gp.theta.get_data(), 3))

    mcmc = sample_GP_MCMC(
        gp, n_samples=400, n_warmup=400, n_chains=4,
        theta0=gp.theta.get_data(),
    )
    flat = mcmc.samples.reshape(-1, gp.n_params)
    print("NUTS posterior mean:", np.round(flat.mean(axis=0), 3))
    print("NUTS posterior std: ", np.round(flat.std(axis=0), 3))
    print("R-hat:", np.round(mcmc.rhat, 3), " ESS:", np.round(mcmc.ess, 0))
    print("divergences:", int(mcmc.diverging.sum()))

    vi = fit_GP_VI(gp, n_steps=800, theta0=gp.theta.get_data())
    print("VI mean:", np.round(vi.mean, 3))
    print("VI std: ", np.round(np.exp(vi.log_std), 3))

    xt = np.random.rand(8, 2) * 2
    yt = np.sin(3 * xt[:, 0]) * np.cos(2 * xt[:, 1])
    mu_map, var_map, _ = gp.predict(xt)
    mu_post, var_post = predict_MCMC(gp, mcmc.samples, xt, thin=10)
    print("MAP  predictive z:", np.round(
        np.abs(mu_map - yt) / np.sqrt(var_map), 2))
    print("NUTS predictive z:", np.round(
        np.abs(mu_post - yt) / np.sqrt(var_post), 2))


if __name__ == "__main__":
    main()
