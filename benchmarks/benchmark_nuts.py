"""NUTS throughput benchmark: ESS/sec for GP hyperparameter posteriors.

The framework's second headline metric (BASELINE.json): effective
samples per second for the hyperparameter posterior of a tsunami-scale
GP, with chains vmapped (and shardable over a mesh).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import mogp_tpu
from mogp_tpu.models.inference import sample_GP_MCMC
from mogp_tpu.utils.metrics import ess_per_sec


def main():
    rng = np.random.RandomState(0)
    n, D = 210, 14
    inputs = rng.uniform(0, 1, size=(n, D))
    targets = np.sin(3 * inputs[:, 0]) + inputs[:, 1] ** 2 + 0.1 * inputs.sum(1)

    gp = mogp_tpu.fit_GP_MAP(
        mogp_tpu.GaussianProcess(inputs, targets, nugget="fit"), n_tries=5
    )
    print("MAP found, logpost = {:.2f}".format(gp.current_logpost))

    n_chains, n_samples, n_warmup = 8, 300, 300
    # warmup run compiles the program
    sample_GP_MCMC(gp, n_samples=10, n_warmup=10, n_chains=n_chains,
                   theta0=gp.theta.get_data(), seed=0)

    t0 = time.perf_counter()
    res = sample_GP_MCMC(
        gp, n_samples=n_samples, n_warmup=n_warmup, n_chains=n_chains,
        theta0=gp.theta.get_data(), seed=1,
    )
    dt = time.perf_counter() - t0

    total = n_chains * n_samples
    print("chains={} samples={} warmup={}: {:.1f}s".format(
        n_chains, n_samples, n_warmup, dt))
    print("R-hat: {}".format(np.round(res.rhat, 3)))
    print("ESS:   {}".format(np.round(res.ess, 0)))
    print("raw samples/s: {:.1f}".format(total / dt))
    print("min-ESS/s:     {:.2f}".format(ess_per_sec(res.ess, dt)))
    print("divergences:   {}".format(int(res.diverging.sum())))


if __name__ == "__main__":
    main()
