"""Multi-output emulation tutorial.

Analogue of the reference ``demos/multioutput_tutorial.py``: fit several
outputs of a simulator at once and predict with uncertainty.  All
outputs x restarts are fit in a single batched device program.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import mogp_tpu


def simulator(x):
    """Toy simulator with 3 outputs."""
    return np.array(
        [
            np.sin(2 * np.pi * x[0]) + x[1],
            np.cos(np.pi * x[1]) * x[0],
            x[0] ** 2 - x[1] ** 2,
        ]
    )


def main():
    np.random.seed(4)
    lhd = mogp_tpu.LatinHypercubeDesign(2)
    inputs = lhd.sample(40)
    targets = np.array([simulator(p) for p in inputs]).T  # (3, 40)

    mgp = mogp_tpu.MultiOutputGP(inputs, targets, kernel="Matern52")
    mgp = mogp_tpu.fit_GP_MAP(mgp, n_tries=10)

    print(mgp)
    for i, em in enumerate(mgp.emulators):
        print("output {}: corr = {}, sigma2 = {:.4g}".format(
            i, np.round(em.theta.corr, 3), em.theta.cov))

    test = lhd.sample(10)
    truth = np.array([simulator(p) for p in test]).T
    mean, var, _ = mgp.predict(test)
    rmse = np.sqrt(np.mean((mean - truth) ** 2, axis=1))
    print("per-output RMSE:", np.round(rmse, 4))
    print("per-output mean z-score:", np.round(
        np.mean(np.abs(mean - truth) / np.sqrt(var), axis=1), 2))


if __name__ == "__main__":
    main()
