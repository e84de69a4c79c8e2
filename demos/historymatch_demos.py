"""History-matching demos (analogue of reference ``demos/historymatch_demos.py``).

1D and 2D calibration examples: implausibility, NROY/RO splits, and the
SMC sampler for direct NROY sampling.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import mogp_tpu
from mogp_tpu.uq.smc import smc_history_match


def main():
    np.random.seed(47)

    # --- 1D example: where does sin match an observation? -------------------
    x = np.array([[0.0], [10.0], [20.0], [30.0], [43.0], [50.0]])
    y = np.sin(2 * np.pi * x[:, 0] / 50.0)
    gp = mogp_tpu.fit_GP_MAP(mogp_tpu.GaussianProcess(x, y), n_tries=10)

    coords = np.linspace(0, 50, 500).reshape(-1, 1)
    hm = mogp_tpu.HistoryMatching(gp=gp, obs=[-0.8, 0.0004], coords=coords)
    I = hm.get_implausibility()
    nroy = hm.get_NROY()
    print("1D: {} of 500 points NROY; min implausibility {:.2f}".format(
        len(nroy), I.min()))

    # --- 2D example with explicit expectations ------------------------------
    x2 = np.random.rand(50, 2) * 4 - 2
    y2 = np.exp(-(x2[:, 0] ** 2 + (x2[:, 1] - 0.5) ** 2))
    gp2 = mogp_tpu.fit_GP_MAP(
        mogp_tpu.GaussianProcess(x2, y2, nugget=1e-8), n_tries=10
    )
    grid = np.stack(
        np.meshgrid(np.linspace(-2, 2, 80), np.linspace(-2, 2, 80)), -1
    ).reshape(-1, 2)
    expectations = gp2.predict(grid)
    hm2 = mogp_tpu.HistoryMatching(obs=[0.5, 1e-4], expectations=expectations)
    nroy2 = hm2.get_NROY()
    print("2D: NROY fraction {:.3f}".format(len(nroy2) / len(grid)))

    # --- SMC alternative: sample the NROY region directly --------------------
    smc = smc_history_match(
        gp2, obs=[0.5, 1e-4], bounds=[[-2, 2], [-2, 2]],
        n_particles=2048, n_stages=8, seed=0,
    )
    print("SMC NROY fraction {:.3f}; particle spread {}".format(
        smc.nroy_fraction, np.round(smc.particles.std(axis=0), 3)))


if __name__ == "__main__":
    main()
