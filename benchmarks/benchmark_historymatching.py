"""History-matching benchmark: grid sweep vs SMC on 1D and 2D problems.

Analogue of reference ``benchmarks/benchmark_historymatching.py``, with
the framework's SMC sampler as the scalable alternative to dense grids.
"""

import numpy as np

from common import print_table

import mogp_tpu
from mogp_tpu.uq.smc import smc_history_match


def main():
    np.random.seed(30)

    # 1D: f(x) = sin(2 pi x / 50), obs -0.8 +- 0.02
    x1 = np.array([[0.0], [10.0], [20.0], [30.0], [43.0], [50.0]])
    y1 = np.sin(2 * np.pi * x1[:, 0] / 50.0)
    gp1 = mogp_tpu.fit_GP_MAP(mogp_tpu.GaussianProcess(x1, y1), n_tries=5)
    coords = np.linspace(0, 50, 1000).reshape(-1, 1)
    hm = mogp_tpu.HistoryMatching(gp=gp1, obs=[-0.8, 0.0004], coords=coords)
    nroy = hm.get_NROY()
    print("1D: NROY {} / 1000 grid points".format(len(nroy)))

    # 2D: paraboloid, obs = 1
    x2 = np.random.rand(40, 2) * 4 - 2
    y2 = x2[:, 0] ** 2 + x2[:, 1] ** 2
    gp2 = mogp_tpu.fit_GP_MAP(
        mogp_tpu.GaussianProcess(x2, y2, nugget=1e-6), n_tries=5
    )

    grid = np.stack(
        np.meshgrid(np.linspace(-2, 2, 100), np.linspace(-2, 2, 100)), -1
    ).reshape(-1, 2)
    hm2 = mogp_tpu.HistoryMatching(gp=gp2, obs=[1.0, 0.01], coords=grid)
    nroy2 = hm2.get_NROY()
    grid_frac = len(nroy2) / len(grid)
    print("2D grid: NROY fraction {:.3f}".format(grid_frac))

    smc = smc_history_match(
        gp2, obs=[1.0, 0.01], bounds=[[-2, 2], [-2, 2]],
        n_particles=4096, n_stages=8, seed=0,
    )
    print(
        "2D SMC: {} particles, NROY fraction {:.3f}, spread {}"
        .format(len(smc.particles), smc.nroy_fraction,
                np.round(smc.particles.std(axis=0), 3))
    )
    assert smc.nroy_fraction > 0.9


if __name__ == "__main__":
    main()
