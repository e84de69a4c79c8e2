"""MICE sequential-design demo (analogue of reference ``demos/mice_demos.py``).

Runs the MICE active-learning loop on the projectile simulator and
compares the resulting emulator with one built from a one-shot LHC of
the same total budget.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import mogp_tpu
from projectile import simulator


def main():
    np.random.seed(157374)
    bounds = [(-5.0, 1.0), (0.0, 1000.0)]
    n_init, n_seq = 5, 15

    md = mogp_tpu.MICEDesign(
        mogp_tpu.LatinHypercubeDesign(bounds),
        simulator,
        n_samples=n_seq,
        n_init=n_init,
        n_cand=100,
    )
    md.run_sequential_design()
    print("MICE design complete: {} points".format(md.get_current_iteration()))

    gp_mice = mogp_tpu.fit_GP_MAP(
        mogp_tpu.GaussianProcess(md.get_inputs(), md.get_targets()), n_tries=10
    )

    lhd = mogp_tpu.LatinHypercubeDesign(bounds)
    x_lhc = lhd.sample(n_init + n_seq)
    y_lhc = np.array([simulator(p) for p in x_lhc])
    gp_lhc = mogp_tpu.fit_GP_MAP(
        mogp_tpu.GaussianProcess(x_lhc, y_lhc), n_tries=10
    )

    x_test = lhd.sample(100)
    y_test = np.array([simulator(p) for p in x_test])
    for name, gp in [("MICE", gp_mice), ("LHC", gp_lhc)]:
        mean, _, _ = gp.predict(x_test)
        print("{}: RMSE = {:.4g}".format(
            name, np.sqrt(np.mean((mean - y_test) ** 2))))


if __name__ == "__main__":
    main()
