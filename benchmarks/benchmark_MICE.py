"""MICE sequential design vs one-shot LHC (Branin-2D).

Analogue of reference ``benchmarks/benchmark_MICE.py``: for equal total
budgets, a MICE-designed GP should match or beat an LHC-designed GP.
"""

import numpy as np

from common import branin, print_table

import mogp_tpu


def main():
    np.random.seed(74294)
    bounds = [(-5.0, 10.0), (0.0, 15.0)]
    lhd = mogp_tpu.LatinHypercubeDesign(bounds)
    x_test = lhd.sample(200)
    y_test = branin(x_test)

    def f(x):
        return branin(np.atleast_2d(x))[0]

    rows = []
    for n_total in [16, 24]:
        # one-shot LHC
        x_lhc = lhd.sample(n_total)
        y_lhc = branin(x_lhc)
        gp_lhc = mogp_tpu.fit_GP_MAP(
            mogp_tpu.GaussianProcess(x_lhc, y_lhc), n_tries=5
        )
        rmse_lhc = float(
            np.sqrt(np.mean((gp_lhc.predict(x_test)[0] - y_test) ** 2))
        )

        # MICE: half the budget as init, half sequential
        md = mogp_tpu.MICEDesign(
            mogp_tpu.LatinHypercubeDesign(bounds),
            f,
            n_samples=n_total // 2,
            n_init=n_total - n_total // 2,
            n_cand=50,
        )
        md.run_sequential_design()
        gp_mice = mogp_tpu.fit_GP_MAP(
            mogp_tpu.GaussianProcess(md.get_inputs(), md.get_targets()),
            n_tries=5,
        )
        rmse_mice = float(
            np.sqrt(np.mean((gp_mice.predict(x_test)[0] - y_test) ** 2))
        )
        rows.append([n_total, rmse_lhc, rmse_mice])
        print("n={}: LHC rmse={:.4g}  MICE rmse={:.4g}".format(
            n_total, rmse_lhc, rmse_mice))

    print()
    print_table(["n_total", "rmse_lhc", "rmse_mice"], rows)


if __name__ == "__main__":
    main()
