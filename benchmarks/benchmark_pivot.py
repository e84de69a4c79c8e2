"""Pivoted Cholesky vs adaptive nugget on degenerate designs.

Analogue of reference ``benchmarks/benchmark_pivot.py``: with a
duplicated input point, both the adaptive-nugget and pivoting strategies
must produce finite, accurate emulators; pivoting should not inflate the
predictive variance the way a large adaptive nugget can.
"""

import numpy as np

from common import branin, print_table

import mogp_tpu


def main():
    np.random.seed(57849)
    lhd = mogp_tpu.LatinHypercubeDesign([(-5.0, 10.0), (0.0, 15.0)])
    x = lhd.sample(20)
    x = np.vstack([x, x[-1]])  # duplicated input -> singular K
    y = branin(x)
    x_test = lhd.sample(100)
    y_test = branin(x_test)

    rows = []
    for nugget in ["adaptive", "pivot"]:
        gp = mogp_tpu.fit_GP_MAP(
            mogp_tpu.GaussianProcess(x, y, nugget=nugget), n_tries=5
        )
        mean, var, _ = gp.predict(x_test)
        rmse = float(np.sqrt(np.mean((mean - y_test) ** 2)))
        rows.append([nugget, rmse, float(np.mean(var))])
        assert np.all(np.isfinite(mean)), "non-finite predictions"
        print("nugget={}: rmse={:.4g} mean_var={:.4g}".format(
            nugget, rmse, float(np.mean(var))))

    print()
    print_table(["nugget", "rmse", "mean_var"], rows)


if __name__ == "__main__":
    main()
