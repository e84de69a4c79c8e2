"""Kernel and mean-function demos (analogue of reference
``demos/gp_demos.py`` / ``demos/gp_kernel_demos.py``).

Fits the same data with each kernel family and several mean-function
specifications, comparing log posteriors and held-out accuracy.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import mogp_tpu


def main():
    np.random.seed(6)
    x = np.random.rand(40, 2) * 3
    y = 2.0 + x[:, 0] + np.sin(2 * x[:, 1])
    x_test = np.random.rand(50, 2) * 3
    y_test = 2.0 + x_test[:, 0] + np.sin(2 * x_test[:, 1])

    print("{:<22} {:>12} {:>10}".format("kernel", "logpost", "rmse"))
    for kernel in [
        "SquaredExponential", "Matern52", "UniformSqExp", "UniformMat52",
        "ProductMat52",
    ]:
        gp = mogp_tpu.fit_GP_MAP(
            mogp_tpu.GaussianProcess(x, y, kernel=kernel), n_tries=5
        )
        mean, _, _ = gp.predict(x_test)
        print("{:<22} {:>12.3f} {:>10.4g}".format(
            kernel, gp.current_logpost,
            np.sqrt(np.mean((mean - y_test) ** 2))))

    print()
    print("{:<22} {:>8} {:>10}".format("mean function", "n_mean", "rmse"))
    for mean_spec in [None, "1", "x[0]", "x[0] + x[1]", "x[0] + I(x[1]**2)"]:
        gp = mogp_tpu.fit_GP_MAP(
            mogp_tpu.GaussianProcess(x, y, mean=mean_spec), n_tries=5
        )
        pred, _, _ = gp.predict(x_test)
        print("{:<22} {:>8} {:>10.4g}".format(
            str(mean_spec), gp.n_mean,
            np.sqrt(np.mean((pred - y_test) ** 2))))


if __name__ == "__main__":
    main()
