"""gKDR dimension-reduction demo (analogue of reference ``demos/kdr_demos.py``).

A 20-D input space whose response depends on a single linear combination;
gKDR finds the active direction and a GP on the reduced space predicts
accurately.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import mogp_tpu
from mogp_tpu import gKDR


def main():
    np.random.seed(10)
    N, M = 100, 20
    X = np.random.rand(N, M)
    w = np.zeros(M)
    w[0], w[2] = 2.0, -1.0
    Y = np.tanh(X @ w) + 0.01 * np.random.randn(N)

    dr = gKDR(X, Y, K=1)
    direction = dr.B[:, 0]
    print("recovered direction (top 3 |weights|):",
          np.argsort(-np.abs(direction))[:3], "(true active: 0, 2)")

    gp = mogp_tpu.fit_GP_MAP(
        mogp_tpu.GaussianProcess(dr(X), Y), n_tries=10
    )
    X_new = np.random.rand(20, M)
    Y_new = np.tanh(X_new @ w)
    mean, _, _ = gp.predict(dr(X_new))
    print("reduced-space GP RMSE: {:.4g}".format(
        np.sqrt(np.mean((mean - Y_new) ** 2))))


if __name__ == "__main__":
    main()
