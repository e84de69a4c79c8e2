"""gKDR dimension-reduction benchmark (100-D inputs, 1 active dimension).

Analogue of reference ``benchmarks/benchmark_kdr_GP.py``: loss of a GP
fit on gKDR-reduced inputs as a function of the structural dimension;
the minimum should occur at/near the true dimension (1).
"""

import numpy as np

from common import print_table

import mogp_tpu
from mogp_tpu import gKDR


def main():
    # mirrors the reference setup (benchmark_kdr_GP.py:46-64): a LINEAR
    # 100-D -> 1-D mapping, 5 CV folds, and the (5, 5) scale-parameter
    # point of the reference's grid (where its loss curve is sharpest)
    np.random.seed(3)
    N, M = 100, 100
    X = np.random.rand(N, M)
    Y = X[:, 0].copy()  # single active dimension

    def train_model(x, y):
        gp = mogp_tpu.fit_GP_MAP(mogp_tpu.GaussianProcess(x, y), n_tries=3)
        return lambda xp: gp.predict(xp)[0]

    rows = []
    for K in [1, 2, 4]:
        loss = gKDR._compute_loss(X, Y, train_model, 5, K,
                                  X_scale=5.0, Y_scale=5.0)
        rows.append([K, float(loss)])
        print("K={}: loss={:.4g}".format(K, loss))

    print()
    print_table(["K", "L1_loss"], rows)
    best_K = min(rows, key=lambda r: r[1])[0]
    print("best structural dimension: {} (true: 1)".format(best_K))


if __name__ == "__main__":
    main()
