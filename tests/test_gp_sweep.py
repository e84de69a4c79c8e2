"""Parametrized configuration sweep (the reference's pattern:
``test_GaussianProcess.py:227,496,687`` sweeps mean/nugget configs).

Every (kernel x mean x nugget) combination must fit, produce finite
predictions with non-negative variances, and interpolate the training
data when noise-free.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from mogp_tpu import GaussianProcess, fit_GP_MAP

rng = np.random.RandomState(3)
X = rng.uniform(0, 2, size=(18, 2))
Y = np.sin(2 * X[:, 0]) + 0.5 * X[:, 1]
XT = rng.uniform(0, 2, size=(7, 2))


@pytest.mark.parametrize("kernel", ["SquaredExponential", "Matern52",
                                    "UniformSqExp", "ProductMat52"])
@pytest.mark.parametrize("mean", [None, "1", "x[0] + x[1]"])
@pytest.mark.parametrize("nugget", ["adaptive", "fit", 1e-8])
def test_config_sweep(kernel, mean, nugget):
    gp = GaussianProcess(X, Y, mean=mean, kernel=kernel, nugget=nugget)
    gp = fit_GP_MAP(gp, n_tries=2, maxiter=50)
    mu, var, _ = gp.predict(XT)
    assert np.all(np.isfinite(mu))
    assert np.all(var >= 0.0)
    # noise-free data: training points must be closely reproduced
    mu_tr, _, _ = gp.predict(X)
    assert_allclose(mu_tr, Y, atol=5e-2)
