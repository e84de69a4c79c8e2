"""Pallas kernel parity tests (interpret mode on CPU; the same kernels
compile natively on TPU)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax.numpy as jnp

from mogp_tpu.ops.kernels import mat52, sqexp, squared_distance
from mogp_tpu.ops.pallas_kernels import pallas_kernel_matrix

rng = np.random.RandomState(0)


@pytest.mark.parametrize("base,fn", [("sqexp", sqexp), ("mat52", mat52)])
@pytest.mark.parametrize("shape", [(50, 37, 3), (130, 200, 14), (5, 5, 1)])
def test_pallas_kernel_matrix_matches_reference(base, fn, shape):
    n, m, D = shape
    z1 = jnp.asarray(rng.rand(n, D))
    z2 = jnp.asarray(rng.rand(m, D))
    K = np.asarray(pallas_kernel_matrix(z1, z2, base=base, interpret=True))
    Kref = np.asarray(fn(squared_distance(z1, z2, jnp.ones(D))))
    assert K.shape == (n, m)
    assert_allclose(K, Kref, rtol=2e-5, atol=2e-6)


def test_pallas_kernel_diag_one():
    z = jnp.asarray(rng.rand(20, 4))
    K = np.asarray(pallas_kernel_matrix(z, z, base="mat52", interpret=True))
    assert_allclose(np.diag(K), 1.0, atol=1e-6)


def test_pallas_batched_cholesky_interpret():
    import numpy as np

    rng2 = np.random.RandomState(5)
    A = rng2.randn(4, 40, 40).astype(np.float32)
    A = A @ np.transpose(A, (0, 2, 1)) + 40 * np.eye(40, dtype=np.float32)
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    from pallas_cholesky_experiment import cholesky_batched

    L = np.asarray(cholesky_batched(jnp.asarray(A), interpret=True))
    assert_allclose(L, np.linalg.cholesky(A), atol=2e-4)
    # non-PD lane NaNs without contaminating others
    A_bad = A.copy()
    A_bad[1] = -np.eye(40)
    Lb = np.asarray(cholesky_batched(jnp.asarray(A_bad), interpret=True))
    assert np.isnan(Lb[1]).any()
    assert np.isfinite(Lb[[0, 2, 3]]).all()


def test_kernel_f_predict_matches_kernel_f():
    """The production predict-path dispatch (kernel_f_predict) equals
    kernel_f for every supported family; pallas path checked in
    interpret mode."""
    from mogp_tpu.ops.kernels import (
        Matern52,
        ProductMat52,
        SquaredExponential,
        UniformSqExp,
    )
    from mogp_tpu.ops.pallas_kernels import pallas_kernel_matrix

    rng = np.random.RandomState(3)
    x1 = rng.uniform(size=(9, 4))
    x2 = rng.uniform(size=(7, 4))
    for kernel in (SquaredExponential(), Matern52(), UniformSqExp(),
                   ProductMat52()):
        p = rng.uniform(-0.5, 0.5,
                        size=1 if kernel.form == "uniform" else 4)
        np.testing.assert_allclose(
            np.asarray(kernel.kernel_f_predict(x1, x2, p)),
            np.asarray(kernel.kernel_f(x1, x2, p)),
            rtol=1e-10, atol=1e-12,
        )
    # the pallas kernel itself (interpret mode) against the jnp value
    theta = rng.uniform(-0.5, 0.5, size=4)
    scale = np.sqrt(np.exp(theta))
    for base, kern in (("sqexp", SquaredExponential()), ("mat52", Matern52())):
        got = np.asarray(pallas_kernel_matrix(
            jnp.asarray(x1 * scale), jnp.asarray(x2 * scale),
            base=base, interpret=True,
        ))
        np.testing.assert_allclose(
            got, np.asarray(kern.kernel_f(x1, x2, theta)),
            rtol=1e-6, atol=1e-8,
        )
