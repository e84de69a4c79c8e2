"""Hand-valued kernel oracles and derivative/Hessian grids.

Deep L1 math coverage in the reference's style (``tests/test_Kernel.py``
uses exact hand-derived values and FD sweeps): every concrete kernel
family is checked against scalar arithmetic written out independently in
the test, Hessians are checked against finite differences of the
gradient over the full (i, j) grid, and structural properties (symmetry,
PSD, family consistency) are asserted.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from mogp_tpu.ops.kernels import (
    Matern52,
    ProductMat52,
    SquaredExponential,
    UniformMat52,
    UniformSqExp,
)

ALL_KERNELS = [
    SquaredExponential(),
    Matern52(),
    UniformSqExp(),
    UniformMat52(),
    ProductMat52(),
]


def n_params_for(kernel, D=2):
    return 1 if kernel.form == "uniform" else D


# -- hand-valued single-pair cases -----------------------------------------
# x1 = (1, 2), x2 = (0, 0), theta = (0, log 4) => exp(theta) = (1, 4)
# r2 = 1*(1-0)^2 + 4*(2-0)^2 = 17
X1P = np.array([[1.0, 2.0]])
X2P = np.array([[0.0, 0.0]])
THETA = np.array([0.0, np.log(4.0)])


def test_sqexp_hand_value():
    K = np.asarray(SquaredExponential().kernel_f(X1P, X2P, THETA))
    assert_allclose(K[0, 0], np.exp(-0.5 * 17.0), rtol=1e-12)


def test_mat52_hand_value():
    r = np.sqrt(5.0 * 17.0)
    expect = (1.0 + r + 5.0 * 17.0 / 3.0) * np.exp(-r)
    K = np.asarray(Matern52().kernel_f(X1P, X2P, THETA))
    assert_allclose(K[0, 0], expect, rtol=1e-12)


def test_uniform_sqexp_hand_value():
    # uniform: one shared theta=log(2) => r2 = 2*(1 + 4) = 10
    K = np.asarray(UniformSqExp().kernel_f(X1P, X2P, np.array([np.log(2.0)])))
    assert_allclose(K[0, 0], np.exp(-5.0), rtol=1e-12)


def test_uniform_mat52_hand_value():
    r2 = 2.0 * 5.0
    r = np.sqrt(5.0 * r2)
    expect = (1.0 + r + 5.0 * r2 / 3.0) * np.exp(-r)
    K = np.asarray(UniformMat52().kernel_f(X1P, X2P, np.array([np.log(2.0)])))
    assert_allclose(K[0, 0], expect, rtol=1e-12)


def test_product_mat52_hand_value():
    # per-dim r2: (1*1, 4*4) = (1, 16); product of 1-D Matern-5/2 values
    def m52(r2):
        r = np.sqrt(5.0 * r2)
        return (1.0 + r + 5.0 * r2 / 3.0) * np.exp(-r)

    K = np.asarray(ProductMat52().kernel_f(X1P, X2P, THETA))
    assert_allclose(K[0, 0], m52(1.0) * m52(16.0), rtol=1e-12)


def test_sqexp_deriv_hand_value():
    """d/dtheta_d exp(-r2/2) = -0.5 * exp(theta_d) (x1_d-x2_d)^2 * K."""
    K = np.exp(-0.5 * 17.0)
    expect = np.array([-0.5 * 1.0 * 1.0 * K, -0.5 * 4.0 * 4.0 * K])
    deriv = np.asarray(SquaredExponential().kernel_deriv(X1P, X2P, THETA))
    assert_allclose(deriv[:, 0, 0], expect, rtol=1e-10)


# -- derivative / Hessian FD grids -----------------------------------------

rng = np.random.RandomState(99)
XA = rng.uniform(-1.5, 1.5, size=(6, 2))
XB = rng.uniform(-1.5, 1.5, size=(4, 2))


@pytest.mark.parametrize("kernel", ALL_KERNELS, ids=str)
def test_kernel_deriv_fd_grid(kernel):
    params = rng.uniform(-0.7, 0.7, size=n_params_for(kernel))
    deriv = np.asarray(kernel.kernel_deriv(XA, XB, params))
    eps = 1e-6
    for i in range(len(params)):
        pp, pm = params.copy(), params.copy()
        pp[i] += eps
        pm[i] -= eps
        fd = (
            np.asarray(kernel.kernel_f(XA, XB, pp))
            - np.asarray(kernel.kernel_f(XA, XB, pm))
        ) / (2 * eps)
        assert_allclose(deriv[i], fd, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("kernel", ALL_KERNELS, ids=str)
def test_kernel_hessian_fd_grid(kernel):
    """Hessian[i, j] vs central FD of kernel_deriv[j] wrt param i."""
    params = rng.uniform(-0.5, 0.5, size=n_params_for(kernel))
    P = len(params)
    hess = np.asarray(kernel.kernel_hessian(XA, XB, params))
    assert hess.shape == (P, P, len(XA), len(XB))
    eps = 1e-5
    for i in range(P):
        pp, pm = params.copy(), params.copy()
        pp[i] += eps
        pm[i] -= eps
        fd = (
            np.asarray(kernel.kernel_deriv(XA, XB, pp))
            - np.asarray(kernel.kernel_deriv(XA, XB, pm))
        ) / (2 * eps)
        for j in range(P):
            assert_allclose(hess[i, j], fd[j], rtol=5e-4, atol=5e-6)
    # symmetry in (i, j)
    assert_allclose(hess, np.swapaxes(hess, 0, 1), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("kernel", ALL_KERNELS, ids=str)
def test_kernel_symmetry_and_psd(kernel):
    params = rng.uniform(-0.5, 0.5, size=n_params_for(kernel))
    K = np.asarray(kernel.kernel_f(XA, XA, params))
    assert_allclose(K, K.T, rtol=1e-10, atol=1e-12)
    evals = np.linalg.eigvalsh(K)
    assert evals.min() > -1e-9
    assert_allclose(np.diag(K), 1.0, rtol=1e-10)
    assert np.all(K <= 1.0 + 1e-12)


@pytest.mark.parametrize("kernel", ALL_KERNELS, ids=str)
def test_kernel_hessian_finite_at_zero_distance(kernel):
    params = rng.uniform(-0.5, 0.5, size=n_params_for(kernel))
    hess = np.asarray(kernel.kernel_hessian(XA, XA, params))
    assert np.all(np.isfinite(hess))


def test_uniform_equals_perdim_with_tied_params():
    """Uniform kernels = per-dim kernels with all lengths tied."""
    theta = 0.3
    tied = np.array([theta, theta])
    assert_allclose(
        np.asarray(UniformSqExp().kernel_f(XA, XB, np.array([theta]))),
        np.asarray(SquaredExponential().kernel_f(XA, XB, tied)),
        rtol=1e-12,
    )
    assert_allclose(
        np.asarray(UniformMat52().kernel_f(XA, XB, np.array([theta]))),
        np.asarray(Matern52().kernel_f(XA, XB, tied)),
        rtol=1e-12,
    )


def test_product_equals_standard_in_1d():
    """In 1-D the product kernel reduces to the standard Matern-5/2."""
    x1 = rng.uniform(size=(5, 1))
    x2 = rng.uniform(size=(3, 1))
    p = np.array([0.4])
    assert_allclose(
        np.asarray(ProductMat52().kernel_f(x1, x2, p)),
        np.asarray(Matern52().kernel_f(x1, x2, p)),
        rtol=1e-10,
    )


def test_kernel_limits():
    """K -> 0 at large distance, K -> 1 at zero distance."""
    far = np.array([[100.0, -100.0]])
    for kernel in ALL_KERNELS:
        params = np.zeros(n_params_for(kernel))
        K = np.asarray(kernel.kernel_f(X1P, far, params))
        assert K[0, 0] < 1e-10
        K0 = np.asarray(kernel.kernel_f(X1P, X1P, params))
        assert_allclose(K0[0, 0], 1.0, rtol=1e-12)


def test_mat52_once_differentiable_in_r2_scale():
    """Matern-5/2 sample paths: kernel value strictly decreasing in r2."""
    r2s = np.linspace(0.0, 10.0, 50)
    x1 = np.zeros((1, 1))
    vals = [
        float(np.asarray(Matern52().kernel_f(x1, np.array([[np.sqrt(r2)]]),
                                             np.zeros(1)))[0, 0])
        for r2 in r2s
    ]
    assert all(a > b for a, b in zip(vals, vals[1:]))
