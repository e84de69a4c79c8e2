"""GP mean-function linear algebra helpers.

Pure-function equivalents of ``mogp_emulator/linalg/linalg_utils.py`` for
the marginalized-mean GP math.  Only the forward computations are needed:
``calc_A_deriv`` / ``logdet_deriv`` (``linalg_utils.py:42,170``) have no
counterpart here because gradients come from ``jax.grad`` of the
log-posterior.
"""

import jax.numpy as jnp

from .cholesky import ChoFactor, fixed_cholesky

__all__ = ["calc_Ainv", "calc_mean_params", "calc_R"]


def calc_Ainv(Kinv, dm, mean_priors):
    """Factorize ``A = H^T K^-1 H + B^-1`` (``linalg_utils.py:5-40``).

    :param Kinv: factor of the covariance (``ChoFactor`` or
                 ``PivotedChoFactor``).
    :param dm: design matrix ``H``, shape ``(n, M)``.
    :param mean_priors: ``MeanPriors`` object supplying ``B^-1``.
    :returns: ``ChoFactor`` of ``A`` (zero-size if ``M == 0``).
    """
    A = jnp.dot(dm.T, Kinv.solve(dm)) + mean_priors.inv_cov()
    return ChoFactor(fixed_cholesky(A))


def calc_mean_params(Ainv, Kinv_t, dm, mean_priors):
    """Analytical mean solution ``beta_hat = A^-1 (H^T K^-1 y + B^-1 b)``
    (``linalg_utils.py:96-130``)."""
    return Ainv.solve(jnp.dot(dm.T, Kinv_t) + mean_priors.inv_cov_b())


def calc_R(Kinv_Ktest, dm, dmtest):
    """Prediction correction matrix ``R = H*^T - H^T K^-1 K*``
    (``linalg_utils.py:132-168``)."""
    return dmtest.T - jnp.dot(dm.T, Kinv_Ktest)
