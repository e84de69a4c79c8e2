"""Hyperparameter coordinate transforms.

The framework stores GP hyperparameters as an unconstrained raw vector
``theta`` and maps it to the interpretable (constrained) values:

* correlation length ``l = exp(-theta/2)``   (reference:
  ``mogp_emulator/GPParams.py:34-80`` ``CorrTransform``)
* covariance / nugget ``sigma2 = exp(theta)`` (reference:
  ``mogp_emulator/GPParams.py:82-161`` ``CovTransform``)

Unlike the reference, derivative helpers (``dscaled_draw`` etc.) are not
needed: everything downstream is differentiated with ``jax.grad``.
"""

import jax.numpy as jnp

__all__ = ["CorrTransform", "CovTransform"]


class CorrTransform:
    """raw <-> correlation length: ``l = exp(-0.5 * theta)``."""

    @staticmethod
    def transform(raw):
        return jnp.exp(-0.5 * raw)

    @staticmethod
    def inv_transform(scaled):
        return -2.0 * jnp.log(scaled)


class CovTransform:
    """raw <-> covariance / nugget: ``sigma2 = exp(theta)``."""

    @staticmethod
    def transform(raw):
        return jnp.exp(raw)

    @staticmethod
    def inv_transform(scaled):
        return jnp.log(scaled)
