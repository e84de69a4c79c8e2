"""Global configuration for the TPU-native GP emulation framework.

Dtype policy (see /root/reference/mogp_gpu/src/types.hpp:13 for the
reference's fp64-everywhere stance): TPUs execute fp64 in software, so the
framework is dtype-polymorphic.  All core functions follow the dtype of
their array inputs; ``default_dtype()`` picks float64 when JAX x64 mode is
enabled (CPU parity testing) and float32 otherwise (TPU production).
Matmul-heavy inner ops request ``preferred_element_type=float32`` so the
MXU accumulates at full fp32 even if inputs are cast down.
"""

import os

import jax
import jax.numpy as jnp

__all__ = [
    "default_dtype",
    "is_tpu",
    "use_pallas",
]


def default_dtype():
    """Return the default floating dtype for newly-created arrays.

    float64 when ``jax_enable_x64`` is on (used by the CPU parity test
    suite), float32 otherwise (the TPU production configuration).
    """
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def is_tpu() -> bool:
    """True when the default JAX backend is a TPU."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:  # pragma: no cover - no backend available
        return False


def use_pallas() -> bool:
    """Whether to use Pallas kernels for the hot ops.

    Pallas TPU kernels are only compiled on TPU backends; elsewhere the
    jnp reference implementations (same API) are used.  Can be forced off
    with the environment variable ``MOGP_TPU_DISABLE_PALLAS=1``.
    """
    if os.environ.get("MOGP_TPU_DISABLE_PALLAS", "0") == "1":
        return False
    return is_tpu()
