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
    "enable_compile_cache",
    "blocked_chol_min_n",
]


def enable_compile_cache(path=None):
    """Enable JAX's persistent compilation cache at ``path``.

    The batched-fit programs take minutes in the remote-compile service;
    the persistent cache makes every run after the first load them in
    seconds.  NOTE: ``JAX_COMPILATION_CACHE_DIR`` as an environment
    variable is read when jax initializes its config -- in environments
    that pre-import jax at interpreter start (sitecustomize), setting the
    env var from user code is a silent no-op.  This helper goes through
    ``jax.config.update`` so it works at any point.
    """
    path = path or os.environ.get("MOGP_TPU_COMPILE_CACHE")
    if not path:
        return
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # the fit programs are the ones worth caching, but cache everything:
    # entries are content-addressed and small next to one fit executable
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


enable_compile_cache()


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


def blocked_chol_min_n() -> int:
    """Matrix size above which the recursive blocked Cholesky/TRSMs
    (:mod:`mogp_tpu.ops.blocked`) replace the stock XLA kernels.

    Only applies on TPU backends -- on CPU, XLA calls LAPACK directly,
    which the blocked form cannot beat.  Override (including forcing the
    blocked path on CPU for testing) with ``MOGP_TPU_BLOCKED_CHOL_MIN_N``;
    0 or negative disables the blocked path entirely.
    """
    env = os.environ.get("MOGP_TPU_BLOCKED_CHOL_MIN_N")
    if env is not None:
        v = int(env)
        return v if v > 0 else 1 << 62
    # measured crossover on TPU v5e (see docs/tpu_performance.md): the
    # recursive form wins from ~512 up; below that the stock kernel's
    # latency is already at the floor
    return 512 if is_tpu() else 1 << 62


def use_pallas() -> bool:
    """Whether to use Pallas kernels for the hot ops.

    Pallas TPU kernels are only compiled on TPU backends; elsewhere the
    jnp reference implementations (same API) are used.  Can be forced off
    with the environment variable ``MOGP_TPU_DISABLE_PALLAS=1``.
    """
    if os.environ.get("MOGP_TPU_DISABLE_PALLAS", "0") == "1":
        return False
    return is_tpu()
