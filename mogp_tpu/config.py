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
    "batch_blocked_leaf",
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

    Default: DISABLED.  Measured on a v5e core (chained fori_loop
    harness, median of 3 long runs; full table in
    ``docs/tpu_performance.md``), XLA's stock Cholesky wins or ties the
    recursive form at every size from 256 to 4096 except a ~6% blk128
    win at n=4096 single-matrix, and wins at every size for the
    6-candidate jitter-ladder batch the adaptive path actually runs.
    The blocked kernels stay available -- algorithm-verified against
    LAPACK oracles -- for other topologies via
    ``MOGP_TPU_BLOCKED_CHOL_MIN_N`` (0 or negative disables).
    """
    env = os.environ.get("MOGP_TPU_BLOCKED_CHOL_MIN_N")
    if env is not None:
        v = int(env)
        return v if v > 0 else 1 << 62
    return 1 << 62


def batch_blocked_leaf() -> int:
    """Leaf size for the batched small-n blocked Cholesky/TRSM dispatch,
    or 0 when disabled.

    Distinct from the large-n axis (:func:`blocked_chol_min_n`): at the
    HEADLINE batched shape (hundreds of lanes, n ~ 200) the recursive
    blocked kernels beat XLA's stock batched ops on a v5e core
    (loop-slope, 240 lanes, n=210, f32: Cholesky 29.1 vs 38.4 us/matrix
    at leaf=32; 2-col lower TRSM 1.26 ms at leaf=32 / 1.54 ms at leaf=64
    vs stock 6.02 -- the batched column-sweep solve is badly
    latency-bound, and leaf=32 is the shipped TRSM leaf, see
    ``ops.cholesky._TRSM_LEAF``).  The dispatch only applies up to
    ``ops.cholesky._BATCH_BLOCKED_MAX_N`` (the measured regime); larger
    matrices use stock XLA.  Enabled by default on TPU backends; off
    elsewhere (the CPU f64 oracle suite times stock LAPACK-shaped
    paths).  Override with ``MOGP_TPU_BATCH_BLOCKED_LEAF`` (0 disables;
    affects the CHOLESKY leaf only -- the TRSM leaf is fixed at its
    independently-measured optimum; keep leaves <= 64 -- leaf=128 at
    n=210 trips an XLA scoped-vmem overflow in the stock block-inverse
    the leaves call).
    """
    env = os.environ.get("MOGP_TPU_BATCH_BLOCKED_LEAF")
    if env is not None:
        return max(0, int(env))
    return 32 if is_tpu() else 0


def use_pallas() -> bool:
    """Whether to use Pallas kernels for the hot ops.

    Pallas TPU kernels are only compiled on TPU backends; elsewhere the
    jnp reference implementations (same API) are used.  Can be forced off
    with the environment variable ``MOGP_TPU_DISABLE_PALLAS=1``.
    """
    if os.environ.get("MOGP_TPU_DISABLE_PALLAS", "0") == "1":
        return False
    return is_tpu()
