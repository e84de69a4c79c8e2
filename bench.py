"""Benchmark: tsunami-scale MultiOutputGP MAP fit throughput on one chip.

Mirrors the reference's headline benchmark
(``mogp_emulator/benchmarks/benchmark_tsunami.py``): 64 output emulators
on 14-D inputs with n=210 training points, each fit with 15 L-BFGS
restarts.  The reference measures ~1 s/emulator on a quad-core CPU
(``benchmark_tsunami.py:9-11``); that is the baseline of 1.0 fits/sec.

Data is synthetic with the tsunami dataset's exact shapes (inputs
(210, 14), targets (64, 210)) so no reference data is copied.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Defensive structure: a small warmup populates the persistent compile
cache; if the full 64-output run cannot finish, the result from the
largest completed configuration is reported instead of nothing.
"""

import json
import os
import time

import numpy as np

# persistent compile cache: the batched-fit program is large; caching it
# across runs keeps the bench dominated by execution, not compilation.
# MOGP_TPU_COMPILE_CACHE is applied via jax.config.update at mogp_tpu
# import (env-var-based JAX_COMPILATION_CACHE_DIR is a no-op here: the
# axon sitecustomize imports jax before this script runs)
os.environ.setdefault("MOGP_TPU_COMPILE_CACHE", "/root/repo/.jax_cache")
# per-program lane count: measured per-lane eval cost on a v5e core is
# ~2x better at 240 lanes than at 60 (287 vs 570 us/lane for a batched
# value-and-grad); the 240-lane program compiles in ~1-2 min via the
# remote-compile service, paid once in the (untimed) warmup and then
# served by the persistent compile cache
os.environ.setdefault("MOGP_TPU_MAX_FIT_LANES", "240")

N_POINTS = 210
N_DIM = 14
N_TRIES = 15
BASELINE_FITS_PER_SEC = 1.0  # reference: ~1 s/emulator, benchmark_tsunami.py:9-11


def make_data(n_outputs, seed=1234):
    rng = np.random.RandomState(seed)
    inputs = rng.uniform(0.0, 1.0, size=(N_POINTS, N_DIM))
    w = rng.randn(n_outputs, N_DIM)
    phase = rng.uniform(0, 2 * np.pi, size=n_outputs)
    targets = (
        np.sin(inputs @ w.T + phase)
        + 0.3 * (inputs**2) @ np.abs(w).T
        + 0.01 * rng.randn(N_POINTS, n_outputs)
    )
    return inputs, targets.T.copy()


def timed_fit(n_outputs, warmed):
    from mogp_tpu.models.fitting import fit_GP_MAP
    from mogp_tpu.models.mogp import MultiOutputGP

    inputs, targets = make_data(n_outputs)
    mgp = MultiOutputGP(inputs, targets, nugget="adaptive")
    if not warmed:
        np.random.seed(0)
        fit_GP_MAP(mgp, n_tries=N_TRIES, maxiter=50)
    np.random.seed(1)
    t0 = time.perf_counter()
    fit_GP_MAP(mgp, n_tries=N_TRIES, refit=not warmed or True, maxiter=50)
    dt = time.perf_counter() - t0
    return len(mgp.get_indices_fit()) / dt


def _ensure_live_backend():
    """Probe the accelerator in a subprocess; fall back to CPU if wedged.

    The axon TPU tunnel can wedge for extended periods (a client killed
    mid-RPC stalls every subsequent init).  A hang here would mean no
    benchmark line at all, so probe with a hard timeout and drop to the
    CPU backend (clearly labeled) when the device does not answer.
    """
    import subprocess
    import sys

    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))"],
            timeout=90, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return "accelerator"
    except Exception:
        # jax is already imported (the axon sitecustomize imports it at
        # interpreter start), so env vars are too late -- switch the
        # platform via config before any backend initializes
        os.environ["MOGP_TPU_DISABLE_PALLAS"] = "1"
        import jax

        jax.config.update("jax_platforms", "cpu")
        return "cpu-fallback"


def main():
    start = time.time()
    backend = _ensure_live_backend()
    result = None
    label = None
    try:
        # warmup on the single-chunk config: compiles (or loads from the
        # persistent cache) the exact program the full run uses
        n_first = 4 if backend == "cpu-fallback" else 16
        fps = timed_fit(n_first, warmed=False)
        result, label = fps, "{} outputs".format(n_first)
        # budget check measures EXECUTION time only, from after the
        # warmup+first measurement: a cold-cache compile (~1-2 min for the
        # 240-lane program) must not push the run into the fallback
        warmed_elapsed = n_first / max(fps, 1e-9)  # warm exec time, 1st run
        if backend != "cpu-fallback" and warmed_elapsed < 120:
            fps64 = timed_fit(64, warmed=True)
            result, label = fps64, "64 outputs"
    except Exception as exc:  # always emit a line for the driver
        if result is None:
            print(
                json.dumps(
                    {
                        "metric": "mogp_tsunami_fits_per_sec",
                        "value": 0.0,
                        "unit": "emulator_fits/s (failed: {})".format(
                            type(exc).__name__
                        ),
                        "vs_baseline": 0.0,
                    }
                )
            )
            raise

    print(
        json.dumps(
            {
                "metric": "mogp_tsunami_fits_per_sec",
                "value": round(result, 3),
                "unit": "emulator_fits/s ({} x {} restarts, n={}, D={}, {})".format(
                    label, N_TRIES, N_POINTS, N_DIM, backend
                ),
                "vs_baseline": round(result / BASELINE_FITS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
