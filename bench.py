"""Benchmark: tsunami-scale MultiOutputGP MAP fit throughput on one chip.

Mirrors the reference's headline benchmark
(``mogp_emulator/benchmarks/benchmark_tsunami.py``): 64 output emulators
on 14-D inputs with n=210 training points, each fit with 15 L-BFGS
restarts.  The reference measures ~1 s/emulator on a quad-core CPU
(``benchmark_tsunami.py:9-11``); that is the baseline of 1.0 fits/sec.

Data is synthetic with the tsunami dataset's exact shapes (inputs
(210, 14), targets (64, 210)) so no reference data is copied.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

# persistent compile cache: the batched-fit program is large; caching it
# across runs keeps the bench dominated by execution, not compilation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("MOGP_TPU_MAX_FIT_LANES", "240")

N_OUTPUTS = 64
N_POINTS = 210
N_DIM = 14
N_TRIES = 15
BASELINE_FITS_PER_SEC = 1.0  # reference: ~1 s/emulator, benchmark_tsunami.py:9-11


def make_data(seed=1234):
    rng = np.random.RandomState(seed)
    inputs = rng.uniform(0.0, 1.0, size=(N_POINTS, N_DIM))
    # smooth nonlinear multi-output response (tsunami-like wave heights)
    w = rng.randn(N_OUTPUTS, N_DIM)
    phase = rng.uniform(0, 2 * np.pi, size=N_OUTPUTS)
    targets = np.sin(inputs @ w.T + phase) + 0.3 * (inputs**2) @ np.abs(w
        ).T + 0.01 * rng.randn(N_POINTS, N_OUTPUTS)
    return inputs, targets.T.copy()


def main():
    from mogp_tpu.models.fitting import fit_GP_MAP
    from mogp_tpu.models.mogp import MultiOutputGP

    inputs, targets = make_data()

    mgp = MultiOutputGP(inputs, targets, nugget="adaptive")

    # warmup: compile the batched (outputs x restarts) program
    np.random.seed(0)
    fit_GP_MAP(mgp, n_tries=N_TRIES, maxiter=50)

    # timed run: refit everything with fresh restarts (same compiled program)
    np.random.seed(1)
    t0 = time.perf_counter()
    fit_GP_MAP(mgp, n_tries=N_TRIES, refit=True, maxiter=50)
    elapsed = time.perf_counter() - t0

    n_fit = len(mgp.get_indices_fit())
    fits_per_sec = n_fit / elapsed

    print(
        json.dumps(
            {
                "metric": "mogp_tsunami_fits_per_sec",
                "value": round(fits_per_sec, 3),
                "unit": "emulator_fits/s (64 outputs x 15 restarts, n=210, D=14)",
                "vs_baseline": round(fits_per_sec / BASELINE_FITS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
