"""Tsunami-scale multi-output fit throughput (the headline benchmark).

Analogue of reference ``benchmarks/benchmark_tsunami.py`` (64 outputs,
n=210, D=14; reference: ~1 s/emulator on a quad-core CPU with a process
pool).  Here all outputs x restarts run as one batched on-device L-BFGS;
this script sweeps output counts and reports emulator fits/sec.
Synthetic data with the tsunami dataset's exact shapes.
"""

import time

import numpy as np

from common import print_table

import mogp_tpu


def make_data(n_outputs, n=210, D=14, seed=1234):
    rng = np.random.RandomState(seed)
    inputs = rng.uniform(0.0, 1.0, size=(n, D))
    w = rng.randn(n_outputs, D)
    phase = rng.uniform(0, 2 * np.pi, size=n_outputs)
    targets = (
        np.sin(inputs @ w.T + phase)
        + 0.3 * (inputs**2) @ np.abs(w).T
        + 0.01 * rng.randn(n, n_outputs)
    )
    return inputs, targets.T.copy()


def main():
    rows = []
    for n_outputs in [8, 16, 32, 64]:
        inputs, targets = make_data(n_outputs)
        mgp = mogp_tpu.MultiOutputGP(inputs, targets, nugget="adaptive")
        np.random.seed(0)
        mogp_tpu.fit_GP_MAP(mgp, n_tries=15, maxiter=50)  # includes compile
        np.random.seed(1)
        t0 = time.perf_counter()
        mogp_tpu.fit_GP_MAP(mgp, n_tries=15, refit=True, maxiter=50)
        dt = time.perf_counter() - t0
        fits_per_sec = len(mgp.get_indices_fit()) / dt
        rows.append([n_outputs, dt, fits_per_sec])
        print("{} outputs: {:.2f}s -> {:.2f} fits/s".format(
            n_outputs, dt, fits_per_sec))

    print()
    print_table(["outputs", "seconds", "fits_per_s"], rows)
    print("reference baseline: ~1 fit/s (quad-core CPU, "
          "benchmark_tsunami.py docstring)")


if __name__ == "__main__":
    main()
