"""Wall-clock breakdown of one warm 64-output tsunami-shape fit.

Monkeypatches timers around the phase runners to attribute the gap
between objective-slope throughput and measured end-to-end fits/s.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MOGP_TPU_COMPILE_CACHE",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("MOGP_TPU_MAX_FIT_LANES", "240")

import numpy as np

import mogp_tpu.models.fitting as F
from mogp_tpu.models.fitting import fit_GP_MAP
from mogp_tpu.models.mogp import MultiOutputGP

N_POINTS, N_DIM, N_TRIES = 210, 14, 15


def make_data(n_outputs, seed=1234):
    rng = np.random.RandomState(seed)
    inputs = rng.uniform(0.0, 1.0, size=(N_POINTS, N_DIM))
    w = rng.randn(n_outputs, N_DIM)
    phase = rng.uniform(0, 2 * np.pi, size=n_outputs)
    targets = (np.sin(inputs @ w.T + phase)
               + 0.3 * (inputs**2) @ np.abs(w).T
               + 0.01 * rng.randn(N_POINTS, n_outputs))
    return inputs, targets.T.copy()


acc = {}


def timed(name, fn):
    def wrapper(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        acc[name] = acc.get(name, 0.0) + time.perf_counter() - t0
        acc[name + "_calls"] = acc.get(name + "_calls", 0) + 1
        return out
    return wrapper


F._run_fit_chunked = timed("run_fit_chunked", F._run_fit_chunked)
_orig_refit = F._batched_refit
F._batched_refit = timed("batched_refit", _orig_refit)
F._gather_starts = timed("gather_starts", F._gather_starts)


def main():
    inputs, targets = make_data(64)
    t0 = time.perf_counter()
    mgp = MultiOutputGP(inputs, targets, nugget="adaptive")
    t_ctor = time.perf_counter() - t0
    np.random.seed(0)
    fit_GP_MAP(mgp, n_tries=N_TRIES, maxiter=50)  # warm all programs
    acc.clear()
    np.random.seed(1)
    t0 = time.perf_counter()
    fit_GP_MAP(mgp, n_tries=N_TRIES, refit=True, maxiter=50)
    total = time.perf_counter() - t0
    print(f"constructor (64 outputs): {t_ctor:.2f}s")
    print(f"total warm fit: {total:.2f}s  ({64/total:.2f} fits/s)")
    for k in sorted(acc):
        if k.endswith("_calls"):
            continue
        print(f"  {k:20s} {acc[k]:7.2f}s  ({acc[k + '_calls']} calls)")
    print(f"  unattributed         {total - sum(v for k, v in acc.items() if not k.endswith('_calls')):7.2f}s")


if __name__ == "__main__":
    main()
