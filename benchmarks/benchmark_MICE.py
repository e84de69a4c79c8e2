"""MICE sequential design vs one-shot LHC (Branin-2D), plus the
fixed-shape device engine at candidate scale.

Analogue of reference ``benchmarks/benchmark_MICE.py``: for equal total
budgets, a MICE-designed GP should match or beat an LHC-designed GP.

``--device-scale`` additionally runs ``DeviceMICEDesign`` (two compiled
programs for the whole loop) at ``--n-cand`` candidates (default 1e5,
BASELINE config 4) and reports PER-STEP wall-clock -- flat after the
first (compiling) step is the acceptance criterion, vs the reference's
recompile-per-step growth.
"""

import argparse
import time

import numpy as np

from common import branin, print_table

import mogp_tpu


def main():
    np.random.seed(74294)
    bounds = [(-5.0, 10.0), (0.0, 15.0)]
    lhd = mogp_tpu.LatinHypercubeDesign(bounds)
    x_test = lhd.sample(200)
    y_test = branin(x_test)

    def f(x):
        return branin(np.atleast_2d(x))[0]

    rows = []
    for n_total in [16, 24]:
        # one-shot LHC
        x_lhc = lhd.sample(n_total)
        y_lhc = branin(x_lhc)
        gp_lhc = mogp_tpu.fit_GP_MAP(
            mogp_tpu.GaussianProcess(x_lhc, y_lhc), n_tries=5
        )
        rmse_lhc = float(
            np.sqrt(np.mean((gp_lhc.predict(x_test)[0] - y_test) ** 2))
        )

        # MICE: half the budget as init, half sequential
        md = mogp_tpu.MICEDesign(
            mogp_tpu.LatinHypercubeDesign(bounds),
            f,
            n_samples=n_total // 2,
            n_init=n_total - n_total // 2,
            n_cand=50,
        )
        md.run_sequential_design()
        gp_mice = mogp_tpu.fit_GP_MAP(
            mogp_tpu.GaussianProcess(md.get_inputs(), md.get_targets()),
            n_tries=5,
        )
        rmse_mice = float(
            np.sqrt(np.mean((gp_mice.predict(x_test)[0] - y_test) ** 2))
        )
        rows.append([n_total, rmse_lhc, rmse_mice])
        print("n={}: LHC rmse={:.4g}  MICE rmse={:.4g}".format(
            n_total, rmse_lhc, rmse_mice))

    print()
    print_table(["n_total", "rmse_lhc", "rmse_mice"], rows)


def device_scale(n_cand=100_000, n_init=16, n_samples=8, cand_block=4096,
                 n_tries=8, maxiter=60):
    """DeviceMICEDesign at candidate scale: per-step wall-clock trace."""
    from mogp_tpu.uq.mice_device import (
        _mice_fit_step, _mice_score_step, DeviceMICEDesign,
    )

    np.random.seed(8213)
    bounds = [(-5.0, 10.0), (0.0, 15.0)]

    def f(x):
        return branin(np.atleast_2d(x))[0]

    md = DeviceMICEDesign(
        mogp_tpu.LatinHypercubeDesign(bounds), f,
        n_samples=n_samples, n_init=n_init, n_cand=n_cand,
        cand_block=cand_block, n_tries=n_tries, maxiter=maxiter,
    )
    md.run_initial_design()
    steps = []
    for i in range(n_samples):
        t0 = time.perf_counter()
        md.run_next_point()
        dt = time.perf_counter() - t0
        steps.append(dt)
        print("step {:2d}: {:8.2f} s   (fit programs: {}, score programs: {})"
              .format(i, dt, _mice_fit_step._cache_size(),
                      _mice_score_step._cache_size()), flush=True)
    warm = steps[1:] if len(steps) > 1 else steps
    print("n_cand={}  first(+compile)={:.1f}s  warm median={:.2f}s  "
          "warm max/min={:.2f}  compiled shapes: fit={} score={}".format(
              n_cand, steps[0], float(np.median(warm)),
              max(warm) / max(min(warm), 1e-9),
              _mice_fit_step._cache_size(), _mice_score_step._cache_size()))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--device-scale", action="store_true")
    ap.add_argument("--n-cand", type=int, default=100_000)
    ap.add_argument("--n-samples", type=int, default=8)
    ap.add_argument("--cand-block", type=int, default=4096)
    args = ap.parse_args()
    if args.device_scale:
        device_scale(n_cand=args.n_cand, n_samples=args.n_samples,
                     cand_block=args.cand_block)
    else:
        main()
