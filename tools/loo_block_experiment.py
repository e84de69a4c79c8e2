"""Quantify the block-local LOO approximation in DeviceMICEDesign.

Beyond ``cand_block`` candidates, ``uq/mice_device.py`` computes the
MICE denominator (the candidate GP's leave-one-out variance,
``SequentialDesign.py:705-748``) block-locally: each candidate
conditions only on its own block.  This experiment measures, on CPU
f64:

1. **Score agreement** -- block-local vs dense LOO scores on the same
   candidate set, sweeping the block/total ratio.  Reported: median and
   max relative score deviation, argmax regret in DENSE-criterion terms
   (how much worse is the candidate block-local picks, measured by the
   exact criterion), and top-10 overlap.
2. **End-design quality** -- full Branin MICE loops (the reference's
   ``benchmark_MICE.py`` setup) run with block-local scoring vs dense
   scoring on the same candidate budget; reported: RMSE of a GP fit on
   the resulting designs, over several seeds.

Run:  python tools/loo_block_experiment.py
Results recorded in docs/tpu_performance.md ("Block-local LOO
approximation, measured").
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np          # noqa: E402
import jax.numpy as jnp     # noqa: E402

sys.path.insert(0, ".")

from mogp_tpu.models.gp import GaussianProcess, make_gp_data  # noqa: E402
from mogp_tpu.models.fitting import fit_GP_MAP                # noqa: E402
from mogp_tpu.models.priors import GPPriors                   # noqa: E402
from mogp_tpu.ops.kernels import get_kernel                   # noqa: E402
from mogp_tpu.uq.experimental_design import LatinHypercubeDesign  # noqa: E402
from mogp_tpu.uq.mice_device import DeviceMICEDesign, _mice_score_step  # noqa: E402

KERNEL = get_kernel("SquaredExponential")


def branin(x):
    x1 = x[0] * 15.0 - 5.0
    x2 = x[1] * 15.0
    return (
        (x2 - 5.1 / (4 * np.pi**2) * x1**2 + 5.0 / np.pi * x1 - 6.0) ** 2
        + 10.0 * (1 - 1.0 / (8 * np.pi)) * np.cos(x1)
        + 10.0
    )


def score_agreement():
    print("== score agreement: block-local vs dense LOO ==")
    rng = np.random.RandomState(0)
    n_obs, D = 20, 2
    x = rng.uniform(0, 1, size=(n_obs, D))
    y = np.sin(3 * x[:, 0]) + x[:, 1] ** 2
    priors = GPPriors.default_priors(x, D, nugget_type="adaptive")
    data = make_gp_data(x, y, np.zeros((n_obs, 0)), priors)
    mask = jnp.ones(n_obs)
    raw = jnp.asarray(np.array([0.5, 0.3, 0.0]))
    fast, zs = jnp.asarray(1e-6), jnp.asarray(0.0)

    print(f"{'n_cand':>7} {'B':>5} {'B/n':>6} {'med_dev':>8} {'max_dev':>8} "
          f"{'regret':>8} {'top10':>6}")
    for n_cand in (2048, 8192):
        cands = rng.uniform(0, 1, size=(n_cand, D))
        dense, _ = _mice_score_step(
            raw, data, mask, jnp.asarray(cands[None]),
            jnp.ones((1, n_cand)), fast, zs, KERNEL, "adaptive", True,
        )
        dense = np.asarray(dense)
        i_d = int(np.argmax(dense))
        for B in (256, 512, 1024, 2048, 4096):
            if B >= n_cand:
                continue
            nb = n_cand // B
            bl, _ = _mice_score_step(
                raw, data, mask, jnp.asarray(cands.reshape(nb, B, D)),
                jnp.ones((nb, B)), fast, zs, KERNEL, "adaptive", True,
            )
            bl = np.asarray(bl)
            rel = np.abs(bl - dense) / np.abs(dense)
            i_bl = int(np.argmax(bl))
            regret = (dense[i_d] - dense[i_bl]) / dense[i_d]
            top_d = set(np.argsort(dense)[-10:])
            top_b = set(np.argsort(bl)[-10:])
            print(f"{n_cand:>7} {B:>5} {B/n_cand:>6.2f} "
                  f"{np.median(rel):>8.4f} {rel.max():>8.4f} "
                  f"{regret:>8.5f} {len(top_d & top_b):>6}")


def end_design_quality(n_cand=8192, cand_block_small=1024, n_init=8,
                       n_steps=12, seeds=(0, 1, 2)):
    """Full MICE loops: dense scoring vs block-local on the same
    candidate budget; quality = holdout RMSE of a GP fit on the final
    design (reference ``benchmark_MICE.py`` protocol)."""
    print("\n== end-design quality (Branin, {} MICE steps) ==".format(n_steps))
    rng = np.random.RandomState(99)
    xtest = rng.uniform(0, 1, size=(300, 2))
    ytest = np.array([branin(p) for p in xtest])

    def run(seed, cand_block):
        np.random.seed(seed)
        md = DeviceMICEDesign(
            LatinHypercubeDesign(2), branin, n_init=n_init,
            n_samples=n_steps, n_cand=n_cand, cand_block=cand_block,
        )
        md.run_sequential_design()
        inputs, targets = md.get_inputs(), md.get_targets()
        np.random.seed(seed)
        gp = fit_GP_MAP(
            GaussianProcess(inputs, targets, nugget="adaptive"), n_tries=5,
        )
        mu = gp.predict(xtest, unc=False)[0]
        return float(np.sqrt(np.mean((mu - ytest) ** 2)) / ytest.std())

    print(f"{'seed':>5} {'dense rmse/std':>15} {'block-local rmse/std':>21}")
    d_all, b_all = [], []
    for seed in seeds:
        d = run(seed, cand_block=n_cand)           # one dense block
        b = run(seed, cand_block=cand_block_small)  # 8 blocks of 1024
        d_all.append(d)
        b_all.append(b)
        print(f"{seed:>5} {d:>15.4f} {b:>21.4f}")
    print(f"{'mean':>5} {np.mean(d_all):>15.4f} {np.mean(b_all):>21.4f}")


if __name__ == "__main__":
    score_agreement()
    end_design_quality()
