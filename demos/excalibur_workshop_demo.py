"""Workshop-style walkthrough (analogue of reference
``demos/excalibur_workshop_demo.py``): a compact end-to-end calibration
exercise with mean functions, priors, and history matching.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import mogp_tpu
from mogp_tpu import GPPriors, InvGammaPrior, LogNormalPrior


def simulator(x):
    """A 'computer experiment': damped oscillation amplitude."""
    freq, damping = x
    t = np.linspace(0, 5, 200)
    return float(np.trapezoid(np.exp(-damping * t) * np.cos(freq * t) ** 2, t))


def main():
    np.random.seed(99)
    design = mogp_tpu.MaxiMinLHC([(0.5, 5.0), (0.1, 2.0)])
    inputs = design.sample(30)
    targets = np.array([simulator(p) for p in inputs])

    # explicit priors: lognormal correlation lengths, default nugget
    priors = GPPriors(
        corr=[
            LogNormalPrior(1.0, 1.0),
            LogNormalPrior(1.0, 0.5),
        ],
        cov=InvGammaPrior(2.0, 1.0),
        nugget=InvGammaPrior.default_prior_nugget(),
        nugget_type="fit",
    )
    gp = mogp_tpu.GaussianProcess(
        inputs, targets, mean="x[0]", priors=priors, nugget="fit"
    )
    gp = mogp_tpu.fit_GP_MAP(gp, n_tries=10)
    print("fit: corr = {}, sigma2 = {:.4g}, nugget = {:.3g}".format(
        np.round(gp.theta.corr, 3), gp.theta.cov, gp.theta.nugget))
    print("analytic mean coefficients:", np.round(gp.theta.mean, 4))

    # calibrate: which (freq, damping) are consistent with an observation?
    # (plain LHC for dense query sampling -- MaxiMin's pairwise search is
    # meant for small training designs)
    query = mogp_tpu.LatinHypercubeDesign([(0.5, 5.0), (0.1, 2.0)]).sample(5000)
    hm = mogp_tpu.HistoryMatching(gp=gp, coords=query, obs=[0.5, 0.001])
    nroy = hm.get_NROY()
    print("NROY: {} / {} query points".format(len(nroy), len(query)))
    if nroy:
        pts = query[nroy]
        print("NROY freq range: [{:.2f}, {:.2f}], damping range: "
              "[{:.2f}, {:.2f}]".format(
                  pts[:, 0].min(), pts[:, 0].max(),
                  pts[:, 1].min(), pts[:, 1].max()))


if __name__ == "__main__":
    main()
