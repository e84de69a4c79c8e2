"""Sequential Monte Carlo sampling of NROY space for history matching.

A capability extension over the reference (BASELINE north star: "SMC for
HistoryMatching implausibility sweeps ... resampling ... done via
psum/all_gather collectives"): the reference scores a fixed grid of
query points (``HistoryMatching.py:197-289``), which collapses in high
dimension -- the NROY volume fraction shrinks geometrically.  An SMC
sampler instead *adapts* a particle population onto the NROY region
through a sequence of tightening implausibility thresholds:

    stage k:  target = uniform on { x in bounds : I(x) <= tau_k },
    tau_0 = +inf > tau_1 > ... > tau_K = threshold (adaptive quantiles)

with systematic resampling and random-walk Metropolis rejuvenation at
each stage.  Everything (implausibility evaluation through the jitted GP
predict core, resampling, moves) is one ``lax.scan`` program; the
particle axis is the sharding axis on a mesh -- weight normalization and
ESS are global reductions, which GSPMD lowers to ``psum`` collectives
over ICI.
"""

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..models.gp import GaussianProcessBase, gp_predict
from ..models.meanfun import design_matrix_fn

__all__ = ["SMCResult", "smc_history_match", "systematic_resample"]


class SMCResult(NamedTuple):
    particles: np.ndarray     # (n_particles, D) final NROY-region samples
    implausibility: np.ndarray  # (n_particles,)
    thresholds: np.ndarray    # (n_stages,) adaptive threshold schedule
    accept_rates: np.ndarray  # (n_stages,) MH acceptance per stage
    nroy_fraction: float      # fraction of final particles with I <= threshold


def systematic_resample(key, weights, n):
    """Systematic resampling: indices drawn with stratified positions.

    ``weights`` need not be normalized.  Returns ``(n,)`` int32 indices.
    """
    weights = weights / jnp.sum(weights)
    positions = (jax.random.uniform(key) + jnp.arange(n)) / n
    cumsum = jnp.cumsum(weights)
    return jnp.searchsorted(cumsum, positions).astype(jnp.int32)


def _make_implausibility_fn(gp, obs_mean, obs_var, discrepancy,
                            include_nugget, rank=1):
    """Jittable ``x (m, D) -> I (m,)``.

    Single-output GPs give the plain implausibility; a ``MultiOutputGP``
    (homogeneous configuration) gives the rank-scored implausibility over
    outputs (``HistoryMatching.py:279-286`` semantics) with the per-output
    predictions vmapped inside the same program.
    """
    from ..models.mogp import MultiOutputGPBase, _stack_pytrees

    if isinstance(gp, MultiOutputGPBase):
        assert len(gp._groups()) == 1, (
            "multi-output SMC requires a homogeneous emulator configuration"
        )
        ems = gp.emulators
        em0 = ems[0]
        arts = _stack_pytrees([em._artifacts for em in ems])
        data = _stack_pytrees([em._data for em in ems])
        kernel = em0.kernel
        nugget_type = em0.nugget_type
        dm_fn = design_matrix_fn(em0._mean, state=getattr(em0, '_mean_state', None))
        n_obs = obs_mean.shape[0]
        eff_rank = 0 if n_obs == 1 else min(rank, n_obs - 1)

        def I_fn(x):
            dmtest = dm_fn(x).astype(x.dtype)
            mu, var = jax.vmap(
                lambda a, d: gp_predict(
                    a, d, x, dmtest, kernel, nugget_type,
                    unc=True, include_nugget=include_nugget, full_cov=False,
                )
            )(arts, data)                      # (n_obs, m) each
            V = var + obs_var[:, None] + discrepancy
            I = jnp.abs(obs_mean[:, None] - mu) / jnp.sqrt(V)
            # rank-k largest across outputs (rank=0 -> max)
            I_sorted = jnp.sort(I, axis=0)
            return I_sorted[n_obs - eff_rank - 1]

        return I_fn

    arts = gp._artifacts
    data = gp._data
    kernel = gp.kernel
    nugget_type = gp.nugget_type
    dm_fn = design_matrix_fn(gp._mean, state=getattr(gp, '_mean_state', None))

    def I_fn(x):
        dmtest = dm_fn(x).astype(x.dtype)
        mu, var = gp_predict(
            arts, data, x, dmtest, kernel, nugget_type,
            unc=True, include_nugget=include_nugget, full_cov=False,
        )
        V = var + obs_var + discrepancy
        return jnp.abs(obs_mean - mu) / jnp.sqrt(V)

    return I_fn


def smc_history_match(
    gp,
    obs,
    bounds,
    threshold=3.0,
    n_particles=4096,
    n_stages=10,
    n_mcmc=5,
    discrepancy=0.0,
    include_nugget=True,
    quantile=0.5,
    rank=1,
    seed=0,
    mesh=None,
    checkpoint_path=None,
):
    """Sample the NROY region of a fit GP with adaptive-threshold SMC.

    :param gp: fit ``GaussianProcess``.
    :param obs: observation as ``[mean, variance]`` (or float).
    :param bounds: ``(D, 2)`` array of [lo, hi] per input dimension
                   (the prior over query space is uniform on the box).
    :param threshold: final implausibility threshold (default 3,
                      matching ``HistoryMatching``).
    :param n_stages: number of tempering stages; thresholds adapt as the
                     ``quantile`` of the current population's I (floored
                     at ``threshold``).
    :param n_mcmc: random-walk Metropolis rejuvenation steps per stage.
    :param rank: for multi-output emulators, the rank-scored
                 implausibility order (0 = max; default 1, matching
                 ``HistoryMatching``).
    :param mesh: optional device mesh; particles are sharded on its
                 first axis.
    :param checkpoint_path: optional ``.npz`` path; when given the anneal
        runs stage-by-stage (one compiled stage program) and persists the
        particle population, proposal scale, key state, and stage index
        after every stage -- a preempted run resumes from the last
        completed stage with an identical key stream (the NUTS segment
        pattern, ``models/inference.py``).  The checkpoint is tagged with
        the run configuration and the emulator data, and removed on
        completion.
    :returns: ``SMCResult``.
    """
    from ..models.mogp import MultiOutputGPBase

    assert isinstance(gp, (GaussianProcessBase, MultiOutputGPBase)), (
        "smc_history_match needs a GaussianProcess or MultiOutputGP"
    )
    if isinstance(obs, (float, int)):
        obs = [float(obs), 0.0]
    if isinstance(gp, MultiOutputGPBase):
        obs_mean = np.atleast_1d(np.asarray(obs[0], dtype=np.float64))
        obs_var = np.atleast_1d(np.asarray(obs[1], dtype=np.float64))
        assert obs_mean.shape[0] == gp.n_emulators, (
            "need one observation per emulator output"
        )
        ref_em = gp.emulators[0]
    else:
        obs_mean, obs_var = float(obs[0]), float(obs[1])
        ref_em = gp

    bounds = np.asarray(bounds, dtype=np.float64)
    assert bounds.shape == (gp.D, 2), "bounds must have shape (D, 2)"

    dtype = ref_em._data.inputs.dtype
    lo = jnp.asarray(bounds[:, 0], dtype=dtype)
    hi = jnp.asarray(bounds[:, 1], dtype=dtype)

    I_fn = _make_implausibility_fn(
        gp, jnp.asarray(obs_mean, dtype=dtype), jnp.asarray(obs_var, dtype=dtype),
        jnp.asarray(float(discrepancy), dtype=dtype), include_nugget,
        rank=rank,
    )

    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    particles = lo + (hi - lo) * jax.random.uniform(
        k_init, (n_particles, gp.D), dtype=dtype
    )

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        particles = jax.device_put(
            particles, NamedSharding(mesh, P(mesh.axis_names[0], None))
        )

    scale0 = (hi - lo) * 0.2

    def stage(carry, _):
        particles, scale, key = carry
        I = I_fn(particles)
        # adaptive threshold: quantile of current population, floored
        tau = jnp.maximum(jnp.quantile(I, quantile), threshold)

        # reweight to the constrained target and resample survivors
        w = (I <= tau).astype(dtype) + 1e-12
        key, k_res = jax.random.split(key)
        idx = systematic_resample(k_res, w, n_particles)
        particles = particles[idx]
        I = I[idx]

        # random-walk Metropolis rejuvenation within {I <= tau}
        def mh_step(carry, _):
            particles, I, key, n_acc = carry
            key, k_prop, k_acc = jax.random.split(key, 3)
            prop = particles + scale * jax.random.normal(
                k_prop, particles.shape, dtype=dtype
            )
            inside = jnp.all(
                jnp.logical_and(prop >= lo, prop <= hi), axis=1
            )
            I_prop = I_fn(prop)
            ok = jnp.logical_and(inside, I_prop <= tau)
            particles = jnp.where(ok[:, None], prop, particles)
            I = jnp.where(ok, I_prop, I)
            return (particles, I, key, n_acc + jnp.mean(ok.astype(dtype))), None

        (particles, I, key, n_acc), _ = lax.scan(
            mh_step, (particles, I, key, jnp.zeros((), dtype)), None,
            length=n_mcmc,
        )
        acc_rate = n_acc / n_mcmc
        # adapt proposal scale towards ~30% acceptance
        scale = scale * jnp.exp(1.0 * (acc_rate - 0.3))
        return (particles, scale, key), (tau, acc_rate)

    if checkpoint_path is None:
        # all stages in ONE program: the default fast path
        @partial(jax.jit, static_argnames=())
        def run(particles, key):
            (particles, _, key), (taus, accs) = lax.scan(
                stage, (particles, scale0, key), None, length=n_stages
            )
            I = I_fn(particles)
            return particles, I, taus, accs

        particles, I, taus, accs = run(particles, key)
    else:
        # segmented anneal: ONE compiled per-stage program driven by a
        # host loop that persists (particles, scale, key, stage index)
        # after every stage -- a preempted run resumes mid-anneal with a
        # key-stream-identical population (the stage body is the same
        # function the single-program scan runs, so segmented == single
        # program bit-for-bit; test-pinned).
        from ..utils.checkpoint import _smc_tag, load_smc, save_smc

        tag = _smc_tag(gp, obs_mean, obs_var, bounds, threshold,
                       n_particles, n_stages, n_mcmc, discrepancy,
                       include_nugget, quantile, rank, seed)
        stage_jit = jax.jit(lambda c: stage(c, None))
        carry = (particles, scale0, key)
        k0, taus_l, accs_l = 0, [], []
        ck = load_smc(checkpoint_path, tag=tag)
        if ck is not None:
            k0 = int(ck["stage"])
            taus_l = list(ck["taus"])
            accs_l = list(ck["accs"])
            carry = (
                jnp.asarray(ck["particles"], dtype=dtype),
                jnp.asarray(ck["scale"], dtype=dtype),
                jnp.asarray(ck["key"]),
            )
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                carry = (
                    jax.device_put(
                        carry[0],
                        NamedSharding(mesh, P(mesh.axis_names[0], None)),
                    ),
                ) + carry[1:]
        for k in range(k0, n_stages):
            carry, (tau, acc) = stage_jit(carry)
            taus_l.append(float(tau))
            accs_l.append(float(acc))
            save_smc(
                checkpoint_path,
                {
                    "particles": np.asarray(carry[0]),
                    "scale": np.asarray(carry[1]),
                    "key": np.asarray(carry[2]),
                    "stage": k + 1,
                    "taus": np.asarray(taus_l),
                    "accs": np.asarray(accs_l),
                },
                tag=tag,
            )
        particles, _, key = carry
        I = jax.jit(I_fn)(particles)
        taus = np.asarray(taus_l)
        accs = np.asarray(accs_l)
        import os

        if os.path.exists(str(checkpoint_path)):
            os.remove(str(checkpoint_path))

    particles = np.asarray(particles)
    I = np.asarray(I)
    return SMCResult(
        particles=particles,
        implausibility=I,
        thresholds=np.asarray(taus),
        accept_rates=np.asarray(accs),
        nroy_fraction=float(np.mean(I <= threshold)),
    )
