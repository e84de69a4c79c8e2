"""Sharded multi-output fitting and large-scale prediction sweeps.

These wrappers place the batch axes of the already-batched cores
(``models/fitting.py``, ``models/gp.py``) on a device mesh:

* ``sharded_fit_mogp``  -- the (outputs x restarts) L-BFGS batch with the
  outputs axis sharded over chips; the XLA program is identical to the
  single-chip one, GSPMD partitions it.  This is the reference's
  ``Pool.starmap`` over emulators (``fitting.py:333-335``) turned into
  data parallelism over ICI.
* ``sharded_predict``   -- query points sharded over chips for
  HistoryMatching-scale sweeps (``HistoryMatching.py:197`` predicts over
  ``ncoords >> 1e4`` points); each chip builds only its slice of the
  cross-covariance and solves against the replicated factorization, so
  no collectives are needed until a reduction is requested.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.fitting import _batched_fit_multi
from ..models.gp import gp_predict
from ..models.mogp import MultiOutputGP, _stack_pytrees
from .mesh import auto_mesh, replicate, shard_leading

__all__ = ["sharded_fit_mogp", "sharded_predict", "sharded_predict_mogp"]


def _pad_leading(arr_or_tree, multiple):
    """Pad every leaf's leading axis to a multiple (masked batch padding)."""

    def pad(x):
        n = x.shape[0]
        rem = (-n) % multiple
        if rem == 0:
            return x
        pad_widths = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_widths, mode="edge")

    return jax.tree_util.tree_map(pad, arr_or_tree)


def sharded_fit_mogp(
    gp: MultiOutputGP,
    n_tries=15,
    theta0=None,
    mesh=None,
    maxiter=200,
    gtol=1e-5,
    ftol=1e-10,
    opt_ladder=None,
):
    """MAP-fit all outputs of a MultiOutputGP with outputs sharded on a mesh.

    Requires a homogeneous configuration (single signature group).  Pads
    the outputs axis up to the mesh size and drops padded results.
    """
    mesh = mesh or auto_mesh()
    groups = gp._groups()
    assert len(groups) == 1, (
        "sharded_fit_mogp requires emulators with a homogeneous configuration"
    )
    ems = gp.emulators
    em0 = ems[0]
    dtype = em0._data.inputs.dtype
    n_dev = mesh.shape[mesh.axis_names[0]]

    from ..models.fitting import _gather_starts

    starts = np.stack([_gather_starts(em, n_tries, theta0) for em in ems])
    data = _stack_pytrees([em._data for em in ems])

    starts = _pad_leading(jnp.asarray(starts, dtype=dtype), n_dev)
    data = _pad_leading(data, n_dev)

    starts = shard_leading(starts, mesh)
    data = shard_leading(data, mesh)

    from ..models.fitting import _LADDER_MODES, _OPT_LADDER

    ladder = _OPT_LADDER if opt_ladder is None else _LADDER_MODES[opt_ladder]
    res = _batched_fit_multi(
        starts, data, em0.kernel, em0.nugget_type, maxiter, gtol, ftol, ladder
    )
    if jax.process_count() > 1:
        # multi-host (DCN): each process holds only its shard of the
        # outputs axis; gather the global result onto every host
        from jax.experimental import multihost_utils

        res = multihost_utils.process_allgather(res, tiled=True)
    fun = np.asarray(res.fun, dtype=np.float64)[: len(ems)]
    xs = np.asarray(res.x, dtype=np.float64)[: len(ems)]

    for row, em in enumerate(ems):
        finite = np.isfinite(fun[row])
        if not finite.any():
            em.theta = None
        else:
            idx = int(np.nanargmin(np.where(finite, fun[row], np.inf)))
            em.fit(xs[row, idx])
    return gp


def sharded_predict_mogp(gp, testing, mesh=None, unc=True,
                         include_nugget=True, allow_not_fit=False):
    """Predict a MultiOutputGP over a mesh-sharded query-point set.

    Outputs stay a (replicated) vmapped batch axis -- the per-output fit
    artifacts are small -- while the query axis is sharded over the mesh,
    so a HistoryMatching sweep over millions of points splits its
    K*-build and solve work across chips with no collectives
    (reference scale-out surface: ``HistoryMatching.py:197``,
    ``MultiOutputGP.py:182-324``).

    Returns ``(means, variances)`` host arrays of shape
    ``(n_outputs, n_query)``; unfit emulators give NaN rows when
    ``allow_not_fit`` (reference ``_gp_predict_default_NaN`` semantics).
    """
    from ..models.mogp import _batched_predict

    mesh = mesh or auto_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    testing = np.asarray(testing, dtype=np.float64)
    if testing.ndim == 1:
        testing = testing.reshape(-1, gp.D) if gp.D > 1 else testing.reshape(-1, 1)
    n_query = testing.shape[0]

    unfit = set(gp.get_indices_not_fit())
    if unfit and not allow_not_fit:
        raise ValueError(
            "hyperparameters have not been fit for emulators {}".format(
                sorted(unfit)
            )
        )
    fit_indices = [i for i in range(gp.n_emulators) if i not in unfit]

    means = np.full((gp.n_emulators, n_query), np.nan)
    variances = np.full((gp.n_emulators, n_query), np.nan)

    for sig, rel in gp._groups([gp.emulators[i] for i in fit_indices]).items():
        global_idx = [fit_indices[i] for i in rel]
        ems = [gp.emulators[i] for i in global_idx]
        em0 = ems[0]
        dtype = em0._data.inputs.dtype

        arts = replicate(_stack_pytrees([em._artifacts for em in ems]), mesh)
        data = replicate(_stack_pytrees([em._data for em in ems]), mesh)

        dmtest = em0.get_design_matrix(testing)
        spec = NamedSharding(mesh, P(axis, None))
        testing_j = jax.device_put(
            _pad_leading(jnp.asarray(testing, dtype=dtype), n_dev), spec
        )
        dmtest_j = jax.device_put(
            _pad_leading(jnp.asarray(dmtest, dtype=dtype), n_dev), spec
        )

        mu, var = _batched_predict(
            arts, data, testing_j, dmtest_j, em0.kernel, em0.nugget_type,
            bool(unc), bool(include_nugget), False,
        )
        means[global_idx] = np.asarray(mu, dtype=np.float64)[:, :n_query]
        if unc:
            variances[global_idx] = np.asarray(var, dtype=np.float64)[:, :n_query]
    return means, (variances if unc else None)


def sharded_predict(gp, testing, mesh=None, unc=True, include_nugget=True):
    """Predict a single GP over a large, mesh-sharded set of query points.

    ``testing`` is sharded along the query axis; fit artifacts and
    training data are replicated.  Returns host numpy arrays.
    """
    mesh = mesh or auto_mesh()
    n_dev = mesh.shape[mesh.axis_names[0]]
    testing = np.asarray(testing, dtype=np.float64)
    if testing.ndim == 1:
        testing = testing.reshape(-1, gp.D)
    n_query = testing.shape[0]

    dtype = gp._data.inputs.dtype
    dmtest = gp.get_design_matrix(testing)

    testing_j = _pad_leading(jnp.asarray(testing, dtype=dtype), n_dev)
    dmtest_j = _pad_leading(jnp.asarray(dmtest, dtype=dtype), n_dev)
    spec = NamedSharding(mesh, P(mesh.axis_names[0], None))
    testing_j = jax.device_put(testing_j, spec)
    dmtest_j = jax.device_put(dmtest_j, spec)

    arts = replicate(gp._artifacts, mesh)
    data = replicate(gp._data, mesh)

    mu, var = gp_predict(
        arts,
        data,
        testing_j,
        dmtest_j,
        gp.kernel,
        gp.nugget_type,
        unc=unc,
        include_nugget=include_nugget,
        full_cov=False,
    )
    mu = np.asarray(mu, dtype=np.float64)[:n_query]
    var = None if var is None else np.asarray(var, dtype=np.float64)[:n_query]
    return mu, var
