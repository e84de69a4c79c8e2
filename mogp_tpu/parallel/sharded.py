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

from ..models.gp import _predict_tile_size, gp_predict
from ..models.mogp import MultiOutputGP, _stack_pytrees
from .mesh import auto_mesh, replicate

__all__ = ["sharded_fit_mogp", "sharded_predict", "sharded_predict_mogp"]


def sharded_fit_mogp(
    gp: MultiOutputGP,
    n_tries=15,
    theta0=None,
    mesh=None,
    maxiter=200,
    gtol=None,
    ftol=None,
    opt_ladder=None,
    race=True,
    refit=False,
):
    """MAP-fit all outputs of a MultiOutputGP with outputs sharded on a mesh.

    Thin wrapper over the PRODUCTION fit path (``fit_GP_MAP`` with
    ``mesh``): race tournament, lane chunking, and the batched
    exact-ladder refit all run with the outputs axis sharded over the
    mesh -- the same compiled programs as the single-chip path, GSPMD
    partitioned.  Heterogeneous per-output configurations are supported
    through the same per-group dispatch as the unsharded path.
    """
    from ..models.fitting import fit_GP_MAP

    mesh = mesh or auto_mesh()
    kwargs = dict(maxiter=maxiter, race=race)
    if gtol is not None:
        kwargs["gtol"] = gtol
    if ftol is not None:
        kwargs["ftol"] = ftol
    if opt_ladder is not None:
        kwargs["opt_ladder"] = opt_ladder
    return fit_GP_MAP(
        gp, n_tries=n_tries, theta0=theta0, mesh=mesh, refit=refit, **kwargs
    )


def _super_chunks(n_query, n_dev, max_batch_size, n_train=None, n_lanes=1):
    """Yield ``(start, stop, padded_len)`` fixed-shape query super-chunks.

    The per-device tile is resolved by the same policy as single-chip
    chunked prediction (``models.gp._predict_tile_size``); a super-chunk
    is ``tile * n_dev`` rows so every chunk keeps a uniform shard per
    device.  All chunks share ONE padded length (one compiled program);
    the final partial chunk is padded by edge rows.  Memory per device is
    bounded by the (n, tile) working set, the reference GPU batching
    semantics (``GaussianProcessGPU.py:608-626``) composed with mesh
    sharding.
    """
    per_dev = -(-n_query // n_dev)
    tile = _predict_tile_size(per_dev, max_batch_size, n_train=n_train,
                              n_lanes=n_lanes)
    if tile == 0:
        # unchunked: one chunk, padded to a device multiple
        yield 0, n_query, n_dev * per_dev
        return
    chunk = tile * n_dev
    for c0 in range(0, n_query, chunk):
        yield c0, min(c0 + chunk, n_query), chunk


def _pad_rows(arr, total):
    """Pad a 2D host array to ``total`` rows by repeating the last row."""
    pad = total - arr.shape[0]
    if pad <= 0:
        return arr
    return np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)


def sharded_predict_mogp(gp, testing, mesh=None, unc=True,
                         include_nugget=True, allow_not_fit=False,
                         max_batch_size=None):
    """Predict a MultiOutputGP over a mesh-sharded query-point set.

    Outputs stay a (replicated) vmapped batch axis -- the per-output fit
    artifacts are small -- while the query axis is sharded over the mesh,
    so a HistoryMatching sweep over millions of points splits its
    K*-build and solve work across chips with no collectives
    (reference scale-out surface: ``HistoryMatching.py:197``,
    ``MultiOutputGP.py:182-324``).  ``max_batch_size`` bounds per-device
    memory by processing fixed-shape query super-chunks (default
    ``None`` auto-chunks very large sweeps), so 10^7-point sweeps fit in
    HBM regardless of query count.

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

    spec = NamedSharding(mesh, P(axis, None))
    for sig, rel in gp._groups([gp.emulators[i] for i in fit_indices]).items():
        global_idx = [fit_indices[i] for i in rel]
        ems = [gp.emulators[i] for i in global_idx]
        em0 = ems[0]
        dtype = em0._data.inputs.dtype

        arts = replicate(_stack_pytrees([em._artifacts for em in ems]), mesh)
        data = replicate(_stack_pytrees([em._data for em in ems]), mesh)

        for c0, c1, padded in _super_chunks(n_query, n_dev, max_batch_size,
                                            n_train=em0.n, n_lanes=len(ems)):
            t_c = _pad_rows(testing[c0:c1], padded)
            dm_c = em0.get_design_matrix(t_c)
            testing_j = jax.device_put(jnp.asarray(t_c, dtype=dtype), spec)
            dmtest_j = jax.device_put(jnp.asarray(dm_c, dtype=dtype), spec)

            mu, var = _batched_predict(
                arts, data, testing_j, dmtest_j, em0.kernel, em0.nugget_type,
                bool(unc), bool(include_nugget), False,
            )
            means[global_idx, c0:c1] = np.asarray(
                mu, dtype=np.float64)[:, : c1 - c0]
            if unc:
                variances[global_idx, c0:c1] = np.asarray(
                    var, dtype=np.float64)[:, : c1 - c0]
    return means, (variances if unc else None)


def sharded_predict(gp, testing, mesh=None, unc=True, include_nugget=True,
                    max_batch_size=None):
    """Predict a single GP over a large, mesh-sharded set of query points.

    ``testing`` is sharded along the query axis; fit artifacts and
    training data are replicated.  ``max_batch_size`` bounds per-device
    memory via fixed-shape super-chunks (see ``_super_chunks``).
    Returns host numpy arrays.
    """
    mesh = mesh or auto_mesh()
    n_dev = mesh.shape[mesh.axis_names[0]]
    testing = np.asarray(testing, dtype=np.float64)
    if testing.ndim == 1:
        testing = testing.reshape(-1, gp.D)
    n_query = testing.shape[0]

    dtype = gp._data.inputs.dtype
    spec = NamedSharding(mesh, P(mesh.axis_names[0], None))

    arts = replicate(gp._artifacts, mesh)
    data = replicate(gp._data, mesh)

    mu_out = np.empty((n_query,), dtype=np.float64)
    var_out = np.empty((n_query,), dtype=np.float64) if unc else None
    for c0, c1, padded in _super_chunks(n_query, n_dev, max_batch_size,
                                        n_train=gp.n):
        t_c = _pad_rows(testing[c0:c1], padded)
        dm_c = gp.get_design_matrix(t_c)
        testing_j = jax.device_put(jnp.asarray(t_c, dtype=dtype), spec)
        dmtest_j = jax.device_put(jnp.asarray(dm_c, dtype=dtype), spec)

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
        mu_out[c0:c1] = np.asarray(mu, dtype=np.float64)[: c1 - c0]
        if unc:
            var_out[c0:c1] = np.asarray(var, dtype=np.float64)[: c1 - c0]
    return mu_out, var_out
