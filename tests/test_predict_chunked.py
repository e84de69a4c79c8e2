"""Memory-bounded (tiled / super-chunked) prediction parity tests.

The tiled paths must be bit-compatible rearrangements of the untiled
predict math (same kernels, same solves, only the query axis is split),
so parity tolerances are tight.  Reference semantics being reproduced:
``GaussianProcessGPU.predict`` batching (``GaussianProcessGPU.py:608-626``,
``max_batch_size=2000``) and the C++ preallocated ``testing_size`` buffer
(``mogp_gpu/src/densegp_gpu.hpp:786-812``).
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax.numpy as jnp

from mogp_tpu import GaussianProcess, MultiOutputGP, fit_GP_MAP
from mogp_tpu.models.gp import (
    _predict_tile_size,
    gp_predict,
    gp_predict_tiled,
)


@pytest.fixture(scope="module")
def fitted_gp():
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, size=(24, 3))
    y = np.sin(3 * x[:, 0]) + x[:, 1] ** 2 + 0.1 * x[:, 2]
    np.random.seed(0)
    return fit_GP_MAP(GaussianProcess(x, y, mean="x[0]"), n_tries=2, maxiter=30)


@pytest.fixture(scope="module")
def queries():
    return np.random.RandomState(1).uniform(0, 1, size=(103, 3))


def test_tile_size_policy():
    # explicit sizes are rounded up to the 256 lane quantum
    assert _predict_tile_size(10_000, 2000) == 2048
    assert _predict_tile_size(10_000, 2048) == 2048
    # no chunking when the sweep fits one tile
    assert _predict_tile_size(100, 2000) == 0
    assert _predict_tile_size(2048, 2048) == 0
    # auto policy: unchunked until _AUTO_PREDICT_TILE, then tiled
    assert _predict_tile_size(32768, None) == 0
    assert _predict_tile_size(32769, None) == 32768
    with pytest.raises(AssertionError):
        _predict_tile_size(100, 0)


def test_tile_size_scales_with_lanes():
    # the auto tile shrinks with the per-tile working set so wide
    # multi-output sweeps stay inside the HBM budget
    assert _predict_tile_size(10**7, None, n_train=210, n_lanes=1) == 32768
    t64 = _predict_tile_size(10**7, None, n_train=210, n_lanes=64)
    assert 256 <= t64 <= 8192 and t64 % 256 == 0
    # never below the 256 lane quantum, even for huge working sets
    assert _predict_tile_size(10**7, None, n_train=8192, n_lanes=512) == 256
    # explicit max_batch_size bypasses the auto budget
    assert _predict_tile_size(10**7, 2048, n_train=210, n_lanes=64) == 2048


def test_gp_predict_tiled_matches_untiled(fitted_gp, queries):
    gp = fitted_gp
    dm = gp.get_design_matrix(queries)
    t = jnp.asarray(queries)
    d = jnp.asarray(dm)
    mu0, var0 = gp_predict(
        gp._artifacts, gp._data, t, d, gp.kernel, gp.nugget_type,
        unc=True, include_nugget=True, full_cov=False,
    )
    # 103 queries over tile=32 -> 4 tiles with 25 padded lanes
    mu1, var1 = gp_predict_tiled(
        gp._artifacts, gp._data, t, d, gp.kernel, gp.nugget_type,
        unc=True, include_nugget=True, tile=32,
    )
    assert mu1.shape == (103,) and var1.shape == (103,)
    assert_allclose(np.asarray(mu1), np.asarray(mu0), rtol=1e-12)
    assert_allclose(np.asarray(var1), np.asarray(var0), rtol=1e-10)


def test_gp_predict_tiled_no_unc(fitted_gp, queries):
    gp = fitted_gp
    dm = gp.get_design_matrix(queries)
    mu0, none0 = gp_predict_tiled(
        gp._artifacts, gp._data, jnp.asarray(queries), jnp.asarray(dm),
        gp.kernel, gp.nugget_type, unc=False, include_nugget=True, tile=64,
    )
    assert none0 is None
    mu_ref = gp.predict(queries, unc=False)[0]
    assert_allclose(np.asarray(mu0), mu_ref, rtol=1e-12)


def test_predict_max_batch_size_kwarg(fitted_gp, queries):
    ref = fitted_gp.predict(queries)
    chunked = fitted_gp.predict(queries, max_batch_size=40)
    assert_allclose(chunked.mean, ref.mean, rtol=1e-12)
    assert_allclose(chunked.unc, ref.unc, rtol=1e-10)


def test_mogp_predict_max_batch_size(queries):
    rng = np.random.RandomState(3)
    x = rng.uniform(0, 1, size=(20, 3))
    y = np.stack([np.sin((k + 1) * x[:, 0]) + x[:, 1] for k in range(3)])
    np.random.seed(0)
    mgp = fit_GP_MAP(MultiOutputGP(x, y), n_tries=2, maxiter=30)
    ref = mgp.predict(queries)
    chunked = mgp.predict(queries, max_batch_size=48)
    assert_allclose(chunked.mean, ref.mean, rtol=1e-12)
    assert_allclose(chunked.unc, ref.unc, rtol=1e-10)


def test_sharded_predict_chunked(fitted_gp, queries):
    from mogp_tpu.parallel.mesh import auto_mesh
    from mogp_tpu.parallel.sharded import sharded_predict

    mesh = auto_mesh()
    ref = fitted_gp.predict(queries)
    mu, var = sharded_predict(
        fitted_gp, queries, mesh=mesh, max_batch_size=8
    )
    assert_allclose(mu, ref.mean, rtol=1e-12)
    assert_allclose(var, ref.unc, rtol=1e-10)


def test_sharded_predict_mogp_chunked(queries):
    from mogp_tpu.parallel.mesh import auto_mesh
    from mogp_tpu.parallel.sharded import sharded_predict_mogp

    rng = np.random.RandomState(4)
    x = rng.uniform(0, 1, size=(18, 3))
    y = np.stack([np.cos((k + 1) * x[:, 0]) + x[:, 2] for k in range(2)])
    np.random.seed(0)
    mgp = fit_GP_MAP(MultiOutputGP(x, y), n_tries=2, maxiter=30)
    ref = mgp.predict(queries)
    mu, var = sharded_predict_mogp(
        mgp, queries, mesh=auto_mesh(), max_batch_size=8
    )
    assert_allclose(mu, ref.mean, rtol=1e-12)
    assert_allclose(var, ref.unc, rtol=1e-10)
