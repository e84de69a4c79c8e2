"""Deep HistoryMatching oracle tests.

Mirrors the coverage of reference ``tests/test_HistoryMatching.py``
(734 LoC): every observation input convention, hand-valued
implausibility oracles (single- and multi-output with discrepancy and
rank selection), NROY/RO partition properties, the full setter/checker
error surface, ``update`` bookkeeping, and ``__str__``.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from mogp_tpu.models.gp import GaussianProcess, PredictResult
from mogp_tpu.uq.history_matching import HistoryMatching


def expectations_1out(ncoords=5, seed=0):
    rng = np.random.RandomState(seed)
    means = rng.uniform(-1.0, 1.0, size=ncoords)
    variances = rng.uniform(0.01, 0.2, size=ncoords)
    return PredictResult(mean=means, unc=variances, deriv=None)


# -- observation conventions --------------------------------------------------


def test_obs_scalar():
    hm = HistoryMatching(obs=1.5)
    assert_allclose(hm.obs[0], [1.5])
    assert_allclose(hm.obs[1], [0.0])
    assert hm.get_n_obs() == 1


def test_obs_single_element_list():
    hm = HistoryMatching(obs=[2.0])
    assert_allclose(hm.obs[0], [2.0])
    assert_allclose(hm.obs[1], [0.0])


def test_obs_mean_and_variance():
    hm = HistoryMatching(obs=[2.0, 0.25])
    assert_allclose(hm.obs[0], [2.0])
    assert_allclose(hm.obs[1], [0.25])


def test_obs_multioutput_arrays():
    hm = HistoryMatching(obs=[np.array([1.0, 2.0, 3.0]),
                              np.array([0.1, 0.2, 0.3])])
    assert hm.get_n_obs() == 3
    assert_allclose(hm.obs[0], [1.0, 2.0, 3.0])
    assert_allclose(hm.obs[1], [0.1, 0.2, 0.3])


def test_obs_failures():
    with pytest.raises(ValueError):
        HistoryMatching(obs=[])
    with pytest.raises(ValueError):
        HistoryMatching(obs=[1.0, 2.0, 3.0])  # more than two entries
    with pytest.raises(AssertionError):
        HistoryMatching(obs=[1.0, -0.5])  # negative variance
    with pytest.raises(AssertionError):
        HistoryMatching(
            obs=[np.array([1.0, 2.0]), np.array([0.1])]
        )  # shape mismatch


# -- implausibility oracles ---------------------------------------------------


def test_implausibility_oracle_single_output():
    exp = expectations_1out(ncoords=6, seed=1)
    z, vz, d = 0.3, 0.04, 0.02
    hm = HistoryMatching(obs=[z, vz], expectations=exp)
    I = hm.get_implausibility(d)
    oracle = np.abs(z - np.asarray(exp[0])) / np.sqrt(
        np.asarray(exp[1]) + vz + d
    )
    assert I.shape == (6,)
    assert_allclose(I, oracle, rtol=1e-12)


def test_implausibility_zero_variances():
    # all-zero variance (no obs error, no discrepancy) still works when
    # prediction variance is positive
    means = np.array([0.0, 1.0, 2.0])
    variances = np.array([1.0, 4.0, 0.25])
    hm = HistoryMatching(obs=1.0,
                         expectations=PredictResult(mean=means, unc=variances,
                                                    deriv=None))
    assert_allclose(hm.get_implausibility(), [1.0, 0.0, 2.0])


def test_implausibility_multioutput_rank_selection():
    # 3 outputs x 4 coords with hand-picked values; default rank=1 is the
    # SECOND-largest per-coordinate implausibility
    means = np.array([
        [0.0, 0.0, 0.0, 0.0],
        [1.0, 2.0, 3.0, 4.0],
        [2.0, 1.0, 0.5, 0.25],
    ])
    variances = np.ones((3, 4))
    z = np.zeros(3)
    hm = HistoryMatching(obs=[z, np.zeros(3)],
                         expectations=PredictResult(mean=means, unc=variances,
                                                    deriv=None))
    I_all = np.abs(means)  # |z - mean| / sqrt(1)
    for rank in (0, 1, 2):
        got = hm.get_implausibility(rank=rank)
        want = np.sort(I_all, axis=0)[::-1][rank]
        assert_allclose(got, want, rtol=1e-12, err_msg=f"rank {rank}")


def test_implausibility_rank_bounds():
    means = np.zeros((2, 3))
    hm = HistoryMatching(obs=[np.zeros(2), np.ones(2)],
                         expectations=PredictResult(mean=means,
                                                    unc=np.ones((2, 3)),
                                                    deriv=None))
    with pytest.raises(AssertionError):
        hm.get_implausibility(rank=2)  # rank must be < n_obs
    with pytest.raises(AssertionError):
        hm.get_implausibility(rank=-1)


def test_implausibility_per_output_discrepancy():
    means = np.array([[1.0, 2.0], [3.0, 4.0]])
    variances = np.full((2, 2), 0.5)
    z = np.array([0.0, 0.0])
    disc = np.array([0.5, 1.5])
    hm = HistoryMatching(obs=[z, np.zeros(2)],
                         expectations=PredictResult(mean=means, unc=variances,
                                                    deriv=None))
    I = hm.get_implausibility(disc, rank=0)
    oracle = np.max(
        np.abs(means) / np.sqrt(variances + disc[:, None]), axis=0
    )
    assert_allclose(I, oracle, rtol=1e-12)


def test_implausibility_negative_discrepancy_rejected():
    hm = HistoryMatching(obs=1.0, expectations=expectations_1out())
    with pytest.raises(AssertionError):
        hm.get_implausibility(-0.1)


def test_implausibility_requires_obs():
    hm = HistoryMatching(expectations=expectations_1out())
    with pytest.raises(ValueError):
        hm.get_implausibility()


def test_implausibility_requires_some_source():
    hm = HistoryMatching(obs=1.0)
    with pytest.raises(ValueError):
        hm.get_implausibility()


def test_expectations_and_gp_both_set_rejected():
    rng = np.random.RandomState(3)
    x = rng.rand(12, 2)
    gp = GaussianProcess(x, np.sin(x[:, 0]), nugget=1e-6)
    gp.fit(np.zeros(gp.n_params))
    hm = HistoryMatching(gp=gp, obs=0.5, coords=rng.rand(4, 2),
                         expectations=expectations_1out(4))
    with pytest.raises(ValueError):
        hm.get_implausibility()


# -- NROY / RO ----------------------------------------------------------------


def test_nroy_ro_partition():
    exp = expectations_1out(ncoords=40, seed=4)
    hm = HistoryMatching(obs=[0.0, 0.1], expectations=exp, threshold=1.0)
    nroy = hm.get_NROY()
    ro = hm.get_RO()
    assert sorted(nroy + ro) == list(range(40))
    assert set(nroy).isdisjoint(ro)
    assert np.all(hm.I[nroy] <= 1.0)
    assert np.all(hm.I[ro] > 1.0)


def test_nroy_threshold_monotone():
    exp = expectations_1out(ncoords=30, seed=5)
    hm_tight = HistoryMatching(obs=[0.0, 0.01], expectations=exp,
                               threshold=0.5)
    hm_loose = HistoryMatching(obs=[0.0, 0.01], expectations=exp,
                               threshold=3.0)
    assert set(hm_tight.get_NROY()) <= set(hm_loose.get_NROY())


def test_nroy_with_gp_end_to_end():
    rng = np.random.RandomState(6)
    x = rng.rand(25, 1)
    y = 2.0 * x[:, 0]
    gp = GaussianProcess(x, y, nugget=1e-6)
    gp.fit(np.array([0.0, 0.0]))
    coords = np.linspace(0.0, 1.0, 21)[:, None]
    # observation z=1.0 -> true NROY region near x=0.5
    hm = HistoryMatching(gp=gp, obs=[1.0, 1e-4], coords=coords)
    nroy = hm.get_NROY()
    assert len(nroy) > 0
    assert np.all(np.abs(coords[nroy, 0] - 0.5) < 0.25)


# -- setters / checkers -------------------------------------------------------


def test_set_gp_validation():
    hm = HistoryMatching()
    with pytest.raises(TypeError):
        hm.set_gp("not a gp")
    rng = np.random.RandomState(7)
    x = rng.rand(10, 2)
    gp = GaussianProcess(x, x[:, 0])
    hm.set_gp(gp)
    assert hm.gp is gp


def test_set_coords_conventions():
    hm = HistoryMatching()
    hm.set_coords(np.ones(5))  # 1D array -> column
    assert hm.coords.shape == (5, 1)
    assert hm.ndim == 1 and hm.ncoords == 5
    hm.set_coords(np.ones((4, 3)))
    assert hm.coords.shape == (4, 3)
    assert hm.ndim == 3 and hm.ncoords == 4
    hm.set_coords([1.0, 2.0, 3.0])  # list -> column
    assert hm.coords.shape == (3, 1)
    hm.set_coords(None)
    assert hm.coords is None
    with pytest.raises(TypeError):
        hm.set_coords(np.ones((2, 2, 2)))  # 3D rejected
    with pytest.raises(TypeError):
        hm.set_coords("abc")


def test_set_expectations_validation():
    hm = HistoryMatching()
    exp = expectations_1out(4)
    hm.set_expectations(exp)
    assert hm.ncoords == 4
    hm.set_expectations(None)
    assert hm.expectations is None
    with pytest.raises(ValueError):
        hm.set_expectations(
            PredictResult(mean=np.zeros(3), unc=np.zeros(4), deriv=None)
        )
    with pytest.raises(AssertionError):
        hm.set_expectations(
            PredictResult(mean=np.zeros(3), unc=-np.ones(3), deriv=None)
        )
    with pytest.raises(TypeError):
        hm.set_expectations("bad")


def test_set_threshold_validation():
    hm = HistoryMatching()
    hm.set_threshold(5)
    assert hm.threshold == 5.0
    with pytest.raises(AssertionError):
        hm.set_threshold(-1.0)
    with pytest.raises(TypeError):
        hm.set_threshold([3.0])


def test_default_threshold_is_three():
    hm = HistoryMatching()
    assert hm.threshold == 3.0


def test_update_sets_ncoords_from_multioutput_expectations():
    # multi-output expectations: ncoords is the number of query points
    # (last axis) — the documented fix of the reference quirk
    means = np.zeros((3, 7))
    hm = HistoryMatching(
        expectations=PredictResult(mean=means, unc=np.ones((3, 7)),
                                   deriv=None)
    )
    assert hm.ncoords == 7


def test_str_smoke():
    hm = HistoryMatching(obs=[1.0, 0.1], expectations=expectations_1out(4))
    s = str(hm)
    assert "History Matching" in s
    assert "I_threshold: 3.0" in s


def test_device_implausibility_sweep_matches_host():
    """The fused on-device top-k implausibility sweep (large-coords
    MultiOutputGP path) must equal the host predict-then-partition
    reduction exactly, including mixed emulator groups, ranks, and
    per-output discrepancies."""
    import mogp_tpu.uq.history_matching as hm_mod
    from mogp_tpu import HistoryMatching, MultiOutputGP, fit_GP_MAP

    rng = np.random.RandomState(17)
    x = rng.uniform(size=(18, 2))
    y = np.stack([
        np.sin(3 * x[:, 0]),
        np.cos(2 * x[:, 1]),
        x[:, 0] * x[:, 1],
        x[:, 0] ** 2,
    ])
    kernels = ["SquaredExponential", "Matern52", "SquaredExponential",
               "Matern52"]
    np.random.seed(2)
    mgp = fit_GP_MAP(MultiOutputGP(x, y, kernel=kernels), n_tries=2,
                     maxiter=30)
    coords = rng.uniform(size=(531, 2))
    obs = [[0.4, 0.3, 0.2, 0.25], [0.01, 0.02, 0.015, 0.01]]

    old_min = hm_mod._DEVICE_SWEEP_MIN_COORDS
    try:
        for rank, disc in [(1, 0.0), (0, 0.05), (2, [0.01, 0.0, 0.02, 0.0])]:
            hm_host = HistoryMatching(gp=mgp, obs=obs, coords=coords)
            hm_mod._DEVICE_SWEEP_MIN_COORDS = 10**12  # force host path
            I_host = hm_host.get_implausibility(discrepancy=disc, rank=rank)

            hm_dev = HistoryMatching(gp=mgp, obs=obs, coords=coords)
            hm_mod._DEVICE_SWEEP_MIN_COORDS = 1      # force device path
            I_dev = hm_dev.get_implausibility(discrepancy=disc, rank=rank)

            np.testing.assert_allclose(I_dev, I_host, rtol=1e-8, atol=1e-10)
    finally:
        hm_mod._DEVICE_SWEEP_MIN_COORDS = old_min


def test_device_implausibility_sweep_sharded_matches_host():
    """The shard_map-fused sweep (mesh path) equals the host reduction."""
    import jax
    import mogp_tpu.uq.history_matching as hm_mod
    from mogp_tpu import HistoryMatching, MultiOutputGP, fit_GP_MAP
    from mogp_tpu.parallel import auto_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")

    rng = np.random.RandomState(23)
    x = rng.uniform(size=(16, 2))
    y = np.stack([np.sin(3 * x[:, 0]), np.cos(2 * x[:, 1]), x[:, 0] ** 2])
    np.random.seed(3)
    mgp = fit_GP_MAP(MultiOutputGP(x, y), n_tries=2, maxiter=30)
    coords = rng.uniform(size=(403, 2))  # not divisible by 8
    obs = [[0.4, 0.3, 0.2], [0.01, 0.02, 0.015]]

    hm_host = HistoryMatching(gp=mgp, obs=obs, coords=coords)
    I_host = hm_host.get_implausibility(rank=1)

    old_min = hm_mod._DEVICE_SWEEP_MIN_COORDS
    try:
        hm_mod._DEVICE_SWEEP_MIN_COORDS = 1
        hm_mesh = HistoryMatching(gp=mgp, obs=obs, coords=coords,
                                  mesh=auto_mesh(8))
        I_mesh = hm_mesh.get_implausibility(rank=1)
    finally:
        hm_mod._DEVICE_SWEEP_MIN_COORDS = old_min
    np.testing.assert_allclose(I_mesh, I_host, rtol=1e-8, atol=1e-10)
