"""Fixed-shape device MICE: masked-NLP oracle, criterion parity, loop.

Oracle strategy: the masked fixed-shape path must EQUAL the variable
shape path on the observed sub-design (``masked_gp_nlp`` vs ``gp_nlp``,
and ``_mice_score_step`` vs the MICEFastGP/Woodbury criterion of
``uq/sequential_design.py``), plus the two-compiled-programs property
the design exists for (VERDICT r3 #1; reference
``SequentialDesign.py:933-964`` refits from scratch per step).
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax.numpy as jnp

from mogp_tpu import GaussianProcess
from mogp_tpu.models.gp import gp_nlp, make_gp_data
from mogp_tpu.models.priors import GPPriors
from mogp_tpu.ops.kernels import get_kernel
from mogp_tpu.uq.experimental_design import LatinHypercubeDesign
from mogp_tpu.uq.mice_device import (
    DeviceMICEDesign,
    _mice_fit_step,
    _mice_score_step,
    masked_gp_nlp,
)
from mogp_tpu.uq.sequential_design import MICEDesign, MICEFastGP

KERNEL = get_kernel("SquaredExponential")


def _problem(n, D=2, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0, 1, size=(n, D))
    y = np.sin(3 * x[:, 0]) + x[:, 1] ** 2
    return x, y


@pytest.mark.parametrize("nugget_type", ["adaptive", "fit", "fixed"])
@pytest.mark.parametrize("n_obs", [5, 11, 16])
def test_masked_nlp_equals_subdesign_nlp(nugget_type, n_obs):
    n_max, D = 16, 2
    x, y = _problem(n_max, D)
    nugget_value = 1e-6 if nugget_type == "fixed" else 0.0

    priors = GPPriors.default_priors(x[:n_obs], D, nugget_type=nugget_type)
    raw = np.linspace(-0.5, 0.5, D + 1 + (nugget_type == "fit"))

    # variable-shape oracle on the observed sub-design
    dm_sub = np.zeros((n_obs, 0))
    data_sub = make_gp_data(x[:n_obs], y[:n_obs], dm_sub, priors,
                            nugget_value=nugget_value)
    nlp_ref = float(gp_nlp(jnp.asarray(raw), data_sub, KERNEL, nugget_type))

    # fixed-shape masked evaluation (padded rows carry garbage)
    x_pad = x.copy()
    x_pad[n_obs:] = 123.456
    y_pad = y.copy()
    y_pad[n_obs:] = -999.0
    data_pad = make_gp_data(x_pad, y_pad, np.zeros((n_max, 0)), priors,
                            nugget_value=nugget_value)
    mask = jnp.asarray((np.arange(n_max) < n_obs).astype(np.float64))
    nlp_masked = float(
        masked_gp_nlp(jnp.asarray(raw), data_pad, mask, KERNEL, nugget_type)
    )
    assert_allclose(nlp_masked, nlp_ref, rtol=1e-10)


def test_masked_nlp_respects_sparse_ladder():
    n_max, D, n_obs = 12, 2, 8
    x, y = _problem(n_max, D, seed=3)
    priors = GPPriors.default_priors(x[:n_obs], D, nugget_type="adaptive")
    data = make_gp_data(x, y, np.zeros((n_max, 0)), priors)
    mask = jnp.asarray((np.arange(n_max) < n_obs).astype(np.float64))
    raw = jnp.asarray(np.linspace(-0.3, 0.3, D + 1))
    a = float(masked_gp_nlp(raw, data, mask, KERNEL, "adaptive",
                            sparse_ladder=False))
    b = float(masked_gp_nlp(raw, data, mask, KERNEL, "adaptive",
                            sparse_ladder=True))
    # the sparse ladder includes the zero rung: a well-conditioned f64
    # problem selects no jitter under both ladders -> identical values
    assert_allclose(a, b, rtol=1e-10)
    # the "single" ladder ALWAYS applies the 1e-6*mean-diag rung; it must
    # stay a small perturbation of the exact value
    c = float(masked_gp_nlp(raw, data, mask, KERNEL, "adaptive",
                            sparse_ladder="single"))
    assert abs(c - a) < 1e-2 * max(1.0, abs(a))


def test_score_step_matches_micefastgp_criterion():
    """Device criterion == reference-path unc_base/unc_cand at the SAME
    hyperparameters (dense candidate GP, cand_block >= n_cand)."""
    n_max, n_obs, D, n_cand = 14, 10, 2, 12
    x, y = _problem(n_max, D, seed=5)
    rng = np.random.RandomState(9)
    cands = rng.uniform(0, 1, size=(n_cand, D))

    nugget_type = "adaptive"
    priors = GPPriors.default_priors(x[:n_obs], D, nugget_type=nugget_type)
    raw = np.array([0.2, -0.1, 0.4])
    fast_nugget = 1e-4

    # reference path: explicit GaussianProcess + MICEFastGP at raw
    gp = GaussianProcess(x[:n_obs], y[:n_obs], priors=priors,
                         nugget=nugget_type)
    gp.fit(raw)
    unc1 = gp.predict(cands, unc=True)[1]
    mu_ref = gp.predict(cands, unc=False)[0]
    gp_fast = MICEFastGP(cands, np.ones(n_cand), nugget=fast_nugget)
    gp_fast.fit(raw)
    unc2 = gp_fast.fast_predict_all()
    scores_ref = unc1 / unc2

    # device path on padded fixed-shape buffers
    data = make_gp_data(x, y, np.zeros((n_max, 0)), priors)
    mask = jnp.asarray((np.arange(n_max) < n_obs).astype(np.float64))
    scores_dev, mu_dev = _mice_score_step(
        jnp.asarray(raw), data, mask, jnp.asarray(cands[None]),
        jnp.ones((1, n_cand)), jnp.asarray(fast_nugget),
        jnp.asarray(0.0), KERNEL, nugget_type, True,
    )
    assert_allclose(np.asarray(scores_dev), scores_ref, rtol=1e-7)
    assert_allclose(np.asarray(mu_dev), mu_ref, rtol=1e-8, atol=1e-10)


def test_score_step_partial_block_not_contaminated():
    """A padded final block must score its REAL candidates exactly as a
    dense candidate GP on those real candidates alone (padded lanes are
    masked to unit pivots, so duplicate padding cannot deflate the
    block-local LOO variances)."""
    n_max, n_obs, D = 14, 10, 2
    x, y = _problem(n_max, D, seed=6)
    rng = np.random.RandomState(11)
    n_cand, B = 12, 8  # -> blocks of 8 real and 4 real + 4 padded
    cands = rng.uniform(0, 1, size=(n_cand, D))
    priors = GPPriors.default_priors(x[:n_obs], D, nugget_type="adaptive")
    raw = np.array([0.3, 0.0, 0.2])
    fast_nugget = 1e-4

    data = make_gp_data(x, y, np.zeros((n_max, 0)), priors)
    mask = jnp.asarray((np.arange(n_max) < n_obs).astype(np.float64))
    pad = np.tile(cands[:1], (2 * B - n_cand, 1))
    blocks = jnp.asarray(
        np.concatenate([cands, pad], axis=0).reshape(2, B, D)
    )
    cmask = np.zeros(2 * B)
    cmask[:n_cand] = 1.0
    scores_dev, _ = _mice_score_step(
        jnp.asarray(raw), data, mask, blocks,
        jnp.asarray(cmask.reshape(2, B)), jnp.asarray(fast_nugget),
        jnp.asarray(0.0), KERNEL, "adaptive", True,
    )
    scores_dev = np.asarray(scores_dev)[:n_cand]

    # oracle for the partial block: dense candidate GP on its 4 real
    # candidates alone
    gp = GaussianProcess(x[:n_obs], y[:n_obs], priors=priors,
                         nugget="adaptive")
    gp.fit(raw)
    real_tail = cands[B:]
    unc1 = gp.predict(real_tail, unc=True)[1]
    gp_fast = MICEFastGP(real_tail, np.ones(len(real_tail)),
                         nugget=fast_nugget)
    gp_fast.fit(raw)
    scores_ref_tail = unc1 / gp_fast.fast_predict_all()
    assert_allclose(scores_dev[B:], scores_ref_tail, rtol=1e-7)


def test_device_mice_uniform_kernel():
    """Uniform-form kernels have ONE correlation slot; the per-step
    priors must size to the kernel, not the input dimension."""
    md = _run_design(DeviceMICEDesign, n_tries=4, maxiter=50,
                     kernel="UniformSqExp")
    assert md.inputs.shape == (10, 2)
    assert np.all(np.isfinite(md.targets))
    assert md.get_current_theta().shape == (2,)  # 1 corr + 1 cov


def _run_design(cls, seed=42, **kw):
    np.random.seed(seed)
    ed = LatinHypercubeDesign([(0.0, 1.0), (0.0, 1.0)])

    def f(x):
        return np.sin(4 * x[0]) + x[1] ** 2

    md = cls(ed, f, n_samples=4, n_init=6, n_cand=16, **kw)
    md.run_sequential_design()
    return md


def test_device_mice_full_loop_and_shape_count():
    fit0 = _mice_fit_step._cache_size()
    score0 = _mice_score_step._cache_size()
    md = _run_design(DeviceMICEDesign, n_tries=4, maxiter=50)
    assert md.inputs.shape == (10, 2)
    assert md.targets.shape == (10,)
    assert np.all(np.isfinite(md.targets))
    assert md.get_current_theta() is not None
    # the fixed-shape property: ONE new compiled program per step
    # function across the entire 4-acquisition loop
    assert _mice_fit_step._cache_size() - fit0 == 1
    assert _mice_score_step._cache_size() - score0 == 1


def test_device_mice_design_quality_parity():
    """Fill-distance of the device design within a small factor of the
    host MICEDesign's on the same problem (design-quality parity)."""

    def fill_distance(design_pts, grid):
        d = np.linalg.norm(grid[:, None, :] - design_pts[None, :, :], axis=-1)
        return d.min(axis=1).max()

    grid = np.stack(
        np.meshgrid(np.linspace(0, 1, 21), np.linspace(0, 1, 21)), -1
    ).reshape(-1, 2)
    md_dev = _run_design(DeviceMICEDesign, n_tries=4, maxiter=50)
    md_host = _run_design(MICEDesign)
    fd_dev = fill_distance(md_dev.inputs, grid)
    fd_host = fill_distance(md_host.inputs, grid)
    assert fd_dev < 1.5 * fd_host + 0.05


def test_device_mice_blocked_candidates():
    """Block-local candidate LOO (cand_block < n_cand) runs and scores
    finite; selected index in range."""
    md = _run_design(DeviceMICEDesign, n_tries=4, maxiter=50, cand_block=8)
    assert md.inputs.shape == (10, 2)
    assert np.all(np.isfinite(md._last_scores))


def test_device_mice_batch_points():
    np.random.seed(7)
    ed = LatinHypercubeDesign([(0.0, 1.0), (0.0, 1.0)])
    md = DeviceMICEDesign(ed, n_samples=6, n_init=5, n_cand=12, n_tries=4,
                          maxiter=50)
    md.generate_initial_design()
    md.set_initial_targets(
        [np.sin(4 * p[0]) + p[1] ** 2 for p in md.inputs]
    )
    batch = md.get_batch_points(3)
    assert batch.shape == (3, 2)
    assert np.all((batch >= 0) & (batch <= 1))


def test_device_mice_requires_n_max():
    ed = LatinHypercubeDesign([(0.0, 1.0)])
    with pytest.raises(ValueError):
        DeviceMICEDesign(ed, n_samples=None, n_init=4)
    md = DeviceMICEDesign(ed, n_samples=None, n_init=4, n_max=9)
    assert md.n_max == 9


def test_device_mice_rejects_pivot_nugget():
    ed = LatinHypercubeDesign([(0.0, 1.0)])
    with pytest.raises(ValueError, match="pivot"):
        DeviceMICEDesign(ed, n_samples=2, n_init=4, nugget="pivot")


def test_device_mice_mesh_scoring_matches_local():
    """Mesh-sharded candidate-block scoring selects the same design as
    the single-device path (blocks are independent; shard_map only
    distributes them)."""
    import jax

    from mogp_tpu.parallel import auto_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")

    md_local = _run_design(DeviceMICEDesign, n_tries=4, maxiter=50,
                           cand_block=8)
    md_mesh = _run_design(DeviceMICEDesign, n_tries=4, maxiter=50,
                          cand_block=8, mesh=auto_mesh(8))
    assert_allclose(md_mesh.inputs, md_local.inputs, rtol=1e-12)
    assert_allclose(md_mesh._last_scores, md_local._last_scores, rtol=1e-9)


def test_block_local_loo_bounded_deviation():
    """Quantify the block-local LOO approximation (the ``cand_block``
    bullet in the class docstring): block-local scores must stay within
    a measured tolerance of the dense joint-candidate-GP criterion, the
    deviation must SHRINK with block size, and -- the property MICE
    actually relies on -- the candidate the block-local criterion picks
    must be near-optimal under the DENSE criterion (argmax regret).
    Measured values (tools/loo_block_experiment.py, CPU f64): median
    relative deviation 0.026 at B=512 / n_cand=2048, argmax regret 0."""
    rng = np.random.RandomState(0)
    n_obs, D = 20, 2
    x = rng.uniform(0, 1, size=(n_obs, D))
    y = np.sin(3 * x[:, 0]) + x[:, 1] ** 2
    priors = GPPriors.default_priors(x, D, nugget_type="adaptive")
    data = make_gp_data(x, y, np.zeros((n_obs, 0)), priors)
    mask = jnp.ones(n_obs)
    raw = jnp.asarray(np.array([0.5, 0.3, 0.0]))
    fast, zs = jnp.asarray(1e-6), jnp.asarray(0.0)

    n_cand = 2048
    cands = rng.uniform(0, 1, size=(n_cand, D))
    dense, _ = _mice_score_step(
        raw, data, mask, jnp.asarray(cands[None]),
        jnp.ones((1, n_cand)), fast, zs, KERNEL, "adaptive", True,
    )
    dense = np.asarray(dense)
    i_dense = int(np.argmax(dense))

    med_devs = {}
    for B in (256, 512):
        nb = n_cand // B
        bl, _ = _mice_score_step(
            raw, data, mask, jnp.asarray(cands.reshape(nb, B, D)),
            jnp.ones((nb, B)), fast, zs, KERNEL, "adaptive", True,
        )
        bl = np.asarray(bl)
        rel = np.abs(bl - dense) / np.abs(dense)
        med_devs[B] = float(np.median(rel))
        regret = (dense[i_dense] - dense[int(np.argmax(bl))]) / dense[i_dense]
        assert regret < 0.03, (
            "block-local argmax is materially worse than dense (B={}): "
            "regret {}".format(B, regret)
        )
    assert med_devs[512] < 0.08
    # deviation shrinks with block size (the production block, 4096, is
    # 8-16x larger than these)
    assert med_devs[512] < med_devs[256]
