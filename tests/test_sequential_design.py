"""Deep SequentialDesign / MICEDesign oracle tests.

Mirrors the coverage of reference ``tests/test_SequentialDesign.py``
(943 LoC): constructor validation, bookkeeping accessors, the full
initial-design / next-point / batch-points state machine with its error
surface, ``.npz`` persistence edge cases, the MICE criterion against an
explicit numpy oracle, and the Woodbury LOO identity for every index.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from mogp_tpu.models.gp import GaussianProcess
from mogp_tpu.models.priors import GPPriors
from mogp_tpu.uq.experimental_design import (
    LatinHypercubeDesign,
    MonteCarloDesign,
)
from mogp_tpu.uq.sequential_design import (
    MICEDesign,
    MICEFastGP,
    SequentialDesign,
)


def f_sim(x):
    return np.sum(x**2)


# -- constructor --------------------------------------------------------------


def test_init_defaults_and_accessors():
    ed = LatinHypercubeDesign(3)
    sd = SequentialDesign(ed)
    assert sd.get_n_parameters() == 3
    assert sd.get_n_init() == 10
    assert sd.get_n_cand() == 50
    assert sd.get_n_samples() is None
    assert sd.get_current_iteration() == 0
    assert sd.get_inputs() is None
    assert sd.get_targets() is None
    assert sd.get_candidates() is None
    assert not sd.has_function()
    assert sd.get_base_design() == "LatinHypercubeDesign"


def test_init_explicit_args():
    ed = MonteCarloDesign(2)
    sd = SequentialDesign(ed, f_sim, n_samples=5, n_init=4, n_cand=7)
    assert sd.has_function()
    assert sd.get_n_samples() == 5
    assert sd.get_n_init() == 4
    assert sd.get_n_cand() == 7
    assert sd.get_base_design() == "MonteCarloDesign"


def test_init_failures():
    ed = LatinHypercubeDesign(2)
    with pytest.raises(TypeError):
        SequentialDesign("not a design")
    with pytest.raises(TypeError):
        SequentialDesign(ed, f="not callable")
    with pytest.raises(ValueError):
        # simulator must take a single argument
        SequentialDesign(ed, f=lambda a, b: a + b)
    with pytest.raises(ValueError):
        SequentialDesign(ed, n_samples=-1)
    with pytest.raises(ValueError):
        SequentialDesign(ed, n_init=0)
    with pytest.raises(ValueError):
        SequentialDesign(ed, n_cand=0)


# -- initial design state machine ---------------------------------------------


def test_generate_initial_design():
    np.random.seed(100)
    sd = SequentialDesign(LatinHypercubeDesign(2), n_init=6)
    inputs = sd.generate_initial_design()
    assert inputs.shape == (6, 2)
    assert np.all((inputs >= 0.0) & (inputs <= 1.0))
    assert sd.get_current_iteration() == 6
    # regenerating after initialization is an error
    sd.set_initial_targets(np.zeros(6))
    with pytest.raises(AssertionError):
        sd.generate_initial_design()


def test_set_initial_targets_validation():
    np.random.seed(101)
    sd = SequentialDesign(LatinHypercubeDesign(2), n_init=4)
    with pytest.raises(ValueError):
        sd.set_initial_targets(np.zeros(4))  # no inputs yet
    sd.generate_initial_design()
    with pytest.raises(AssertionError):
        sd.set_initial_targets(np.zeros(3))  # wrong length
    # (n_init, 1) column targets are squeezed like the reference
    sd.set_initial_targets(np.arange(4.0)[:, None])
    assert sd.get_targets().shape == (4,)
    assert sd.initialized


def test_run_initial_design_requires_function():
    sd = SequentialDesign(LatinHypercubeDesign(2), n_init=3)
    with pytest.raises(AssertionError):
        sd.run_initial_design()


def test_run_initial_design_evaluates_simulator():
    np.random.seed(102)
    sd = SequentialDesign(LatinHypercubeDesign(2), f_sim, n_init=5)
    sd.run_initial_design()
    assert_allclose(
        sd.get_targets(), np.sum(sd.get_inputs() ** 2, axis=1), rtol=1e-12
    )


# -- next-point / target state machine ----------------------------------------


def test_get_next_point_errors():
    sd = SequentialDesign(LatinHypercubeDesign(2), n_init=3)
    with pytest.raises(ValueError):
        sd.get_next_point()  # no inputs
    sd.generate_initial_design()
    with pytest.raises(ValueError):
        sd.get_next_point()  # no targets
    with pytest.raises(AssertionError):
        sd.set_next_target(1.0)  # inputs were never extended by a next point


def test_base_eval_metric_not_implemented():
    np.random.seed(103)
    sd = SequentialDesign(LatinHypercubeDesign(2), n_init=3)
    sd.generate_initial_design()
    sd.set_initial_targets(np.zeros(3))
    with pytest.raises(NotImplementedError):
        sd.get_next_point()
    with pytest.raises(NotImplementedError):
        sd._estimate_next_target(np.zeros(2))


def test_set_next_target_shape_checks():
    np.random.seed(104)
    md = MICEDesign(LatinHypercubeDesign(2), n_init=5, n_cand=8)
    md.generate_initial_design()
    md.set_initial_targets(np.linspace(0.0, 1.0, 5))
    pt = md.get_next_point()
    assert pt.shape == (2,)
    assert md.get_inputs().shape == (6, 2)
    with pytest.raises(AssertionError):
        md.set_next_target(np.array([1.0, 2.0]))  # must have length 1
    md.set_next_target(0.5)
    assert md.get_current_iteration() == 6
    assert md.get_targets().shape == (6,)
    # a second set_next_target without a new point is a state error
    with pytest.raises(AssertionError):
        md.set_next_target(0.5)


def test_mice_next_point_comes_from_candidates():
    np.random.seed(105)
    md = MICEDesign(LatinHypercubeDesign(2), n_init=6, n_cand=12)
    md.generate_initial_design()
    md.set_initial_targets(np.sin(3 * md.get_inputs()[:, 0]))
    pt = md.get_next_point()
    cands = md.get_candidates()
    assert cands.shape == (12, 2)
    assert np.min(np.sum((cands - pt) ** 2, axis=1)) < 1e-24


def test_batch_points_state_and_restore():
    """get_batch_points must leave current_iteration/targets at the
    pre-batch state (estimated targets stripped)."""
    np.random.seed(106)
    md = MICEDesign(LatinHypercubeDesign(2), f_sim, n_init=5, n_cand=8)
    md.run_initial_design()
    t_before = md.get_targets().copy()
    batch = md.get_batch_points(3)
    assert batch.shape == (3, 2)
    assert md.get_current_iteration() == 5
    assert_allclose(md.get_targets(), t_before)
    assert md.get_inputs().shape == (8, 2)
    # supplying real targets completes the batch
    md.set_batch_targets(np.array([f_sim(b) for b in batch]))
    assert md.get_current_iteration() == 8
    with pytest.raises(AssertionError):
        md.get_batch_points(0)


def test_set_batch_targets_wrong_length():
    np.random.seed(107)
    md = MICEDesign(LatinHypercubeDesign(2), f_sim, n_init=5, n_cand=8)
    md.run_initial_design()
    md.get_batch_points(2)
    with pytest.raises(AssertionError):
        md.set_batch_targets(np.zeros(3))


def test_run_sequential_design_needs_n_samples():
    md = MICEDesign(LatinHypercubeDesign(2), f_sim, n_init=4, n_cand=6)
    with pytest.raises(ValueError):
        md.run_sequential_design()


def test_str_contains_state():
    md = MICEDesign(LatinHypercubeDesign(2), f_sim, n_samples=3, n_init=4,
                    n_cand=6)
    s = str(md)
    assert "MICEDesign" in s
    assert "LatinHypercubeDesign" in s
    assert "bound simulator function" in s
    assert "3 total samples" in s
    assert "4 initial points" in s
    assert "6 candidate points" in s


# -- persistence --------------------------------------------------------------


def test_save_load_empty_design(tmp_path):
    sd = SequentialDesign(LatinHypercubeDesign(2), n_init=4)
    fname = str(tmp_path / "empty.npz")
    sd.save_design(fname)
    sd2 = SequentialDesign(LatinHypercubeDesign(2), n_init=4)
    sd2.load_design(fname)
    assert sd2.get_inputs() is None
    assert sd2.get_targets() is None
    assert sd2.get_candidates() is None
    assert not sd2.initialized


def test_save_load_inputs_only(tmp_path):
    np.random.seed(108)
    sd = SequentialDesign(LatinHypercubeDesign(3), n_init=5)
    sd.generate_initial_design()
    fname = str(tmp_path / "inputs_only.npz")
    sd.save_design(fname)
    sd2 = SequentialDesign(LatinHypercubeDesign(3), n_init=5)
    sd2.load_design(fname)
    assert_allclose(sd2.get_inputs(), sd.get_inputs())
    assert sd2.get_targets() is None
    assert not sd2.initialized


def test_load_design_dimension_mismatch(tmp_path):
    np.random.seed(109)
    sd = SequentialDesign(LatinHypercubeDesign(3), n_init=5)
    sd.generate_initial_design()
    fname = str(tmp_path / "d3.npz")
    sd.save_design(fname)
    sd2 = SequentialDesign(LatinHypercubeDesign(2), n_init=5)
    with pytest.raises(AssertionError):
        sd2.load_design(fname)  # base design dimension differs


def test_load_design_partial_targets(tmp_path):
    """Targets shorter than inputs (mid-acquisition save) restore the
    iteration counter from the targets length."""
    np.random.seed(110)
    md = MICEDesign(LatinHypercubeDesign(2), n_init=5, n_cand=8)
    md.generate_initial_design()
    md.set_initial_targets(np.arange(5.0))
    md.get_next_point()  # inputs now 6 rows, targets still 5
    fname = str(tmp_path / "partial.npz")
    md.save_design(fname)
    md2 = MICEDesign(LatinHypercubeDesign(2), n_init=5, n_cand=8)
    md2.load_design(fname)
    assert md2.get_inputs().shape == (6, 2)
    assert md2.get_current_iteration() == 5
    assert md2.initialized
    # the restored design can continue: supply the pending target
    md2.set_next_target(1.5)
    assert md2.get_current_iteration() == 6


# -- MICEDesign specifics ------------------------------------------------------


def test_mice_init_validation():
    ed = LatinHypercubeDesign(2)
    md = MICEDesign(ed, nugget=1e-6, nugget_s=2.0)
    assert md.get_nugget() == pytest.approx(1e-6)
    assert md.get_nugget_s() == pytest.approx(2.0)
    assert MICEDesign(ed).get_nugget() == "adaptive"
    with pytest.raises(ValueError):
        MICEDesign(ed, nugget=-1.0)
    with pytest.raises(ValueError):
        MICEDesign(ed, nugget_s=-1.0)
    with pytest.raises(TypeError):
        MICEDesign(ed, nugget=[1.0])


def test_mice_criterion_oracle():
    """_MICE_criterion equals predict-variance / LOO-variance computed
    with independent numpy linear algebra."""
    np.random.seed(111)
    md = MICEDesign(LatinHypercubeDesign(2), n_init=8, n_cand=6,
                    nugget=1e-6, nugget_s=1.0)
    md.generate_initial_design()
    md.set_initial_targets(np.sin(4 * md.get_inputs()[:, 0])
                           + md.get_inputs()[:, 1])
    md._generate_candidates()
    md._eval_metric()  # fits self.gp / self.gp_fast

    for j in [0, 3, 5]:
        crit = md._MICE_criterion(j)
        _, unc1, _ = md.gp.predict(md.get_candidates()[j], unc=True)
        unc2_oracle = _loo_variance_oracle(md.gp_fast, j)
        unc1 = float(np.asarray(unc1).ravel()[0])
        assert_allclose(crit, unc1 / unc2_oracle, rtol=1e-5)

    with pytest.raises(AssertionError):
        md._MICE_criterion(-1)
    with pytest.raises(AssertionError):
        md._MICE_criterion(6)


def _loo_variance_oracle(gp_fast, idx):
    """Explicit-inverse numpy oracle for the Woodbury LOO variance."""
    X = np.asarray(gp_fast._data.inputs)
    cov = float(gp_fast.theta.cov)
    nugget = float(gp_fast.nugget)
    corr_raw = np.asarray(gp_fast.theta.corr_raw)
    C = cov * np.asarray(
        gp_fast.kernel.kernel_f(X, X, corr_raw)
    )
    Q = C + nugget * np.eye(len(X))
    mask = np.arange(len(X)) != idx
    k = C[mask, idx]
    Qmm = Q[np.ix_(mask, mask)]
    return float(cov + nugget - k @ np.linalg.solve(Qmm, k))


def test_mice_fast_predict_all_indices():
    """Woodbury LOO identity holds for EVERY index at once."""
    np.random.seed(112)
    X = np.random.rand(15, 3)
    nugget = 0.05
    gp_fast = MICEFastGP(X, np.ones(15), nugget=nugget)
    theta = np.array([0.3, -0.2, 0.1, 0.4])
    gp_fast.fit(theta)
    got = gp_fast.fast_predict_all()
    want = np.array([_loo_variance_oracle(gp_fast, i) for i in range(15)])
    assert_allclose(got, want, rtol=1e-8)


def test_mice_estimate_next_target_matches_prediction():
    np.random.seed(113)
    md = MICEDesign(LatinHypercubeDesign(2), n_init=8, n_cand=6)
    md.generate_initial_design()
    targets = 5.0 + 3.0 * np.cos(3 * md.get_inputs()[:, 0])
    md.set_initial_targets(targets)
    pt = md.get_next_point()
    est = md._estimate_next_target(pt)
    mu = md.gp.predict(pt)[0] * md._t_std + md._t_mean
    assert_allclose(np.asarray(est), np.asarray(mu), rtol=1e-10)
    with pytest.raises(AssertionError):
        md._estimate_next_target(np.zeros(3))
