"""Extended fitting-driver surface tests.

Completes the reference ``tests/test_fitting.py`` coverage of the
``fit_GP_MAP`` entry point: every multi-output ``theta0`` convention
(broadcast 1D, per-output 2D, list with ``None`` holes), theta0 shape
rejection grid, argument validation, and refit interaction with
explicit starts (``fitting.py:294-326`` semantics).
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from mogp_tpu import GaussianProcess, MultiOutputGP, fit_GP_MAP

rng = np.random.RandomState(17)
X = rng.rand(20, 2)
Y2 = np.stack([np.sin(3 * X[:, 0]) + X[:, 1],
               np.cos(2 * X[:, 1]) - X[:, 0]])


def n_params_of(mgp):
    return mgp.emulators[0].n_params


def test_mogp_theta0_broadcast_1d():
    np.random.seed(50)
    mgp = MultiOutputGP(X, Y2)
    mgp = fit_GP_MAP(mgp, n_tries=2, theta0=np.zeros(n_params_of(mgp)))
    assert mgp.get_indices_not_fit() == []


def test_mogp_theta0_per_output_2d():
    np.random.seed(51)
    mgp = MultiOutputGP(X, Y2)
    t0 = np.zeros((2, n_params_of(mgp)))
    t0[1] += 0.5
    mgp = fit_GP_MAP(mgp, n_tries=2, theta0=t0)
    assert mgp.get_indices_not_fit() == []


def test_mogp_theta0_list_with_none_holes():
    np.random.seed(52)
    mgp = MultiOutputGP(X, Y2)
    mgp = fit_GP_MAP(mgp, n_tries=2,
                     theta0=[None, np.zeros(n_params_of(mgp))])
    assert mgp.get_indices_not_fit() == []


def test_mogp_theta0_bad_shapes():
    mgp = MultiOutputGP(X, Y2)
    P = n_params_of(mgp)
    with pytest.raises(AssertionError):
        fit_GP_MAP(mgp, theta0=np.zeros((3, P)))  # wrong output count
    with pytest.raises(AssertionError):
        fit_GP_MAP(mgp, theta0=np.zeros((2, 1)))  # wrong param count
    with pytest.raises(AssertionError):
        fit_GP_MAP(mgp, theta0=np.zeros((1, 1, 1)))  # 3D
    with pytest.raises(AssertionError):
        fit_GP_MAP(mgp, theta0=[np.zeros(P)])  # wrong list length
    with pytest.raises(AssertionError):
        fit_GP_MAP(mgp, theta0=[np.zeros(1), np.zeros(2)])  # bad entries


def test_n_tries_validation():
    gp = GaussianProcess(X, Y2[0])
    mgp = MultiOutputGP(X, Y2)
    with pytest.raises(AssertionError):
        fit_GP_MAP(gp, n_tries=-1)
    with pytest.raises(AssertionError):
        fit_GP_MAP(mgp, n_tries=0)


def test_method_fallback_warns():
    """Non-device methods warn and fall back to batched L-BFGS (this
    framework's documented deviation from scipy method dispatch)."""
    np.random.seed(57)
    gp = GaussianProcess(X, Y2[0])
    with pytest.warns(UserWarning, match="not available on device"):
        fit_GP_MAP(gp, n_tries=1, method="Simplex")
    assert gp.theta.get_data() is not None


def test_single_positional_arg_must_be_gp():
    with pytest.raises(TypeError):
        fit_GP_MAP(np.zeros((5, 2)))


def test_refit_with_explicit_theta0_preserves_fit_emulators():
    """refit=False leaves fitted emulators at their current parameters
    even when theta0 is supplied (fitting.py:319-326)."""
    np.random.seed(53)
    mgp = MultiOutputGP(X, Y2)
    P = n_params_of(mgp)
    mgp.emulators[0].fit(np.ones(P))
    mgp = fit_GP_MAP(mgp, n_tries=1, theta0=np.zeros(P), refit=False)
    assert_allclose(mgp.emulators[0].theta.get_data(), np.ones(P))
    assert mgp.emulators[1].theta.get_data() is not None
    # with refit=True the pre-set parameters are replaced
    np.random.seed(53)
    mgp = fit_GP_MAP(mgp, n_tries=1, theta0=np.zeros(P), refit=True)
    assert not np.allclose(mgp.emulators[0].theta.get_data(), np.ones(P))


def test_single_gp_theta0_used_as_first_start():
    """With n_tries=1 and an explicit start the optimizer must begin
    there: fitting an already-optimal GP again from its solution cannot
    worsen the log posterior."""
    np.random.seed(54)
    gp = fit_GP_MAP(GaussianProcess(X, Y2[0]), n_tries=3)
    lp1 = gp.current_logpost
    gp2 = fit_GP_MAP(GaussianProcess(X, Y2[0]), n_tries=1,
                     theta0=np.asarray(gp.theta.get_data()))
    assert gp2.current_logpost <= lp1 + 1e-3


def test_constructor_kwargs_forwarded():
    np.random.seed(55)
    gp = fit_GP_MAP(X, Y2[0], nugget=1e-4, kernel="Matern52", n_tries=2)
    assert isinstance(gp, GaussianProcess)
    assert gp.nugget_type == "fixed"
    assert gp.nugget == pytest.approx(1e-4)
    assert type(gp.kernel).__name__ == "Matern52"


def test_fit_returns_same_object():
    np.random.seed(56)
    gp = GaussianProcess(X, Y2[0])
    out = fit_GP_MAP(gp, n_tries=2)
    assert out is gp
    mgp = MultiOutputGP(X, Y2)
    out = fit_GP_MAP(mgp, n_tries=2)
    assert out is mgp


def test_race_plan_stages():
    from mogp_tpu.models.fitting import _race_plan

    # off / not worthwhile
    assert _race_plan(15, 50, False) is None
    assert _race_plan(3, 50, True) is None
    assert _race_plan(15, 10, True) is None
    # default plan: list of (iters, keep) cut stages + final (iters, None)
    plan = _race_plan(15, 50, True)
    assert isinstance(plan, list) and plan[-1][1] is None
    assert all(it > 0 for it, _ in plan)
    keeps = [k for _, k in plan[:-1]]
    assert all(keeps[i] >= keeps[i + 1] for i in range(len(keeps) - 1))


def test_race_stages_env_override(monkeypatch):
    from mogp_tpu.models.fitting import _race_plan

    monkeypatch.setenv("MOGP_TPU_RACE_STAGES", "16:6,10:3")
    plan = _race_plan(15, 50, True)
    assert plan == [(16, 6), (10, 3), (24, None)]
    # final stage floored at 12 iterations
    monkeypatch.setenv("MOGP_TPU_RACE_STAGES", "30:6,18:3")
    plan = _race_plan(15, 50, True)
    assert plan[-1] == (12, None)


def test_race_stages_env_fit_end_to_end(monkeypatch):
    monkeypatch.setenv("MOGP_TPU_RACE_STAGES", "8:4,6:2")
    np.random.seed(77)
    mgp = fit_GP_MAP(MultiOutputGP(X, Y2), n_tries=5, maxiter=30)
    assert mgp.get_indices_not_fit() == []


def test_ladder_escalation_single(monkeypatch):
    """When every restart is non-finite under the reduced trajectory
    ladder (f32 + near-duplicate inputs in production), the fit retries
    with the full reference ladder before declaring failure."""
    import jax.numpy as jnp

    from mogp_tpu.models import fitting as F

    orig = F._batched_fit_single

    def fail_reduced(starts, data, kernel, nugget_type, maxiter, gtol,
                     ftol, ladder):
        res = orig(starts, data, kernel, nugget_type, maxiter, gtol, ftol,
                   ladder)
        if ladder is not False:
            return res._replace(fun=jnp.full_like(res.fun, jnp.nan))
        return res

    monkeypatch.setattr(F, "_batched_fit_single", fail_reduced)
    np.random.seed(91)
    gp = fit_GP_MAP(GaussianProcess(X, Y2[0], nugget="adaptive"), n_tries=3,
                    maxiter=30)
    assert gp.theta.get_data() is not None


def test_ladder_escalation_mogp(monkeypatch):
    import jax.numpy as jnp

    from mogp_tpu.models import fitting as F

    orig = F._batched_fit_multi

    def fail_reduced(starts, data, kernel, nugget_type, maxiter, gtol,
                     ftol, ladder):
        res = orig(starts, data, kernel, nugget_type, maxiter, gtol, ftol,
                   ladder)
        if ladder is not False:
            return res._replace(fun=jnp.full_like(res.fun, jnp.nan))
        return res

    monkeypatch.setattr(F, "_batched_fit_multi", fail_reduced)
    np.random.seed(92)
    mgp = fit_GP_MAP(MultiOutputGP(X, Y2, nugget="adaptive"), n_tries=3,
                     maxiter=30)
    assert mgp.get_indices_not_fit() == []


def test_linesearch_carries_shrunken_step_before_history():
    """A lane whose acceptable step is far below the unit-length start
    must still make progress under the low trial cap: the capped-out
    search's shrunken step warm-starts the NEXT iteration even before
    any curvature pair is stored (n_hist == 0).  Objective: quadratic
    toward x=1 with a NaN cliff at x > 1e-4, started at 0 -- every
    per-iteration ladder restarted at t0 = 1/||d|| would never reach
    the 1e-4-wide finite region with 2 trials/iteration."""
    import jax.numpy as jnp

    from mogp_tpu.ops.lbfgs import lbfgs_minimize

    def f(x):
        v = (x[0] - 1.0) ** 2
        return jnp.where(x[0] <= 1e-4, v, jnp.nan)

    res = lbfgs_minimize(f, jnp.zeros(1), maxiter=30, max_linesearch=2)
    # progress into the finite sliver (f(0) == 1 exactly at the start)
    assert float(res.fun) < 1.0 - 1e-5
    assert 0.0 < float(res.x[0]) <= 1e-4
