"""MeanFunction AST edge-case grid: composite/power/product derivatives.

Deep L1 coverage in the reference's style (``tests/test_MeanFunction.py``):
every composite node type is exercised with FD-checked parameter
derivatives, Hessians, and input derivatives, including the tricky cases
(Coefficient exponents, composition of parametric functions, powers of
composites, formula-built trees).
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from mogp_tpu.models.formula import mean_from_string
from mogp_tpu.models.meanfunction import (
    Coefficient,
    ConstantMean,
    FixedMean,
    LinearMean,
    MeanComposite,
    MeanPower,
    MeanProduct,
    MeanSum,
    PolynomialMean,
)

rng = np.random.RandomState(77)
X = rng.uniform(0.3, 1.7, size=(6, 3))  # positive: safe under powers


def fd_param_deriv(mf, x, params, eps=1e-6):
    out = np.empty((len(params), len(x)))
    for i in range(len(params)):
        pp, pm = params.copy(), params.copy()
        pp[i] += eps
        pm[i] -= eps
        out[i] = (mf(x, pp) - mf(x, pm)) / (2 * eps)
    return out


def fd_input_deriv(mf, x, params, eps=1e-6):
    out = np.empty((x.shape[1], len(x)))
    for d in range(x.shape[1]):
        xp, xm = x.copy(), x.copy()
        xp[:, d] += eps
        xm[:, d] -= eps
        out[d] = (mf(xp, params) - mf(xm, params)) / (2 * eps)
    return out


def make_edge_cases():
    c = Coefficient
    return [
        # sums/products of parametric nodes
        ("sum_of_coeffs", c() + c() + c(), 3),
        ("product_of_coeffs", c() * c(), 2),
        ("coeff_times_sum", c() * (LinearMean(0) + LinearMean(2)), 1),
        ("product_two_linear", (c() * LinearMean(0)) * (c() * LinearMean(1)), 2),
        # powers: fixed exponent, integer exponent, coefficient exponent
        ("power_fixed", (c() * LinearMean(0)) ** 2.0, 1),
        ("power_of_sum", (c() + LinearMean(1)) ** 3.0, 1),
        ("power_coeff_exponent", LinearMean(0) ** c(), 1),
        # composition: outer(inner)
        ("composite_linear", (LinearMean(0) ** 2.0)(c() * LinearMean(1)), 1),
        ("composite_parametric", (c() * LinearMean(0))(c() * LinearMean(2)), 2),
        # polynomial and mixtures
        ("polynomial", PolynomialMean(2), 7),
        ("poly_plus_coeff", PolynomialMean(1) + c() * LinearMean(2) ** 2.0, 5),
        # fixed mean interactions
        ("fixed_plus_coeff", FixedMean(lambda x: x[:, 0] ** 2) + c(), 1),
        # callable must be jnp-traceable for input derivatives (autodiff)
        ("fixed_times_coeff", FixedMean(lambda x: x[:, 1] ** 3) * c(), 1),
    ]


@pytest.mark.parametrize("name,mf,n_params",
                         [(n, m, p) for n, m, p in make_edge_cases()],
                         ids=[n for n, _, _ in make_edge_cases()])
def test_n_params_and_eval_finite(name, mf, n_params):
    assert mf.get_n_params(X) == n_params
    params = rng.uniform(0.5, 1.5, size=n_params)
    vals = mf(X, params)
    assert vals.shape == (len(X),)
    assert np.all(np.isfinite(vals))


@pytest.mark.parametrize("name,mf,n_params",
                         [(n, m, p) for n, m, p in make_edge_cases()],
                         ids=[n for n, _, _ in make_edge_cases()])
def test_mean_deriv_fd(name, mf, n_params):
    params = rng.uniform(0.5, 1.5, size=n_params)
    deriv = mf.mean_deriv(X, params)
    assert deriv.shape == (n_params, len(X))
    assert_allclose(deriv, fd_param_deriv(mf, X, params), rtol=2e-5,
                    atol=1e-7)


@pytest.mark.parametrize("name,mf,n_params",
                         [(n, m, p) for n, m, p in make_edge_cases()],
                         ids=[n for n, _, _ in make_edge_cases()])
def test_mean_inputderiv_fd(name, mf, n_params):
    params = rng.uniform(0.5, 1.5, size=n_params)
    dx = mf.mean_inputderiv(X, params)
    assert dx.shape == (X.shape[1], len(X))
    assert_allclose(dx, fd_input_deriv(mf, X, params), rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize(
    "name,mf,n_params",
    [(n, m, p) for n, m, p in make_edge_cases() if p > 0],
    ids=[n for n, _, p in make_edge_cases() if p > 0])
def test_mean_hessian_fd(name, mf, n_params):
    params = rng.uniform(0.5, 1.5, size=n_params)
    hess = mf.mean_hessian(X, params)
    assert hess.shape == (n_params, n_params, len(X))
    eps = 1e-5
    for i in range(n_params):
        pp, pm = params.copy(), params.copy()
        pp[i] += eps
        pm[i] -= eps
        fd = (mf.mean_deriv(X, pp) - mf.mean_deriv(X, pm)) / (2 * eps)
        assert_allclose(hess[i], fd, rtol=5e-4, atol=5e-6)
    assert_allclose(hess, np.swapaxes(hess, 0, 1), rtol=1e-8, atol=1e-10)


def test_node_types_from_operators():
    """Operator overloads build the documented node types."""
    c = Coefficient()
    assert isinstance(c + c, MeanSum)
    assert isinstance(c * c, MeanProduct)
    assert isinstance(c ** 2.0, MeanPower)
    assert isinstance(LinearMean(0)(c), MeanComposite)


def test_scalar_promotion():
    """Python scalars in operators promote to ConstantMean."""
    mf = 2.0 + Coefficient() * 3.0
    assert mf.get_n_params(X) == 1
    assert_allclose(mf(X, np.array([1.5])), 2.0 + 4.5, rtol=1e-12)
    mf2 = LinearMean(0) ** 2
    assert_allclose(mf2(X, np.array([])), X[:, 0] ** 2, rtol=1e-12)


def test_formula_edge_grid():
    """Formula strings building each edge shape evaluate correctly."""
    cases = [
        ("a*x[0] + b*x[1] + c", 3,
         lambda x, p: p[0] * x[:, 0] + p[1] * x[:, 1] + p[2]),
        ("(a + x[0])^2", 1, lambda x, p: (p[0] + x[:, 0]) ** 2),
        ("a*x[0]*x[1]*x[2]", 1,
         lambda x, p: p[0] * x[:, 0] * x[:, 1] * x[:, 2]),
        ("x[0]^3 + x[1]^2 + 1", 0,
         lambda x, p: x[:, 0] ** 3 + x[:, 1] ** 2 + 1.0),
        ("I(x[0] + x[1])^2", 0, lambda x, p: (x[:, 0] + x[:, 1]) ** 2),
    ]
    for formula, n_params, oracle in cases:
        mf = mean_from_string(formula)
        assert mf.get_n_params(X) == n_params, formula
        params = rng.uniform(0.5, 1.5, size=n_params)
        assert_allclose(mf(X, params), oracle(X, params), rtol=1e-10,
                        err_msg=formula)


def test_formula_inputdict_mapping():
    mf = mean_from_string("a + width*height", {"width": 0, "height": 2})
    assert mf.get_n_params(X) == 1
    assert_allclose(mf(X, np.array([2.0])), 2.0 + X[:, 0] * X[:, 2],
                    rtol=1e-12)


def test_deeply_nested_composition():
    """outer(inner(innermost)) chains evaluate by substitution."""
    inner = Coefficient() * LinearMean(0)
    mid = LinearMean(0) ** 2.0
    outer = LinearMean(0) + ConstantMean(1.0)
    comp = outer(mid(inner))
    params = np.array([3.0])
    assert_allclose(comp(X, params), (3.0 * X[:, 0]) ** 2 + 1.0, rtol=1e-10)


def test_power_exponent_derivative():
    """d/dc [x^c] = x^c log x -- the Coefficient-exponent branch."""
    mf = LinearMean(0) ** Coefficient()
    params = np.array([1.7])
    deriv = mf.mean_deriv(X, params)
    expect = X[:, 0] ** 1.7 * np.log(X[:, 0])
    assert_allclose(deriv[0], expect, rtol=1e-7)


def test_categorical_main_effect_treatment_coding():
    """C(x[i]) dummy-codes levels, dropping the first under an intercept
    (patsy treatment coding, GaussianProcess.py:505)."""
    import numpy as np

    from mogp_tpu.models.meanfun import design_matrix

    x = np.array([[0.1, 0.0], [0.2, 1.0], [0.3, 2.0], [0.4, 1.0]])
    dm = design_matrix("C(x[1])", x)
    # intercept + (3 levels - 1) indicators
    assert dm.shape == (4, 3)
    assert_allclose(dm[:, 0], 1.0)
    assert_allclose(dm[:, 1], [0.0, 1.0, 0.0, 1.0])  # level 1
    assert_allclose(dm[:, 2], [0.0, 0.0, 1.0, 0.0])  # level 2
    # no intercept -> full dummy coding
    dm0 = design_matrix("C(x[1]) - 1", x)
    assert dm0.shape == (4, 3)
    assert_allclose(dm0.sum(axis=1), 1.0)


def test_categorical_levels_bound_at_construction():
    """Levels captured in the state dict are reused at prediction and a
    value outside them raises (patsy design_info semantics)."""
    import numpy as np
    import pytest

    from mogp_tpu.models.meanfun import design_matrix

    x = np.array([[0.1, 0.0], [0.2, 1.0], [0.3, 2.0]])
    state = {}
    design_matrix("C(x[1])", x, state=state)
    assert_allclose(state["C(x[1])"], [0.0, 1.0, 2.0])
    # subset of levels at predict keeps the full training column count
    dm = design_matrix("C(x[1])", x[:1], state=state)
    assert dm.shape == (1, 3)
    with pytest.raises(ValueError, match="outside its bound levels"):
        design_matrix("C(x[1])", np.array([[0.0, 7.0]]), state=state)
    # explicit levels pin the binding without seeing the data
    dm5 = design_matrix("C(x[1], levels=[0, 1, 2, 3])", x, state={})
    assert dm5.shape == (3, 4)


def test_categorical_interaction_full_coding():
    """x[j]:C(x[i]) keeps FULL dummies (a dropped level would silence
    the interaction at the baseline level)."""
    import numpy as np

    from mogp_tpu.models.meanfun import design_matrix

    x = np.array([[0.5, 0.0], [0.25, 1.0], [0.75, 1.0]])
    dm = design_matrix("x[0]:C(x[1])", x)
    assert dm.shape == (3, 3)  # intercept + 2 full-dummy interactions
    assert_allclose(dm[:, 1], [0.5, 0.0, 0.0])   # x0 * 1[level 0]
    assert_allclose(dm[:, 2], [0.0, 0.25, 0.75])  # x0 * 1[level 1]


def test_categorical_gp_end_to_end():
    """A GP with a categorical mean recovers level offsets and carries
    the level binding through predict."""
    import numpy as np

    from mogp_tpu import GaussianProcess, fit_GP_MAP

    rng = np.random.RandomState(0)
    n = 50
    xc = rng.choice([0.0, 1.0, 2.0], size=n)
    x0 = rng.uniform(size=n)
    Xtr = np.stack([x0, xc], axis=1)
    off = np.array([0.0, 2.0, -1.5])
    y = np.sin(3 * x0) + off[xc.astype(int)] + 0.01 * rng.randn(n)
    np.random.seed(42)  # restart draws come from the global stream
    gp = fit_GP_MAP(
        GaussianProcess(Xtr, y, mean="x[0] + C(x[1])", nugget="adaptive"),
        n_tries=3, maxiter=50,
    )
    assert gp.n_mean == 4  # intercept + x0 + 2 level offsets
    Xt = np.stack(
        [rng.uniform(size=20), rng.choice([0.0, 1.0, 2.0], size=20)], axis=1
    )
    yt = np.sin(3 * Xt[:, 0]) + off[Xt[:, 1].astype(int)]
    mu, _, _ = gp.predict(Xt)
    assert np.sqrt(np.mean((mu - yt) ** 2)) < 0.3
    # level offsets recovered (relative to level-0 baseline)
    assert_allclose(gp.theta.mean[2], 2.0, atol=0.5)
    assert_allclose(gp.theta.mean[3], -1.5, atol=0.5)


def test_categorical_jittable_design_matrix():
    """design_matrix_fn matches the host path on bound levels and is
    jittable (the SMC/history-matching sweep path)."""
    import jax
    import numpy as np

    from mogp_tpu.models.meanfun import design_matrix, design_matrix_fn

    x = np.array([[0.1, 0.0], [0.2, 1.0], [0.3, 2.0], [0.4, 1.0]])
    state = {}
    dm = design_matrix("x[0] + C(x[1])", x, state=state)
    fn = design_matrix_fn("x[0] + C(x[1])", state=state)
    assert_allclose(np.asarray(jax.jit(fn)(x)), dm)


def test_categorical_levels_match_exactly():
    """Adjacent large-magnitude levels stay distinct: matching is exact
    (tolerance matching would merge e.g. ID-like codes 100000/100001
    into overlapping indicators)."""
    import numpy as np

    from mogp_tpu.models.meanfun import design_matrix

    x = np.array([[0.1, 100000.0], [0.2, 100001.0], [0.3, 100000.0]])
    st = {}
    dm = design_matrix("C(x[1])", x, state=st)
    assert dm.shape == (3, 2)  # intercept + 1 treatment-coded indicator
    assert_allclose(dm[:, 1], [0.0, 1.0, 0.0])


def test_n_mean_params_with_bound_levels():
    """n_mean_params computes categorical widths structurally from the
    bound state (the documented call pattern must not trip the
    unseen-level guard)."""
    import numpy as np
    import pytest

    from mogp_tpu.models.meanfun import n_mean_params

    st = {"C(x[1])": np.array([1.0, 2.0, 3.0])}
    # intercept + x0 + (3-1) treatment columns
    assert n_mean_params("x[0] + C(x[1])", 2, state=st) == 4
    # no intercept -> full dummy
    assert n_mean_params("C(x[1]) - 1", 2, state=st) == 3
    # interaction keeps full coding: intercept + 1*3
    assert n_mean_params("x[0]:C(x[1])", 2, state=st) == 4
    # explicit levels need no state
    assert n_mean_params("C(x[1], levels=[0, 1])", 2) == 2
    with pytest.raises(ValueError, match="needs bound levels"):
        n_mean_params("C(x[1])", 2)


def test_categorical_embedded_in_arithmetic_rejected():
    """C(...) must be a whole ':'-factor; embedding raises clearly."""
    import numpy as np
    import pytest

    from mogp_tpu.models.meanfun import design_matrix

    with pytest.raises(ValueError, match="whole ':'-factor"):
        design_matrix("I(C(x[0]) + 1)", np.random.rand(5, 2))


def test_categorical_mogp_and_checkpoint_roundtrip():
    """Categorical means through the MOGP batched path and the
    checkpoint reinit path (levels rebind identically from the saved
    training inputs)."""
    import os
    import tempfile

    import numpy as np

    from mogp_tpu import MultiOutputGP, fit_GP_MAP
    from mogp_tpu.utils.checkpoint import load_gp, save_gp

    rng = np.random.RandomState(2)
    xc = rng.choice([0.0, 1.0], size=40)
    X2 = np.stack([rng.uniform(size=40), xc], axis=1)
    Y2 = np.stack([2.0 * xc + np.sin(4 * X2[:, 0]),
                   -1.0 * xc + np.cos(3 * X2[:, 0])])
    np.random.seed(9)
    mgp = fit_GP_MAP(
        MultiOutputGP(X2, Y2, mean="x[0] + C(x[1])", nugget="adaptive"),
        n_tries=2, maxiter=50,
    )
    assert len(mgp._groups()) == 1  # shared formula batches together
    xt = np.stack([rng.uniform(size=10), rng.choice([0.0, 1.0], size=10)],
                  axis=1)
    mu = np.asarray(mgp.predict(xt).mean)
    for i in range(2):
        mu_i, _, _ = mgp.emulators[i].predict(xt)
        assert_allclose(mu[i], mu_i, rtol=1e-8, atol=1e-9)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "gp.npz")
        save_gp(mgp.emulators[0], path)
        gp2 = load_gp(path)
        assert gp2._mean_state.keys() == mgp.emulators[0]._mean_state.keys()
        mu2, _, _ = gp2.predict(xt)
        assert_allclose(mu2, mu[0], rtol=1e-6, atol=1e-7)


def test_categorical_traced_f32_computed_expression():
    """A computed-expression categorical evaluated in a traced f32 sweep
    matches the f64 host binding: the traced path matches levels within
    a few ulps of the TRACE dtype (exact == would zero indicators on
    1-ulp f32 rounding differences)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mogp_tpu.models.meanfun import design_matrix, design_matrix_fn

    rng = np.random.RandomState(0)
    raw = rng.choice([2.0, 3.0, 5.0], size=64)
    x = np.stack([rng.uniform(size=64), raw], axis=1)
    st = {}
    dm64 = design_matrix("C(I(np.log(x[1])))", x, state=st)
    fn = design_matrix_fn("C(I(np.log(x[1])))", state=st)
    out32 = np.asarray(jax.jit(fn)(jnp.asarray(x, dtype=jnp.float32)))
    assert_allclose(out32, dm64)
