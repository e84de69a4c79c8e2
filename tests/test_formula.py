"""Formula-parser oracle tests.

Deep coverage of the string-formula surface (reference
``mogp_emulator/formula.py`` / ``tests/test_formula.py`` behaviors),
exercised against this framework's independent lexer +
recursive-descent implementation: value oracles on a fixed 2x3 input
grid, AST result types, parameter counts, operator precedence and
associativity, inputdict resolution, and the full error surface.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from mogp_tpu.models.formula import mean_from_patsy_formula, mean_from_string
from mogp_tpu.models.meanfunction import (
    Coefficient,
    ConstantMean,
    LinearMean,
    MeanComposite,
    MeanPower,
    MeanProduct,
    MeanSum,
)

X = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])


@pytest.mark.parametrize(
    "formula,inputdict,params,resulttype,expected",
    [
        # leaves
        ("x[0]", {}, [], LinearMean, [1.0, 4.0]),
        ("inputs[1]", {}, [], LinearMean, [2.0, 5.0]),
        ("3.5", {}, [], ConstantMean, [3.5, 3.5]),
        ("2e2", {}, [], ConstantMean, [200.0, 200.0]),
        (".5", {}, [], ConstantMean, [0.5, 0.5]),
        ("a", {}, [7.0], Coefficient, [7.0, 7.0]),
        ("a", {"a": 2}, [], LinearMean, [3.0, 6.0]),
        # response prefixes
        ("y = x[0]", {}, [], LinearMean, [1.0, 4.0]),
        ("y ~ x[0]", {}, [], LinearMean, [1.0, 4.0]),
        ("~ x[0]", {}, [], LinearMean, [1.0, 4.0]),
        ("= x[0]", {}, [], LinearMean, [1.0, 4.0]),
        ("y~x[0]+x[1]", {}, [], MeanSum, [3.0, 9.0]),
        # operators
        ("a + b*x[0]", {}, [1.0, 2.0], MeanSum, [3.0, 9.0]),
        ("a*x[1]", {}, [2.0], MeanProduct, [4.0, 10.0]),
        ("x[0]^2", {}, [], MeanPower, [1.0, 16.0]),
        ("x[0]**2", {}, [], MeanPower, [1.0, 16.0]),
        ("inputs[0]**2", {}, [], MeanPower, [1.0, 16.0]),
        ("I(inputs[0]^2)", {}, [], MeanPower, [1.0, 16.0]),
        ("I ( x[1] )", {}, [], LinearMean, [2.0, 5.0]),
        # grouping
        ("(x[0] + x[1])*x[2]", {}, [], MeanProduct, [9.0, 54.0]),
        ("x[0] + x[1]*x[2]", {}, [], MeanSum, [7.0, 34.0]),
        ("((x[0]))", {}, [], LinearMean, [1.0, 4.0]),
        # composition: f(g) evaluates f on g's column outputs
        ("(a + b*x[0])(x[0]*x[1])", {}, [1.0, 2.0], MeanComposite, [5.0, 41.0]),
        # inputdict naming
        ("c*a*b", {"a": 0, "b": 1}, [3.0], MeanProduct, [6.0, 60.0]),
        ("width + height", {"width": 0, "height": 2}, [], MeanSum, [4.0, 10.0]),
    ],
)
def test_string_formula_values(formula, inputdict, params, resulttype, expected):
    mf = mean_from_string(formula, inputdict)
    assert isinstance(mf, resulttype)
    assert mf.get_n_params(X) == len(params)
    assert_allclose(np.asarray(mf.mean_f(X, np.array(params, dtype=float))),
                    expected)


def test_power_right_associative():
    # a^b^c must parse as a^(b^c): (x0)^(2^2) = x0^4
    mf = mean_from_string("x[0]^2^2")
    assert_allclose(np.asarray(mf.mean_f(X, np.zeros(0))), [1.0, 256.0])


def test_precedence_pow_over_mul_over_add():
    # 2*x0^2 + 1 => 2*(x0^2) + 1
    mf = mean_from_string("2*x[0]^2 + 1")
    assert_allclose(np.asarray(mf.mean_f(X, np.zeros(0))), [3.0, 33.0])


def test_whitespace_insensitive():
    a = mean_from_string("a+b*x[0]")
    b = mean_from_string("  a +  b * x[ 0 ]  ")
    p = np.array([1.5, -2.0])
    assert_allclose(np.asarray(a.mean_f(X, p)), np.asarray(b.mean_f(X, p)))


def test_param_count_and_order():
    # coefficient params are consumed left-to-right
    mf = mean_from_string("a + b*x[0] + c*x[1]^2")
    assert mf.get_n_params(X) == 3
    params = np.array([10.0, 2.0, 0.5])
    assert_allclose(np.asarray(mf.mean_f(X, params)),
                    10.0 + 2.0 * X[:, 0] + 0.5 * X[:, 1] ** 2)


def test_patsy_alias_equivalent():
    p = np.array([1.0, 2.0])
    a = mean_from_patsy_formula("a + b*x[0]")
    b = mean_from_string("a + b*x[0]")
    assert_allclose(np.asarray(a.mean_f(X, p)), np.asarray(b.mean_f(X, p)))


def test_inputs_alias_of_x():
    a = mean_from_string("inputs[2]")
    b = mean_from_string("x[2]")
    assert_allclose(np.asarray(a.mean_f(X, np.zeros(0))),
                    np.asarray(b.mean_f(X, np.zeros(0))))


@pytest.mark.parametrize(
    "bad",
    [
        "a + (b",          # unclosed paren
        "a + b)",          # stray close paren
        "a + + b",         # doubled operator
        "* x[0]",          # leading operator
        "x[0] +",          # trailing operator
        "",                # empty
        "   ",             # whitespace only
        "a = b = c",       # stray assignment
        "call",            # protected keyword
        "call(x[0])",      # protected keyword in call position
        "x[0] ]",          # stray bracket
        "[0]",             # bracket without a name
        "a & b",           # unknown character
        "I",               # identity outside call position
        "I + a",           # identity in operand position
        "a*I",             # identity in operand position
        "(I)",             # identity cannot be grouped
        "I(I)",            # identity as call argument
    ],
)
def test_string_formula_syntax_errors(bad):
    with pytest.raises(SyntaxError):
        mean_from_string(bad)


@pytest.mark.parametrize(
    "bad",
    [
        "x",          # x without an index
        "x[a]",       # non-integer index
        "x[1.5]",     # non-integer index
        "x[-1]",      # negative index
        "q[0]",       # index on a free coefficient name
    ],
)
def test_string_formula_value_errors(bad):
    with pytest.raises(ValueError):
        mean_from_string(bad)


def test_indexing_mapped_name_rejected():
    with pytest.raises(SyntaxError):
        mean_from_string("a[0]", {"a": 1})


def test_non_string_rejected():
    for fn in (mean_from_string, mean_from_patsy_formula):
        with pytest.raises(TypeError):
            fn(1)
        with pytest.raises(TypeError):
            fn(None)


def test_deep_nesting():
    mf = mean_from_string("((a + (b*(x[0] + (x[1])))))")
    assert mf.get_n_params(X) == 2
    assert_allclose(np.asarray(mf.mean_f(X, np.array([1.0, 2.0]))),
                    1.0 + 2.0 * (X[:, 0] + X[:, 1]))


def test_composition_chain():
    # h(g)(x...) style: ((x0)(x1)) -- composing a linear mean onto a
    # single-column output evaluates the outer on the inner's output
    mf = mean_from_string("(x[0]^2)(x[1])")
    assert isinstance(mf, MeanComposite)
    # the outer x[0] reads column 0 of the inner's single-column output
    assert_allclose(np.asarray(mf.mean_f(X, np.zeros(0))), X[:, 1] ** 2)


def test_formula_deriv_matches_fd():
    mf = mean_from_string("a + b*x[0] + c*x[0]*x[1]")
    params = np.array([0.5, 1.5, -2.0])
    base = np.asarray(mf.mean_f(X, params))
    eps = 1e-6
    deriv = np.asarray(mf.mean_deriv(X, params))
    for i in range(3):
        pp = params.copy()
        pp[i] += eps
        fd = (np.asarray(mf.mean_f(X, pp)) - base) / eps
        assert_allclose(deriv[i], fd, rtol=1e-4, atol=1e-4)
