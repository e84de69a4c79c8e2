"""Core math ops: kernels, factorizations, transforms, optimizers."""

from .cholesky import (
    ChoFactor,
    PivotedChoFactor,
    cholesky_factor,
    fixed_cholesky,
    jit_cholesky,
    pivoted_cholesky,
)
from .kernels import (
    KernelBase,
    Matern52,
    ProductMat52,
    SquaredExponential,
    UniformMat52,
    UniformSqExp,
    get_kernel,
)
from .linalg import calc_Ainv, calc_mean_params, calc_R
from .transforms import CorrTransform, CovTransform

__all__ = [
    "ChoFactor",
    "PivotedChoFactor",
    "cholesky_factor",
    "fixed_cholesky",
    "jit_cholesky",
    "pivoted_cholesky",
    "KernelBase",
    "Matern52",
    "ProductMat52",
    "SquaredExponential",
    "UniformMat52",
    "UniformSqExp",
    "get_kernel",
    "calc_Ainv",
    "calc_mean_params",
    "calc_R",
    "CorrTransform",
    "CovTransform",
]
