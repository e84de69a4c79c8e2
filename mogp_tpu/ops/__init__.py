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
from .linalg import MarginalCore, marginal_core, marginal_nlp
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
    "MarginalCore",
    "marginal_core",
    "marginal_nlp",
    "CorrTransform",
    "CovTransform",
]
