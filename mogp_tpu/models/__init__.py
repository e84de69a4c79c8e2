"""Model layer: GP core, parameters, priors, mean functions, fitting."""

from .gp import (
    FitArtifacts,
    GPData,
    GaussianProcess,
    GaussianProcessBase,
    PredictResult,
    gp_fit,
    gp_nlp,
    gp_predict,
    make_gp_data,
)
from .meanfun import design_matrix, parse_formula
from .params import GPParams
from .priors import (
    GPPriors,
    GammaPrior,
    InvGammaPrior,
    LogNormalPrior,
    MeanPriors,
    NormalPrior,
    PriorDist,
    WeakPrior,
    max_spacing,
    min_spacing,
)

__all__ = [
    "FitArtifacts",
    "GPData",
    "GaussianProcess",
    "GaussianProcessBase",
    "PredictResult",
    "gp_fit",
    "gp_nlp",
    "gp_predict",
    "make_gp_data",
    "design_matrix",
    "parse_formula",
    "GPParams",
    "GPPriors",
    "GammaPrior",
    "InvGammaPrior",
    "LogNormalPrior",
    "MeanPriors",
    "NormalPrior",
    "PriorDist",
    "WeakPrior",
    "max_spacing",
    "min_spacing",
]
