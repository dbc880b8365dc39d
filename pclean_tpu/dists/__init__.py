"""PClean distribution library, TPU-native form.

Mirrors /root/reference/src/distributions/ (12 distributions + 3 conjugate
parameter families); see core.py and params.py for the mapping.
"""
from .base import ParamRef, PCleanDistribution, Ref
from .core import (
    AddNoise,
    AddTypos,
    ChooseProportionally,
    ChooseUniformly,
    ExpandOnShortVersion,
    FormatName,
    MaybeSwap,
    NumberCodePrior,
    StringPrior,
    TimePrior,
    Transformation,
    TransformedGaussian,
    Unmodeled,
)
from .params import Mean, Prob, Proportions

__all__ = [
    "PCleanDistribution", "Ref", "ParamRef",
    "ChooseProportionally", "ChooseUniformly", "StringPrior", "TimePrior",
    "AddTypos", "MaybeSwap", "AddNoise", "TransformedGaussian",
    "FormatName", "ExpandOnShortVersion", "NumberCodePrior", "Unmodeled",
    "Transformation", "Proportions", "Prob", "Mean",
]
