from .base import CompressionModel
from .google import (
    FactorizedPrior,
    MeanScaleHyperprior,
    ScaleHyperprior,
    get_scale_table,
)
from .joint_ar import JointAutoregressiveHierarchicalPriors
from .waseda import Cheng2020Anchor, Cheng2020Attention

__all__ = [
    "CompressionModel",
    "FactorizedPrior",
    "ScaleHyperprior",
    "MeanScaleHyperprior",
    "JointAutoregressiveHierarchicalPriors",
    "Cheng2020Anchor",
    "Cheng2020Attention",
    "get_scale_table",
]
