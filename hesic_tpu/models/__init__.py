from .base import CompressionModel
from .codec import (FactorizedPriorCodec, JointAutoregressiveCodec,
                    MeanScaleHyperpriorCodec, ScaleHyperpriorCodec)
from .hesic import (HESIC, Enhancement, EnhancementBlock, HESICTogether,
                    IndependentEnhancement)
from .hesic_codec import HESICCodec
from .priors import (FactorizedPrior, JointAutoregressiveHierarchicalPriors,
                     MeanScaleHyperprior, ScaleHyperprior)
from .waseda import Cheng2020Anchor, Cheng2020Attention

__all__ = [
    "CompressionModel",
    "FactorizedPriorCodec",
    "JointAutoregressiveCodec",
    "MeanScaleHyperpriorCodec",
    "ScaleHyperpriorCodec",
    "FactorizedPrior",
    "JointAutoregressiveHierarchicalPriors",
    "MeanScaleHyperprior",
    "ScaleHyperprior",
    "Cheng2020Anchor",
    "Cheng2020Attention",
    "HESIC",
    "HESICCodec",
    "HESICTogether",
    "Enhancement",
    "EnhancementBlock",
    "IndependentEnhancement",
]
