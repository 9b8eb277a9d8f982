from .base import CompressionModel, TogetherCodec
from .codec import (FactorizedPriorCodec, JointAutoregressiveCodec,
                    MeanScaleHyperpriorCodec, ScaleHyperpriorCodec)
from .hesic import (HESIC, Enhancement, EnhancementBlock, HESICTogether,
                    IndependentEnhancement)
from .hesic_codec import HESICCodec, HESICTogetherCodec
from .hesic_fast import HESICFastCodec
from .hesic_plus import (HESICPlus, HESICPlusCodec,
                         HESICPlusTogether, HESICPlusTogetherCodec)
from .hesic_plus_refcodec import HESICPlusRefCodec
from .dsic import (DSIC, DSICPlus, IndependentEnhancementNoWarp, CostVolume,
                   GlobalContext, dense_warp)
from .dsic_codec import DSICCodec, DSICPlusCodec
from .dsic_fast import DSICFastCodec
from .ar_device import (HESICPlusDeviceCodec,
                        JointAutoregressiveDeviceCodec)
from .priors import (FactorizedPrior, JointAutoregressiveHierarchicalPriors,
                     MeanScaleHyperprior, ScaleHyperprior)
from .waseda import Cheng2020Anchor, Cheng2020Attention

__all__ = [
    "CompressionModel",
    "TogetherCodec",
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
    "HESICFastCodec",
    "HESICTogether",
    "HESICTogetherCodec",
    "HESICPlus",
    "HESICPlusCodec",
    "HESICPlusRefCodec",
    "HESICPlusTogether",
    "HESICPlusTogetherCodec",
    "DSIC",
    "DSICCodec",
    "DSICFastCodec",
    "HESICPlusDeviceCodec",
    "JointAutoregressiveDeviceCodec",
    "DSICPlus",
    "DSICPlusCodec",
    "IndependentEnhancementNoWarp",
    "CostVolume",
    "GlobalContext",
    "dense_warp",
    "Enhancement",
    "EnhancementBlock",
    "IndependentEnhancement",
]
