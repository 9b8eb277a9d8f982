from .conv import (Conv, Deconv, Sequential, conv, deconv, kaiming_normal,
                   pixel_shuffle)
from .gdn import GDN, GDN1
from .layers import (AttentionBlock, MaskedConv2d, ResidualBlock,
                     ResidualBlockUpsample, ResidualBlockWithStride,
                     SubpelConv3x3, conv1x1, conv3x3, raster_causal_mask)

__all__ = [
    "Conv",
    "Deconv",
    "Sequential",
    "conv",
    "deconv",
    "kaiming_normal",
    "pixel_shuffle",
    "GDN",
    "GDN1",
    "AttentionBlock",
    "MaskedConv2d",
    "ResidualBlock",
    "ResidualBlockUpsample",
    "ResidualBlockWithStride",
    "SubpelConv3x3",
    "conv1x1",
    "conv3x3",
    "raster_causal_mask",
]
