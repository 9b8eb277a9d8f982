"""Cheng2020 anchor / attention models.

Reference: compressai/models/waseda.py:24-123 — residual-block transforms,
3x3 hyper transforms, sub-pixel upsampling, on top of the
JointAutoregressiveHierarchicalPriors machinery.
"""

from __future__ import annotations

from flax import linen as nn

from ..entropy_models import EntropyBottleneck, GaussianConditional
from ..layers import (AttentionBlock, Conv, MaskedConv2d, ResidualBlock,
                      ResidualBlockUpsample, ResidualBlockWithStride,
                      SubpelConv3x3)
from .priors import JointAutoregressiveHierarchicalPriors


def _conv3x3(features, stride=1):
    return Conv(features, kernel_size=3, stride=stride)


class Cheng2020Anchor(JointAutoregressiveHierarchicalPriors):
    """cheng2020-anchor (reference waseda.py:24-83)."""

    N: int = 192
    M: int = 192

    def setup(self):
        n = self.N
        self.g_a = [
            ResidualBlockWithStride(features=n, stride=2),
            ResidualBlock(features=n),
            ResidualBlockWithStride(features=n, stride=2),
            ResidualBlock(features=n),
            ResidualBlockWithStride(features=n, stride=2),
            ResidualBlock(features=n),
            _conv3x3(n, stride=2),
        ]
        self.h_a = [
            _conv3x3(n), nn.leaky_relu,
            _conv3x3(n), nn.leaky_relu,
            _conv3x3(n, stride=2), nn.leaky_relu,
            _conv3x3(n), nn.leaky_relu,
            _conv3x3(n, stride=2),
        ]
        self.h_s = [
            _conv3x3(n), nn.leaky_relu,
            SubpelConv3x3(features=n, r=2), nn.leaky_relu,
            _conv3x3(n * 3 // 2), nn.leaky_relu,
            SubpelConv3x3(features=n * 3 // 2, r=2), nn.leaky_relu,
            _conv3x3(n * 2),
        ]
        self.g_s = [
            ResidualBlock(features=n),
            ResidualBlockUpsample(features=n, upsample=2),
            ResidualBlock(features=n),
            ResidualBlockUpsample(features=n, upsample=2),
            ResidualBlock(features=n),
            ResidualBlockUpsample(features=n, upsample=2),
            ResidualBlock(features=n),
            SubpelConv3x3(features=3, r=2),
        ]
        self.entropy_parameters = [
            Conv(n * 10 // 3, kernel_size=1, stride=1), nn.leaky_relu,
            Conv(n * 8 // 3, kernel_size=1, stride=1), nn.leaky_relu,
            Conv(n * 6 // 3, kernel_size=1, stride=1)]
        self.context_prediction = MaskedConv2d(features=2 * n, kernel_size=5,
                                               mask_type="A")
        self.entropy_bottleneck = EntropyBottleneck(channels=n)
        self.gaussian_conditional = GaussianConditional()


class Cheng2020Attention(Cheng2020Anchor):
    """cheng2020-attn (reference waseda.py:86-123)."""

    def setup(self):
        n = self.N
        self.h_a = [
            _conv3x3(n), nn.leaky_relu,
            _conv3x3(n), nn.leaky_relu,
            _conv3x3(n, stride=2), nn.leaky_relu,
            _conv3x3(n), nn.leaky_relu,
            _conv3x3(n, stride=2),
        ]
        self.h_s = [
            _conv3x3(n), nn.leaky_relu,
            SubpelConv3x3(features=n, r=2), nn.leaky_relu,
            _conv3x3(n * 3 // 2), nn.leaky_relu,
            SubpelConv3x3(features=n * 3 // 2, r=2), nn.leaky_relu,
            _conv3x3(n * 2),
        ]
        self.entropy_parameters = [
            Conv(n * 10 // 3, kernel_size=1, stride=1), nn.leaky_relu,
            Conv(n * 8 // 3, kernel_size=1, stride=1), nn.leaky_relu,
            Conv(n * 6 // 3, kernel_size=1, stride=1)]
        self.context_prediction = MaskedConv2d(features=2 * n, kernel_size=5,
                                               mask_type="A")
        self.entropy_bottleneck = EntropyBottleneck(channels=n)
        self.gaussian_conditional = GaussianConditional()
        self.g_a = [
            ResidualBlockWithStride(features=n, stride=2),
            ResidualBlock(features=n),
            ResidualBlockWithStride(features=n, stride=2),
            AttentionBlock(features=n),
            ResidualBlock(features=n),
            ResidualBlockWithStride(features=n, stride=2),
            ResidualBlock(features=n),
            _conv3x3(n, stride=2),
            AttentionBlock(features=n),
        ]
        self.g_s = [
            AttentionBlock(features=n),
            ResidualBlock(features=n),
            ResidualBlockUpsample(features=n, upsample=2),
            ResidualBlock(features=n),
            ResidualBlockUpsample(features=n, upsample=2),
            AttentionBlock(features=n),
            ResidualBlock(features=n),
            ResidualBlockUpsample(features=n, upsample=2),
            ResidualBlock(features=n),
            SubpelConv3x3(features=3, r=2),
        ]
