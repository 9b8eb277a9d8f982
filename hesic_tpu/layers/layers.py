"""NN building blocks, NHWC.

Reference semantics: compressai/layers/layers.py:21-200.  The masked conv
folds the causality mask into the kernel at apply time (a pure functional
transform) instead of mutating weights in place as the reference does
(layers.py:44) — in-place mutation is both un-jittable and a latent training
bug in torch.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import Conv, kaiming_normal, pixel_shuffle
from .gdn import GDN


def raster_causal_mask(kh: int, kw: int, mask_type: str = "A"):
    """PixelCNN raster mask, (kh, kw) with 1s at allowed taps.

    Type 'A' masks the center pixel too; 'B' allows it.
    """
    if mask_type not in ("A", "B"):
        raise ValueError(f'Invalid "mask_type" value "{mask_type}"')
    mask = jnp.ones((kh, kw), dtype=jnp.float32)
    mask = mask.at[kh // 2, kw // 2 + (mask_type == "B"):].set(0)
    mask = mask.at[kh // 2 + 1:].set(0)
    return mask


class MaskedConv2d(nn.Module):
    """Raster-causal 2-D conv (PixelCNN mask A/B), stride 1."""

    features: int
    kernel_size: int = 5
    mask_type: str = "A"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = k // 2
        kernel = self.param(
            "kernel", kaiming_normal, (k, k, x.shape[-1], self.features),
            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        mask = raster_causal_mask(k, k, self.mask_type)[:, :, None, None]
        dtype = self.dtype or x.dtype
        out = jax.lax.conv_general_dilated(
            x.astype(dtype), (kernel * mask).astype(dtype),
            window_strides=(1, 1), padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + bias.astype(dtype)


def conv3x3(features, stride=1, **kw):
    return Conv(features=features, kernel_size=3, stride=stride, **kw)


def conv1x1(features, stride=1, **kw):
    return Conv(features=features, kernel_size=1, stride=stride, **kw)


class SubpelConv3x3(nn.Module):
    """3x3 conv to C*r^2 channels followed by depth-to-space upsampling."""

    features: int
    r: int = 1

    @nn.compact
    def __call__(self, x):
        x = Conv(features=self.features * self.r ** 2, kernel_size=3,
                 stride=1)(x)
        return pixel_shuffle(x, self.r)


class ResidualBlockWithStride(nn.Module):
    """conv3x3/s -> lrelu -> conv3x3 -> GDN (+ 1x1 strided shortcut)."""

    features: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        out = conv3x3(self.features, stride=self.stride)(x)
        out = nn.leaky_relu(out)
        out = conv3x3(self.features)(out)
        out = GDN()(out)
        if self.stride != 1:
            identity = conv1x1(self.features, stride=self.stride)(x)
        else:
            identity = x
        return out + identity


class ResidualBlockUpsample(nn.Module):
    """subpel conv -> lrelu -> conv3x3 -> IGDN (+ subpel shortcut)."""

    features: int
    upsample: int = 2

    @nn.compact
    def __call__(self, x):
        out = SubpelConv3x3(features=self.features, r=self.upsample)(x)
        out = nn.leaky_relu(out)
        out = conv3x3(self.features)(out)
        out = GDN(inverse=True)(out)
        identity = SubpelConv3x3(features=self.features, r=self.upsample)(x)
        return out + identity


class ResidualBlock(nn.Module):
    """Two 3x3 convs with leaky ReLUs and an identity shortcut."""

    features: int

    @nn.compact
    def __call__(self, x):
        out = conv3x3(self.features)(x)
        out = nn.leaky_relu(out)
        out = conv3x3(self.features)(out)
        out = nn.leaky_relu(out)
        return out + x


class _ResidualUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        n = self.features
        out = conv1x1(n // 2)(x)
        out = nn.relu(out)
        out = conv3x3(n // 2)(out)
        out = nn.relu(out)
        out = conv1x1(n)(out)
        return nn.relu(out + x)


class AttentionBlock(nn.Module):
    """Cheng2020 simplified attention: a * sigmoid(b) gate, local convs."""

    features: int

    @nn.compact
    def __call__(self, x):
        n = self.features
        a = x
        for _ in range(3):
            a = _ResidualUnit(features=n)(a)
        b = x
        for _ in range(3):
            b = _ResidualUnit(features=n)(b)
        b = conv1x1(n)(b)
        return x + a * jax.nn.sigmoid(b)
