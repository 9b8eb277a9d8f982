"""Conv/deconv primitives with PyTorch-compatible geometry, NHWC layout.

The reference uses ``nn.Conv2d(k, s, padding=k//2)`` and
``nn.ConvTranspose2d(k, s, padding=k//2, output_padding=s-1)``
(compressai/models/utils.py:104-118).  We reproduce the exact spatial
geometry with explicit padding so shape contracts (y at /16, z at /64) and
checkpoint conversion are weight-for-weight; layouts are NHWC / HWIO, the
native TPU layouts.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# kaiming-normal (fan_in, gain=sqrt(2)) — matches the reference init
# (models/priors.py:60-65)
kaiming_normal = jax.nn.initializers.variance_scaling(
    2.0, "fan_in", "normal")


class Conv(nn.Module):
    """2-D convolution, stride `s`, padding k//2 on every side (torch-style).

    For even inputs this halves spatial dims per stride-2 application, the
    same contract as the reference `conv()` helper.
    """

    features: int
    kernel_size: int = 5
    stride: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = k // 2
        kernel = self.param(
            "kernel", kaiming_normal,
            (k, k, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        dtype = self.dtype or x.dtype
        out = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + bias.astype(dtype)


class Deconv(nn.Module):
    """Transposed 2-D convolution matching torch's
    ``ConvTranspose2d(padding=k//2, output_padding=s-1)`` geometry:
    output spatial size is exactly ``input * stride``.

    Implemented as input-dilated convolution (lhs_dilation), which XLA maps
    onto the MXU directly.  The kernel parameter is stored in HWIO layout
    already spatially flipped relative to torch's ConvTranspose weight (the
    checkpoint converter performs the flip).
    """

    features: int
    kernel_size: int = 5
    stride: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = k // 2
        op = self.stride - 1
        kernel = self.param(
            "kernel", kaiming_normal,
            (k, k, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        dtype = self.dtype or x.dtype
        pad_lo = k - 1 - p
        pad_hi = k - 1 - p + op
        out = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=(1, 1),
            padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + bias.astype(dtype)


def conv(features, kernel_size=5, stride=2, **kw):
    return Conv(features=features, kernel_size=kernel_size, stride=stride,
                **kw)


def deconv(features, kernel_size=5, stride=2, **kw):
    return Deconv(features=features, kernel_size=kernel_size, stride=stride,
                  **kw)


def pixel_shuffle(x, r: int):
    """Depth-to-space with torch.PixelShuffle channel ordering.

    in  (B, H, W, C*r*r) where channel index = c*r*r + i*r + j
    out (B, H*r, W*r, C) with out[b, h*r+i, w*r+j, c] = in[b, h, w, c_idx].
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)


class Sequential(nn.Module):
    """Minimal sequential combinator over modules / callables."""

    layers: Sequence[Callable]

    @nn.compact
    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x
