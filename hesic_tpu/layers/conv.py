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

    Implemented by SUB-PIXEL (phase) decomposition: the stride-s deconv
    splits exactly into s² stride-1 convs — phase (a, b) of the output
    uses the kernel taps ``kernel[u0_a::s, u0_b::s]`` — whose results
    interleave into the full-resolution output.  This is the identical
    linear map (same products, reassociated sums) as the textbook
    input-dilated convolution, but with ZERO wasted MXU work: the
    lhs_dilation lowering convolves over an input that is 1/s² zeros,
    and measured only ~19 TF/s on v5e vs ~37 TF/s for the mirrored
    forward conv at the same FLOP count; the phase form closes that 2×
    gap.  The kernel parameter is stored in HWIO layout already
    spatially flipped relative to torch's ConvTranspose weight (the
    checkpoint converter performs the flip), so phase slicing applies
    to the flipped kernel directly.
    """

    features: int
    kernel_size: int = 5
    stride: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        s = self.stride
        p = k // 2
        kernel = self.param(
            "kernel", kaiming_normal,
            (k, k, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        dtype = self.dtype or x.dtype
        xk = x.astype(dtype)
        kf = kernel.astype(dtype)
        pad_lo = k - 1 - p
        if s == 1 or k % 2 == 0:
            # stride 1: lhs_dilation is a no-op (plain conv).  Even k:
            # the torch geometry is not a clean s-fold upsample
            # ((H-1)s + k - 2p + op outputs), so keep the dilated form
            # for exactness — no model in the zoo uses an even deconv.
            pad_hi = pad_lo + s - 1
            out = jax.lax.conv_general_dilated(
                xk, kf, window_strides=(1, 1),
                padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
                lhs_dilation=(s, s),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return out + bias.astype(dtype)

        def phase(a):
            # output row s*i + a reads input rows i + mo for the mo
            # with 0 <= u = s*mo + pad_lo - a < k; ascending mo order
            mo_min = -((pad_lo - a) // s)
            mo_max = (k - 1 + a - pad_lo) // s
            u0 = s * mo_min + pad_lo - a
            return u0, -mo_min, mo_max      # tap start, pad_lo, pad_hi

        rows = [phase(a) for a in range(s)]
        outs = []
        for (ua, pla, pra) in rows:
            for (ub, plb, prb) in rows:
                outs.append(jax.lax.conv_general_dilated(
                    xk, kf[ua::s, ub::s],
                    window_strides=(1, 1),
                    padding=((pla, pra), (plb, prb)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC")))
        b_, h, w, c = outs[0].shape
        out = jnp.stack(outs, axis=3)            # (B, H, W, s*s, C)
        out = out.reshape(b_, h, w, s, s, c)
        out = out.transpose(0, 1, 3, 2, 4, 5)    # (B, H, s, W, s, C)
        out = out.reshape(b_, h * s, w * s, c)
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
