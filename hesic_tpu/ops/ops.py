"""Quantization ops.

Reference semantics: compressai/ops/ops.py:18-31 (ste_round) and
compressai/entropy_models/entropy_models.py:98-134 (quantize/dequantize).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ste_round(x):
    """Round with straight-through (identity) gradients."""
    return jnp.round(x) - jax.lax.stop_gradient(x) + x


def quantize_noise(x, rng):
    """Additive U(-0.5, 0.5) noise — training-time quantization surrogate."""
    return x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)


def quantize_dequantize(x, means=None):
    """Hard rounding (optionally about `means`), output stays continuous."""
    if means is not None:
        return jnp.round(x - means) + means
    return jnp.round(x)


def quantize_symbols(x, means=None):
    """Hard rounding to int32 symbols (optionally about `means`)."""
    if means is not None:
        x = x - means
    return jnp.round(x).astype(jnp.int32)


def quantize(x, mode, *, means=None, rng=None):
    """Dispatch across the reference's three quantization modes."""
    if mode == "noise":
        if rng is None:
            raise ValueError("noise mode requires an rng key")
        return quantize_noise(x, rng)
    if mode == "dequantize":
        return quantize_dequantize(x, means)
    if mode == "symbols":
        return quantize_symbols(x, means)
    raise ValueError(f'Invalid quantization mode: "{mode}"')
