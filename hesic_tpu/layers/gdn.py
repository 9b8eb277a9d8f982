"""Generalized Divisive Normalization, NHWC.

Reference semantics: compressai/layers/gdn.py:22-97.  The reference's
``F.conv2d(x**2, gamma.reshape(C,C,1,1), beta)`` is a 1x1 conv, i.e. a
channel-mixing matmul; in NHWC it is a single MXU matmul fused with the
rsqrt by XLA — no Python-side reshaping per step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.parametrizers import nonneg_apply, nonneg_init


class GDN(nn.Module):
    """y[i] = x[i] / sqrt(beta[i] + sum_j gamma[i, j] * x[j]^2).

    ``inverse=True`` multiplies by the sqrt instead (IGDN).
    gamma is stored with torch's (out, in) orientation so checkpoints map
    element-for-element.
    """

    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        beta = self.param(
            "beta",
            lambda key: nonneg_init(jnp.ones((c,), jnp.float32)))
        gamma = self.param(
            "gamma",
            lambda key: nonneg_init(
                self.gamma_init * jnp.eye(c, dtype=jnp.float32)))
        beta = nonneg_apply(beta, self.beta_min)
        gamma = nonneg_apply(gamma)
        dtype = self.dtype or x.dtype
        # norm[..., i] = sum_j gamma[i, j] * x[..., j]**2 + beta[i]
        norm = jnp.matmul((x * x).astype(dtype), gamma.T.astype(dtype))
        norm = norm + beta.astype(dtype)
        if self.inverse:
            return x * jnp.sqrt(norm)
        return x * jax.lax.rsqrt(norm)


class GDN1(GDN):
    """Simplified GDN: y[i] = x[i] / (beta[i] + sum_j gamma[i,j] * |x[j]|).

    Reference: compressai/layers/gdn.py:73-97.
    """

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        beta = self.param(
            "beta",
            lambda key: nonneg_init(jnp.ones((c,), jnp.float32)))
        gamma = self.param(
            "gamma",
            lambda key: nonneg_init(
                self.gamma_init * jnp.eye(c, dtype=jnp.float32)))
        beta = nonneg_apply(beta, self.beta_min)
        gamma = nonneg_apply(gamma)
        dtype = self.dtype or x.dtype
        norm = jnp.matmul(jnp.abs(x).astype(dtype), gamma.T.astype(dtype))
        norm = norm + beta.astype(dtype)
        if not self.inverse:
            norm = 1.0 / norm
        return x * norm
