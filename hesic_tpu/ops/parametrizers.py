"""Non-negative reparameterization (sqrt-space with pedestal).

Reference semantics: compressai/ops/parametrizers.py:21-44.
"""

from __future__ import annotations

import jax.numpy as jnp

from .bound_ops import lower_bound

_REPARAM_OFFSET = 2 ** -18
_PEDESTAL = _REPARAM_OFFSET ** 2


def nonneg_init(x, minimum: float = 0.0):
    """Map an initial non-negative value into sqrt-space."""
    del minimum  # reference init ignores the minimum as well
    return jnp.sqrt(jnp.maximum(x + _PEDESTAL, _PEDESTAL))


def nonneg_apply(x, minimum: float = 0.0):
    """Map a sqrt-space parameter back to a >= minimum value."""
    bound = (minimum + _PEDESTAL) ** 0.5
    out = lower_bound(x, bound)
    return out * out - _PEDESTAL
